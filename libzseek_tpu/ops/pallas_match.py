"""Pallas SMEM-resident scalar hash-probe LZ parser — the TPU parse path.

The sort-based parse (ops/match.py) is exact but sort+gather bound: XLA
gathers run ~100M elem/s on TPU, capping the pipeline far below the
reference's CPU throughput.  This kernel instead runs zstd-fast's actual
algorithm — single-probe hash table, greedy emit, inline extension — as a
sequential SCALAR loop per block on the TPU core.

Design constraints (measured; see PERF.md and the project memory):
Mosaic rejects dynamic per-element VMEM access and has no scalar i8 ops,
but SMEM supports dynamic scalar load/store — exactly 1 MiB of it, at
~12 ns per probe-loop iteration — and pallas double-buffers streamed
blocks.  Hence: input as packed int32 byte words (128 KiB x2 streamed;
bytes extracted by shifting), hash table + emission buffers in SMEM, one
grid step per block row, grid steps sequencing on the core.

Outputs are per-block sequence arrays (ll, ml, offv = offset+3, n_seq,
cover_end); literal extraction and entropy coding stay in the XLA
pipeline (ops/zstd_encode.zstd_sequences_fast).

Reference counterpart: ZSTD_compressBlock_fast (the strategy the reference
selects at level 3, /root/reference/src/compress.c:87-90).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PRIME = np.uint32(2654435761)

def _parse_kernel_smem(w_ref, len_ref, ll_ref, ml_ref, off_ref, n_ref,
                       table_ref, *, cap: int, max_offset: int,
                       hash_log: int, start_ip: int, end_margin: int):
    # w_ref: packed little-endian int32 words of the block bytes (Mosaic
    # has no scalar i8 ops, so bytes are extracted by shifting)
    NW = w_ref.shape[2]
    tab_size = 1 << hash_log
    shift = np.uint32(32 - hash_log)

    def zb(i, _):
        table_ref[i] = -1
        return 0

    jax.lax.fori_loop(0, tab_size, zb, 0)
    blen = len_ref[0, 0, 0]
    min_ref = len_ref[0, 0, 1]   # first byte references may reach back to
    limit = blen - 12

    def byte(i):
        return (w_ref[0, 0, i >> 2] >> ((i & 3) * 8)) & 0xFF

    def w32(i):
        # unaligned LE32 load; callers stay in-bounds for the low word,
        # only the high word can touch one past the end
        q = i >> 2
        sh = ((i & 3) * 8).astype(jnp.uint32)
        lo = w_ref[0, 0, q].astype(jnp.uint32)
        hi = w_ref[0, 0, jnp.minimum(q + 1, NW - 1)].astype(jnp.uint32)
        v = (lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
        return v.astype(jnp.int32)

    def extend(ip, cand):
        # word-at-a-time: 4 bytes per compare, then up to 3 tail bytes
        lim = blen - end_margin

        def wcond(l):
            return (ip + l + 4 <= lim) & (w32(ip + l) == w32(cand + l))

        l = jax.lax.while_loop(wcond, lambda l: l + 4, jnp.int32(4))
        for _ in range(3):
            ok = (ip + l < lim) & (byte(ip + l) == byte(cand + l))
            l = l + ok
        return l

    def body(state):
        ip, anchor, cnt, miss = state
        w = w32(ip)
        h = ((w.astype(jnp.uint32) * PRIME) >> shift).astype(jnp.int32)
        cand = table_ref[h]
        table_ref[h] = ip
        good = (cand >= min_ref) & (ip - cand <= max_offset) & (cnt < cap)
        good = good & (w32(jnp.maximum(cand, 0)) == w)

        def do_match(_):
            l = extend(ip, cand)
            ll_ref[0, 0, cnt] = ip - anchor
            ml_ref[0, 0, cnt] = l
            off_ref[0, 0, cnt] = ip - cand + 3
            return ip + l, ip + l, cnt + 1, jnp.int32(0)

        def do_miss(_):
            return ip + 1 + (miss >> 6), anchor, cnt, miss + 1

        return jax.lax.cond(good, do_match, do_miss, None)

    if start_ip > 0:
        # seed the table with the context window so first-block-byte
        # probes can match backward into it (linked-block mode)
        def seed(p, _):
            w = w32(p)
            h = ((w.astype(jnp.uint32) * PRIME) >> shift).astype(jnp.int32)
            table_ref[h] = p
            return 0

        jax.lax.fori_loop(min_ref, jnp.int32(start_ip - 3), seed, 0)
    ip0 = jnp.int32(start_ip)
    ip, anchor, cnt, miss = jax.lax.while_loop(
        lambda s: s[0] < limit, body, (ip0, ip0, jnp.int32(0), jnp.int32(0)))
    n_ref[0, 0, 0] = cnt
    n_ref[0, 0, 1] = anchor


@partial(jax.jit, static_argnames=("cap", "max_offset", "hash_log",
                                   "start_ip", "end_margin", "interpret"))
def hash_parse_blocks_smem(x: jnp.ndarray, lengths: jnp.ndarray,
                           cap: int | None = None,
                           max_offset: int = (1 << 17) - 1,
                           hash_log: int = 16,
                           start_ip: int = 0, end_margin: int = 0,
                           min_ref: jnp.ndarray | None = None,
                           interpret: bool = False):
    """SMEM-resident hash-probe parse.  x: (B, N) uint8 raw block bytes
    (N a multiple of 4); lengths (B,).  Returns (ll, ml, offv, n_seq,
    cover_end).

    Linked-block mode (LZ4): start_ip > 0 makes [0, start_ip) a context
    prefix (matches start at/after start_ip but may reference back to
    min_ref (B,)); end_margin keeps the last bytes literal (LZ4's 5-byte
    rule)."""
    B, N = x.shape
    words = jax.lax.bitcast_convert_type(
        x.reshape(B, N // 4, 4), jnp.int32)
    if cap is None:
        cap = max(128, (N - start_ip) // 8)
    if min_ref is None:
        min_ref = jnp.zeros((B,), jnp.int32)
    kernel = partial(_parse_kernel_smem, cap=cap, max_offset=max_offset,
                     hash_log=hash_log, start_ip=start_ip,
                     end_margin=end_margin)

    def smem(shape):
        return pl.BlockSpec(memory_space=pltpu.SMEM,
                            block_shape=(1,) + shape[1:],
                            index_map=lambda b: (b,) + (0,) *
                            (len(shape) - 1))

    ll, ml, off, nn = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[smem((B, 1, N // 4)), smem((B, 1, 2))],
        out_specs=[smem((B, 1, cap)), smem((B, 1, cap)), smem((B, 1, cap)),
                   smem((B, 1, 2))],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 2), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1 << hash_log,), jnp.int32)],
        interpret=interpret,
    )(words.reshape(B, 1, N // 4),
      jnp.stack([lengths.astype(jnp.int32),
                 min_ref.astype(jnp.int32)],
                axis=1).reshape(B, 1, 2))
    return (ll[:, 0], ml[:, 0], off[:, 0], nn[:, 0, 0], nn[:, 0, 1])


# ---------------------------------------------------------------------------
# Linked-block zstd parse: persistent hash table + in-kernel gate
#
# hash_parse_blocks_smem treats every 128 KiB block in isolation: the hash
# table is re-zeroed each grid step (~0.8 ms of the ~1.6 ms budget) and
# matches cannot reach the previous block, and its raw matches still need an
# XLA gate/recompaction midstage.  This kernel mirrors the fused LZ4 kernel:
# the table persists across grid steps with absolute batch positions, each
# grid step maps its own row and the preceding row of the same array (the
# previous block of the frame, linked-block context), and the entropy
# profitability gate (same cost model as zstd_encode._fast_post) runs on
# each candidate in-kernel so the emitted sequences are final.
#
# Reference counterpart: ZSTD_compressBlock_fast in its multi-block
# windowed form (the reference's zstd frames are windowed streams,
# /root/reference/src/compress.c:653-702).
# ---------------------------------------------------------------------------


def _parse_linked_kernel(win_ref, meta_ref, ll_ref, ml_ref,
                         off_ref, n_ref, mask_ref, table_ref, *extra,
                         cap: int,
                         max_offset: int, hash_log: int, block_bytes: int,
                         gate_bits: int, min_match: int,
                         gated_policy: str = "halve",
                         strict_h16_x6: int = 480,
                         strict_hash_bytes: int = 8,
                         rep_probe: bool = False,
                         variant: str = "quad",
                         lazy: int = 0, accel_log: int = 6,
                         dual: bool = False,
                         debug_counters: bool = False,
                         dma_words: bool = False):
    # win_ref: ONE 2-block SMEM stream per grid step (prev block || cur
    # block, pre-concatenated on device).  Two separate SMEM input streams
    # with shifted windows measured ~15x slower per grid step than one
    # wide stream — SMEM stream DMA dominates the whole parse otherwise.
    if dma_words:
        # hash_log >= 17: the 512 KiB table only fits SMEM if the window
        # stream is single-buffered — DMA it manually from HBM (the parse
        # is compute-bound; losing copy/compute overlap costs ~nothing)
        win_s, sem = extra
        bq = pl.program_id(0)
        cp = pltpu.make_async_copy(win_ref.at[pl.ds(bq, 1)], win_s, sem)
        cp.start()
        cp.wait()
        win_ref = win_s
    WW = win_ref.shape[2]           # words per window (2 blocks)
    tab_size = 1 << hash_log
    assert hash_log >= 8
    shift = np.uint32(32 - hash_log)
    # left shift placing the 7 tag bits (u[shift-7, shift)) at bits 24..31
    TAGB_SH = hash_log - 1
    TAG_MASK = 0x7F << 24
    GOLD = np.uint32(0x9E3779B1)

    b = pl.program_id(0)
    base = b * block_bytes          # absolute position of the window start
    # strict arm: bytes 4..strict_hash_bytes of the hash come from the
    # second word, masked to the configured width (8 = the classic
    # long-hash arm; 6 finds 6-7 byte matches the 8-byte hash misses)
    SH_MASK = np.uint32((1 << (8 * (strict_hash_bytes - 4))) - 1) \
        if strict_hash_bytes < 8 else np.uint32(0xFFFFFFFF)

    @pl.when(b == 0)
    def _():
        def zb(i, _):
            table_ref[i] = -1
            return 0

        jax.lax.fori_loop(0, tab_size, zb, 0)

    blen = meta_ref[0, 0, 0]        # current block length
    min_abs = meta_ref[0, 0, 1]     # first referenceable absolute position
    h16 = meta_ref[0, 0, 2]         # block byte entropy * 16 (gate)

    # literal-coverage bitmask (1 bit per block byte, 1 = literal): starts
    # all-ones, kept matches clear their span below.  Downstream this
    # replaces the XLA post's scatter-built region mask (~10 ms/8 MiB of
    # the old fill_regions scatters).
    NWM = mask_ref.shape[2]

    def mi(i, _):
        mask_ref[0, 0, i] = -1
        return 0

    jax.lax.fori_loop(0, NWM, mi, 0)
    # window coords: [0, 4*CW) = previous block, [4*CW, 4*CW+blen) = this one
    limit = block_bytes + blen - 12

    def word(q):
        return win_ref[0, 0, jnp.clip(q, 0, WW - 1)]

    def byte(i):
        return (word(i >> 2) >> ((i & 3) * 8)) & 0xFF

    def w32(i):
        q = i >> 2
        sh = ((i & 3) * 8).astype(jnp.uint32)
        lo = word(q).astype(jnp.uint32)
        hi = word(q + 1).astype(jnp.uint32)
        v = (lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
        return v.astype(jnp.int32)

    # unclamped fast path (callers stay in window bounds)
    def byte_c(i):
        return (win_ref[0, 0, i >> 2] >> ((i & 3) * 8)) & 0xFF

    def w32_c(i):
        q = i >> 2
        sh = ((i & 3) * 8).astype(jnp.uint32)
        lo = win_ref[0, 0, q].astype(jnp.uint32)
        hi = win_ref[0, 0, jnp.minimum(q + 1, WW - 1)].astype(jnp.uint32)
        v = (lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
        return v.astype(jnp.int32)

    def extend(ip, cand):
        # source may start in the previous block (cross-block match); the
        # probe side (ip) is always in the current block
        lim = block_bytes + blen
        # gallop: GX bytes per iteration while every word matches.  The
        # 4-byte loop's compare->branch chain serializes at SMEM load
        # latency (~27 ns per 4 bytes), and long matches (zero runs,
        # periodic data) walk megabytes through it; the wide step's loads
        # pipeline, so the per-iteration cost grows far slower than GX.
        GX = 64

        def gcond(l):
            # & does not short-circuit: clamp the probe base so the loads
            # stay in-array even on the final (failing-bound) evaluation;
            # the source side b >= 0 because dist < block_bytes <= ip
            a = jnp.minimum(ip + l, jnp.int32(4 * WW - GX))
            b = jnp.maximum(a - (ip - cand), 0)
            m = w32_c(a) == w32_c(b)
            for t in range(1, GX // 4):
                m = m & (w32_c(a + 4 * t) == w32_c(b + 4 * t))
            return (ip + l + GX <= lim) & m

        l = jax.lax.while_loop(gcond, lambda l: l + GX, jnp.int32(4))

        def wcond(l):
            return (ip + l + 4 <= lim) & (w32_c(ip + l) == w32(cand + l))

        l = jax.lax.while_loop(wcond, lambda l: l + 4, l)
        for _ in range(3):
            ok = (ip + l < lim) & (byte_c(ip + l) == byte(cand + l))
            l = l + ok
        return l

    # --- tagged hash table ------------------------------------------
    # Entries pack {tag:7, pos:24} with the sign bit left clear (-1 =
    # empty): pos is the absolute batch position (the wrapper asserts
    # batches stay under 2^24 bytes) and tag is 7 extra bits of the same
    # hash product, pre-shifted to bits 24..30 (tagb).  Validity is ONE
    # range check: entry in [tagb + window_lo, tagb + pos) — it fuses the
    # tag-equality, in-window, dist >= 1 and empty (-1) rejections (a
    # mismatched tag lands outside the 24-bit range either side).  The
    # hash covers 5 bytes (= min_match); the strict arm — low-entropy
    # blocks whose gate rejects short matches — hashes 8 bytes, so 4-7
    # byte matches never reach the extend/backward/gate work at all.

    def make_arm(strict: bool):
        # dual (zstd dfast analog): the table splits into a 2^(hl-1)-entry
        # short-hash (5 B) half and a 2^(hl-2)-entry long-hash (8 B)
        # quarter; every position probes and seeds both, preferring the
        # long candidate.  In the STRICT (low-entropy text) arm the short
        # candidate confirms on 4 bytes and faces the profitability gate —
        # without this every 5-7 byte match is invisible there (the strict
        # single hash needs 8 agreeing bytes), which measured as the whole
        # structured-text coverage gap vs ZSTD_fast (68% vs 92%).
        dual_arm = dual and not strict
        dual_s = dual and strict
        dual_any = dual_arm or dual_s
        SL = hash_log - 1
        LOFF = 1 << SL

        def U(v):
            return v.astype(jnp.uint32)

        def sig_u(w, ext):
            # bucket + tag from one hash product over 5 (or 6-8) bytes
            if strict:
                return (U(w) ^ ((U(ext) & SH_MASK) * GOLD)) * PRIME
            return (U(w) ^ (U(ext) << 13)) * PRIME

        def sig_long(w, ext4):
            return (U(w) ^ (U(ext4) * GOLD)) * PRIME

        def h_tagb(u):
            h = (u >> shift).astype(jnp.int32)
            tagb = ((u << TAGB_SH).astype(jnp.int32)) & TAG_MASK
            return h, tagb

        def h_tagb_sub(u, tlog, off):
            h = (u >> np.uint32(32 - tlog)).astype(jnp.int32) + off
            tagb = ((u << (tlog - 1)).astype(jnp.int32)) & TAG_MASK
            return h, tagb

        def _load3(ip, clamped):
            q = ip >> 2
            sh = ((ip & 3) * 8).astype(jnp.uint32)
            if clamped:
                lo = U(win_ref[0, 0, q])
                hi = U(win_ref[0, 0, jnp.minimum(q + 1, WW - 1)])
                w3 = U(win_ref[0, 0, jnp.minimum(q + 2, WW - 1)])
            else:
                lo = U(win_ref[0, 0, q])
                hi = U(win_ref[0, 0, q + 1])
                w3 = U(win_ref[0, 0, q + 2]) if (strict or dual_arm) \
                    else jnp.uint32(0)
            nz = jnp.uint32(32) - sh
            w = ((lo >> sh) | jnp.where(
                sh == 0, jnp.uint32(0), hi << nz)).astype(jnp.int32)
            ext4 = ((hi >> sh) | jnp.where(
                sh == 0, jnp.uint32(0), w3 << nz)).astype(jnp.int32)
            return w, ext4

        def probe_sig(ip):
            # unclamped loads: probes stay >= 12 bytes from block end
            w, ext4 = _load3(ip, False)
            if strict:
                return h_tagb(sig_u(w, ext4))
            if dual_arm:
                return h_tagb_sub(sig_u(w, ext4 & 0xFF), SL, 0)
            return h_tagb(sig_u(w, ext4 & 0xFF))

        def probe_sig_long(ip):
            w, ext4 = _load3(ip, False)
            return h_tagb_sub(sig_long(w, ext4), SL - 1, LOFF)

        def probe_both(ip):
            w, ext4 = _load3(ip, False)
            h_s, tb_s = h_tagb_sub(sig_u(w, ext4 & 0xFF), SL, 0)
            h_l, tb_l = h_tagb_sub(sig_long(w, ext4), SL - 1, LOFF)
            return h_s, tb_s, h_l, tb_l

        def insert_at(p):
            # clamped variant for in-match inserts (may sit near the end)
            w, ext4 = _load3(p, True)
            if dual_any:
                h_l, tb_l = h_tagb_sub(sig_long(w, ext4), SL - 1, LOFF)
                table_ref[h_l] = (base + p) | tb_l
                h, tagb = h_tagb_sub(sig_u(w, ext4 & 0xFF), SL, 0)
            elif strict:
                h, tagb = h_tagb(sig_u(w, ext4))
            else:
                h, tagb = h_tagb(sig_u(w, ext4 & 0xFF))
            table_ref[h] = (base + p) | tagb

        def do_match_full(ip, anchor, cnt, miss, rep, cand_abs, conf):
            """Shared match arm (single-step hit and quad-loop hit):
            extend, [lazy: try ip+1(/+2) for a longer match], reseed the
            table across the span, backward-extend, gate, emit.  Caller
            guarantees cnt < cap and has confirmed the candidate's bytes
            into `conf`."""
            l = extend(ip, cand_abs - base)

            # lazy matching (the zstd greedy->lazy ladder step,
            # /root/reference/src/compress.c:73-90 level semantics): probe
            # the next position(s); a strictly longer confirmed match
            # there wins and the skipped byte joins the literal run
            for _lz in range(lazy):
                def try_next(args):
                    ip, cand_abs, l, conf = args
                    h2, tagb2 = (probe_sig_long(ip + 1) if dual_any
                                 else probe_sig(ip + 1))
                    e2 = table_ref[h2]
                    pos2 = base + ip + 1
                    wlo2 = jnp.maximum(min_abs, pos2 - max_offset)
                    good2 = (e2 >= tagb2 + wlo2) & (e2 < tagb2 + pos2)
                    table_ref[h2] = pos2 | tagb2
                    c2_abs = e2 & 0xFFFFFF
                    c2 = c2_abs - base

                    def probe2(_):
                        conf2 = w32(c2) == w32_c(ip + 1)
                        l2 = jax.lax.cond(
                            conf2, lambda _: extend(ip + 1, c2),
                            lambda _: jnp.int32(0), None)
                        better = conf2 & (l2 > l)
                        return (jnp.where(better, ip + 1, ip),
                                jnp.where(better, c2_abs, cand_abs),
                                jnp.where(better, l2, l),
                                conf | better)

                    return jax.lax.cond(
                        good2, probe2,
                        lambda _: (ip, cand_abs, l, conf), None)

                ip, cand_abs, l, conf = jax.lax.cond(
                    conf & (ip + 1 < limit), try_next,
                    lambda a: a, (ip, cand_abs, l, conf))

            pos = base + ip
            dist = pos - cand_abs
            cand = cand_abs - base  # window position

            # keep the table alive across the matched span: without these
            # the next block has nothing in-window to match after a long
            # run.  le clamps the inserts on UNCONFIRMED candidates: the
            # walk resumes at ip+1 there, and a store ahead of the probe
            # pointer would later be read back as a bogus "candidate"
            le = jnp.where(conf, l, jnp.int32(2))
            # at most ~8 mid-span inserts: a 128 KiB match does not need
            # 4096 table refreshes (each is ~5 SMEM ops); the stride
            # stays 32 B for spans <= 256 B, then widens
            nins = jnp.minimum(le >> 5, jnp.int32(8))
            stp = le // jnp.maximum(nins, 1)

            def ins(k, _):
                insert_at(ip + k * stp)
                return 0

            jax.lax.fori_loop(1, nins, ins, 0)
            insert_at(ip + le - 2)
            # backward extension (zstd-fast does the same): the miss
            # accelerator can step past a match's true start; walk back
            # over equal bytes to the previous anchor / fence
            minw = min_abs - base

            def bcond(k):
                return (ip - k > anchor) & (cand - k > minw) & \
                    (byte_c(ip - k - 1) ==
                     byte(jnp.maximum(cand - k - 1, 0)))

            kb = jax.lax.while_loop(bcond, lambda k: k + 1,
                                    jnp.int32(0))
            ips = ip - kb
            lf = l + kb
            # profitability gate: a sequence costs ~gate_bits state/extra
            # bits + log2(offset) bits vs ~H bits per literal byte.
            # Branch-free: gated-out/unconfirmed matches write to slot cnt
            # anyway (the next survivor overwrites) and just don't advance
            # cnt/anchor.
            ebits = 31 - jax.lax.clz(dist + 3)
            # a repeated distance codes as repcode 1 downstream
            # (zstd_encode._rep1_rewrite): no offset extra bits and a
            # near-free FSE symbol, so the gate charges it ~8 bits fixed
            # and admits length-4 matches (zstd's own rep special case)
            cheap = (dist == rep) & (cnt > 0) & (ips > anchor)
            keep = conf & \
                (lf >= jnp.where(cheap, 4, min_match)) & \
                (lf * h16 > jnp.where(cheap,
                                      jnp.maximum(gate_bits - 6, 6),
                                      gate_bits + ebits) * 16)
            ll_ref[0, 0, cnt] = ips - anchor
            ml_ref[0, 0, cnt] = lf
            off_ref[0, 0, cnt] = dist + 3

            @pl.when(keep)
            def _():
                # clear mask bits [a, a+lf) (block-relative)
                a = ips - block_bytes
                eend = a + lf
                wa = a >> 5
                we = (eend - 1) >> 5
                lowm = (jnp.uint32(1) << (a & 31).astype(jnp.uint32)) - 1
                eb = (eend & 31).astype(jnp.uint32)
                highm = jnp.where(eb == 0, jnp.uint32(0),
                                  jnp.uint32(0xFFFFFFFF) << eb)
                mm = jnp.where(wa == we, lowm | highm, lowm)
                mask_ref[0, 0, wa] = mask_ref[0, 0, wa] & mm.astype(jnp.int32)

                @pl.when(we > wa)
                def _():
                    mask_ref[0, 0, we] = mask_ref[0, 0, we] & \
                        highm.astype(jnp.int32)

                def zw(wk, _):
                    mask_ref[0, 0, wk] = 0
                    return 0

                jax.lax.fori_loop(wa + 1, we, zw, 0)
            ipn = jnp.where(conf, ip + l, ip + 1 + (miss >> accel_log))
            # a KEPT match resets the miss accelerator; a CONFIRMED but
            # gated-out match halves it instead of incrementing — the
            # stride must not compound through a run of unprofitable
            # short matches (ADVICE r1; ratio-neutral, measured)
            if gated_policy == "halve":
                missn = jnp.where(keep, jnp.int32(0),
                                  jnp.where(conf, miss >> 1, miss + 1))
            else:  # "grow": stride persists through gated-out matches
                missn = jnp.where(keep, jnp.int32(0), miss + 1)
            return (ipn, jnp.where(keep, ip + l, anchor),
                    cnt + keep, missn, jnp.where(keep, dist, rep))

        def do_match_at(ip, anchor, cnt, miss, rep, cand_abs,
                        short4=False):
            if debug_counters:
                n_ref[0, 0, 4] = n_ref[0, 0, 4] + 1
            """Confirm the candidate's bytes, then either the full match
            arm or — non-strict only — a FAST REJECT for confirmed short
            unprofitable matches.  On text-like regions inside high-
            entropy blocks nearly every probe finds a confirmed 5-7 byte
            candidate that the gate then rejects; the full arm's extend/
            reseed/backward machinery per rejection dominated the parse.
            The capped probe (two word compares) computes the exact
            length for l < 8 and replicates the gated path's state
            transition bit-for-bit, including the one table reseed and
            the no-backward-rescue precondition.

            short4: the candidate came from the dual arm's 5-byte table —
            4-byte confirmation suffices (the gate prices the result)."""
            cand = cand_abs - base
            conf4 = w32(cand) == w32_c(ip)
            if strict:
                conf = conf4 & (
                    (w32(cand + 4).astype(jnp.uint32) & SH_MASK) ==
                    (w32_c(ip + 4).astype(jnp.uint32) & SH_MASK))
                # a rep-distance candidate skips the 8-byte confirmation:
                # short rep matches are profitable (see the cheap gate);
                # so does a short-table candidate (dual_s)
                conf = conf | (conf4 & (base + ip - cand_abs == rep) &
                               (cnt > 0))
                if dual_s:
                    conf = conf | (conf4 & short4)
                return do_match_full(ip, anchor, cnt, miss, rep, cand_abs,
                                     conf)
            x2 = (w32(cand + 4) ^ w32_c(ip + 4)).astype(jnp.uint32)
            tz = (31 - jax.lax.clz((x2 & -x2).astype(jnp.int32))) >> 3
            l8 = jnp.where(x2 == 0, jnp.int32(8), 4 + tz)
            pos = base + ip
            dist = pos - cand_abs
            ebits = 31 - jax.lax.clz(dist + 3)
            cheap8 = (dist == rep) & (cnt > 0)
            prof8 = (l8 >= jnp.where(cheap8, 4, min_match)) & \
                (l8 * h16 > jnp.where(cheap8,
                                      jnp.maximum(gate_bits - 6, 6),
                                      gate_bits + ebits) * 16)
            minw = min_abs - base
            # backward extension could lengthen the match past the gate:
            # only reject when the first backward byte already differs
            bk0 = (ip > anchor) & (cand > minw) & \
                (byte_c(ip - 1) == byte(jnp.maximum(cand - 1, 0)))
            fastr = conf4 & (l8 < 8) & jnp.logical_not(prof8) & \
                jnp.logical_not(bk0)

            def fast(_):
                insert_at(ip + l8 - 2)
                if gated_policy == "halve":
                    missn = miss >> 1
                else:
                    missn = miss + 1
                return ip + l8, anchor, cnt, missn, rep

            def full(_):
                return do_match_full(ip, anchor, cnt, miss, rep, cand_abs,
                                     conf4)

            return jax.lax.cond(fastr, fast, full, None)

        # one scalar branch per probe; byte confirmation + the gate run
        # inside the match arm
        def body1(state):
            ip, anchor, cnt, miss, rep = state
            if debug_counters:
                n_ref[0, 0, 3] = n_ref[0, 0, 3] + 1
            pos = base + ip
            wlo = jnp.maximum(min_abs, pos - max_offset)
            # repcode candidate: the previous kept match's distance, the
            # repeat stride of structured data (ZSTD_fast checks it at
            # every position for the same reason).  Static rep_probe
            # gates the extra loads: measured +18 % parse time for
            # +0.15 % ratio at L3, so the default ladder enables it only
            # at effort levels >= 4 (the repeated-distance CHEAP GATE in
            # the match arm stays on everywhere — it is free).
            if rep_probe:
                rep_hit = (rep > 0) & (cnt < cap) & \
                    (w32(jnp.maximum(ip - rep, 0)) == w32_c(ip))
            else:
                rep_hit = jnp.bool_(False)
            if dual_any:
                h_s, tb_s, h_l, tb_l = probe_both(ip)
                e_s = table_ref[h_s]
                e_l = table_ref[h_l]
                good_l = (e_l >= tb_l + wlo) & (e_l < tb_l + pos)
                good_s = (e_s >= tb_s + wlo) & (e_s < tb_s + pos)
                good = (good_l | good_s) & (cnt < cap)
                table_ref[h_s] = pos | tb_s
                table_ref[h_l] = pos | tb_l
                entry = jnp.where(good_l, e_l, e_s)
                short4 = good_s & ~good_l
            else:
                h, tagb = probe_sig(ip)
                entry = table_ref[h]
                good = (entry >= tagb + wlo) & (entry < tagb + pos) & \
                    (cnt < cap)
                table_ref[h] = pos | tagb

            def hit(_):
                cand_abs = jnp.where(rep_hit, pos - rep, entry & 0xFFFFFF)
                s4 = (short4 & ~rep_hit) if dual_any else False
                return do_match_at(ip, anchor, cnt, miss, rep, cand_abs,
                                   s4)

            def do_miss(_):
                return (ip + 1 + (miss >> accel_log), anchor, cnt,
                        miss + 1, rep)

            return jax.lax.cond(good | rep_hit, hit, do_miss, None)

        return body1, do_match_at

    def run_single(body1):
        ip0 = jnp.int32(block_bytes)
        return jax.lax.while_loop(
            lambda s: s[0] < limit, body1,
            (ip0, ip0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    # --- quad miss loop ---------------------------------------------
    # The miss path dominates parse time (matches advance by their length
    # for free).  This loop probes FOUR word-aligned positions per
    # iteration: two aligned word loads (three in the strict arm) yield
    # all four unaligned probe words with compile-time shifts, killing the
    # dynamic-shift/select construction the single-step path pays per
    # position.  Candidate hits exit to the shared match arm; the head/
    # tail and post-match realignment run the single-step body.

    def make_quad(strict: bool, body1, do_match_at, W: int = 4):
        def U(v):
            return v.astype(jnp.uint32)

        NLD = W // 4 + (2 if strict else 1)  # aligned words per iteration

        def qcond(s):
            q, fnd, fndr = s[0], s[1], s[2]
            return ((fnd | fndr) == 0) & \
                (4 * q <= block_bytes + blen - 12 - W)

        def make_qbody(rep):
            # rep is loop-invariant inside the quad walk (it only changes
            # on kept matches, which exit the loop)
            def qbody(s):
                q = s[0]
                fnd = s[1]
                fndr = s[2]
                miss = s[3 + W]
                ws = [U(win_ref[0, 0, q + j]) for j in range(NLD)]
                pos0 = base + 4 * q
                # one window bound for all W positions (conservative by
                # W-1 bytes at the far edge, so emitted dists stay <=
                # max_offset)
                wlo = jnp.maximum(min_abs, pos0 - (max_offset - (W - 1)))
                # rep-candidate words: two dynamically-shifted bases give
                # all W sliding compare words with compile-time shifts
                if rep_probe:
                    rq = 4 * q - rep
                    mj = rq >> 2
                    sh = ((rq & 3) * 8).astype(jnp.uint32)
                    m0 = U(win_ref[0, 0, jnp.maximum(mj, 0)])
                    m1 = U(win_ref[0, 0, jnp.maximum(mj + 1, 0)])
                    m2 = U(win_ref[0, 0, jnp.maximum(mj + 2, 0)])
                    nz = jnp.uint32(32) - sh
                    zsh = sh == 0
                    ra = (m0 >> sh) | jnp.where(zsh, jnp.uint32(0),
                                                m1 << nz)
                    rb = (m1 >> sh) | jnp.where(zsh, jnp.uint32(0),
                                                m2 << nz)
                    check_rep = rep > 0
                es = []
                for k in range(W):
                    j, r = k // 4, 8 * (k % 4)
                    wk = ws[j] if r == 0 else \
                        ((ws[j] >> r) | (ws[j + 1] << (32 - r)))
                    if strict:
                        ek = ws[j + 1] if r == 0 else \
                            ((ws[j + 1] >> r) | (ws[j + 2] << (32 - r)))
                        u = (wk ^ ((ek & SH_MASK) * GOLD)) * PRIME
                    else:
                        ek = (ws[j + 1] >> r) & jnp.uint32(0xFF)
                        u = (wk ^ (ek << 13)) * PRIME
                    h = (u >> shift).astype(jnp.int32)
                    tagb = ((u << TAGB_SH).astype(jnp.int32)) & TAG_MASK
                    entry = table_ref[h]
                    pos_k = pos0 + k
                    good = (entry >= tagb + wlo) & (entry < tagb + pos_k)
                    table_ref[h] = pos_k | tagb
                    fnd = fnd | (good.astype(jnp.int32) << k)
                    if rep_probe:
                        rv = ra if k == 0 else \
                            ((ra >> (8 * k)) | (rb << (32 - 8 * k)))
                        rhit = check_rep & (rv == wk)
                        fndr = fndr | (rhit.astype(jnp.int32) << k)
                    es.append(entry)
                if debug_counters:
                    n_ref[0, 0, 2] = n_ref[0, 0, 2] + 1
                return (q + W // 4 + (miss >> (accel_log + 2)), fnd, fndr,
                        *es, miss + W, q)

            return qbody

        def outer(state):
            # realign: single-step while ip is not word-aligned
            st = jax.lax.while_loop(
                lambda s: (s[0] < limit) & ((s[0] & 3) != 0), body1, state)
            ip, anchor, cnt, miss, rep = st
            q0 = ip >> 2
            z = jnp.int32(0)
            qs = jax.lax.while_loop(
                qcond, make_qbody(rep),
                (q0, z, z) + (z,) * W + (miss, q0))
            q = qs[0]
            fnd = qs[1]
            fndr = qs[2]
            es = qs[3: 3 + W]
            missq = qs[3 + W]
            qp = qs[4 + W]

            def with_hit(_):
                both = fnd | fndr
                k = jnp.int32(W - 1)
                entry = es[W - 1]
                for j in range(W - 2, -1, -1):
                    hit_j = (both & (1 << j)) != 0
                    k = jnp.where(hit_j, jnp.int32(j), k)
                    entry = jnp.where(hit_j, es[j], entry)
                iph = 4 * qp + k
                # a rep candidate wins over the hash candidate (it codes
                # as repcode 1 and needs no tag validation)
                is_rep = (fndr >> k) & 1
                cand_abs = jnp.where(is_rep != 0, base + iph - rep,
                                     entry & 0xFFFFFF)
                return do_match_at(iph, anchor, cnt, missq, rep, cand_abs)

            def no_hit(_):
                # tail (< 12+W bytes to the limit): single-step to the end
                st2 = (4 * q, anchor, cnt, missq, rep)
                return jax.lax.while_loop(lambda s: s[0] < limit, body1,
                                          st2)

            return jax.lax.cond(((fnd | fndr) != 0) & (cnt < cap),
                                with_hit, no_hit, None)

        ip0 = jnp.int32(block_bytes)
        return jax.lax.while_loop(
            lambda s: s[0] < limit, outer,
            (ip0, ip0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    def run(strict: bool):
        body1, dm = make_arm(strict)
        # the quad loop probes the single-table domain; the dual arms
        # single-step (high levels trade probe throughput for search)
        if variant == "quad" and not dual:
            return make_quad(strict, body1, dm)
        return run_single(body1)

    # gate break-even: when even short matches cannot pass the gate the
    # strict arm runs, with the hash/tag committed to 8 candidate bytes
    # (threshold measured ratio-neutral at 480 = h16 <= 80, i.e. blocks
    # under 5 bits/byte of entropy)
    strict_blk = 6 * h16 <= strict_h16_x6

    if debug_counters:
        for _k in range(2, 6):
            n_ref[0, 0, _k] = 0

    @pl.when(strict_blk)
    def _():
        ip, anchor, cnt, miss, _rep = run(True)
        n_ref[0, 0, 0] = cnt
        n_ref[0, 0, 1] = anchor - block_bytes
        if debug_counters:
            n_ref[0, 0, 5] = 1

    @pl.when(jnp.logical_not(strict_blk))
    def _():
        ip, anchor, cnt, miss, _rep = run(False)
        n_ref[0, 0, 0] = cnt
        n_ref[0, 0, 1] = anchor - block_bytes   # cover end, block-relative


@partial(jax.jit, static_argnames=("cap", "max_offset", "hash_log",
                                   "gate_bits", "min_match", "gated_policy",
                                   "strict_h16_x6", "strict_hash_bytes",
                                   "rep_probe", "lazy", "accel_log",
                                   "dual", "debug_counters", "interpret"))
def zstd_parse_linked_smem(x2: jnp.ndarray, lengths: jnp.ndarray,
                           min_abs: jnp.ndarray, h16: jnp.ndarray,
                           cap: int = 8192,
                           max_offset: int = (1 << 17) - 1,
                           hash_log: int = 16,
                           gate_bits: int = 14, min_match: int = 5,
                           gated_policy: str = "halve",
                           strict_h16_x6: int = 480,
                           strict_hash_bytes: int = 8,
                           rep_probe: bool = False,
                           lazy: int = 0, accel_log: int = 6,
                           dual: bool = False,
                           debug_counters: bool = False,
                           interpret: bool = False):
    """Linked-block gated zstd parse.

    x2: (B+1, N) uint8 — row r+1 is block r, row r its context (the frame's
    previous block, or anything when min_abs excludes it).  lengths (B,);
    min_abs (B,) absolute first referenceable position, where block r's
    bytes occupy absolute [(r+1)*N, (r+1)*N + lengths[r]); h16 (B,) block
    byte entropy in 1/16 bits (the gate's cost scale).  Returns
    (ll, ml, offv, n_seq, cover_end, lit_mask) with the gate already
    applied — ll/ml are final sequence fields (ll = literal run before the
    match); lit_mask (B, N//32) flags literal bytes (bit i of word w =
    block byte 32w+i, 1 = literal), replacing the XLA post stage's
    scatter-built coverage mask."""
    B1, N = x2.shape
    B = B1 - 1
    # table entries pack absolute positions into 24 bits (7-bit tag above)
    assert B1 * N <= (1 << 24), "batch too large for tagged-table positions"
    NW = N // 4
    words = jax.lax.bitcast_convert_type(
        x2.reshape(B1, NW, 4), jnp.int32)
    NC = 6 if debug_counters else 2
    NWM = N // 32
    kernel = partial(_parse_linked_kernel, cap=cap, max_offset=max_offset,
                     hash_log=hash_log, block_bytes=N,
                     gate_bits=gate_bits, min_match=min_match,
                     gated_policy=gated_policy, strict_h16_x6=strict_h16_x6,
                     strict_hash_bytes=strict_hash_bytes,
                     rep_probe=rep_probe,
                     lazy=lazy, accel_log=accel_log, dual=dual,
                     debug_counters=debug_counters)

    def smem(shape, shift=0):
        return pl.BlockSpec(memory_space=pltpu.SMEM,
                            block_shape=(1,) + shape[1:],
                            index_map=lambda b: (b + shift,) + (0,) *
                            (len(shape) - 1))

    meta = jnp.stack([lengths.astype(jnp.int32), min_abs.astype(jnp.int32),
                      h16.astype(jnp.int32)], axis=1)
    # ONE wide SMEM input stream (prev || cur), concatenated on device:
    # two shifted SMEM streams of the same array measured ~15x slower
    wide = jnp.concatenate([words[:-1], words[1:]], axis=1)
    dma_words = hash_log >= 17
    kernel = partial(kernel, dma_words=dma_words)
    win_spec = pl.BlockSpec(memory_space=pltpu.ANY) if dma_words \
        else smem((B, 1, 2 * NW))
    extra_scratch = [pltpu.SMEM((1, 1, 2 * NW), jnp.int32),
                     pltpu.SemaphoreType.DMA] if dma_words else []
    ll, ml, off, nn, lmask = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[win_spec, smem((B, 1, 3))],
        out_specs=[smem((B, 1, cap)), smem((B, 1, cap)), smem((B, 1, cap)),
                   smem((B, 1, NC)), smem((B, 1, NWM))],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, NC), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, NWM), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1 << hash_log,), jnp.int32)]
        + extra_scratch,
        interpret=interpret,
    )(wide.reshape(B, 1, 2 * NW), meta.reshape(B, 1, 3))
    if debug_counters:
        return (ll[:, 0], ml[:, 0], off[:, 0], nn[:, 0, 0], nn[:, 0, 1],
                lmask[:, 0], nn[:, 0, 2:])
    return (ll[:, 0], ml[:, 0], off[:, 0], nn[:, 0, 0], nn[:, 0, 1],
            lmask[:, 0])


# ---------------------------------------------------------------------------
# SMEM sequence executor (decode side)
#
# Sequence execution is the decode wall in XLA form (pointer-doubling
# gathers over (B, F) planes).  Here each grid step executes one block's
# sequences as a scalar byte loop against a 256 KiB ring of the frame's
# recent output held in SMEM scratch — the ring persists across grid steps
# (TPU pallas iterates the grid sequentially), so linked blocks and
# windowed matches (offset <= 128K-1, our encoder's bound) resolve without
# any inter-step copies.  Blocks are frame-major ordered; each block's
# positions are frame-relative (meta carries its decompressed offset).
# ---------------------------------------------------------------------------

_RING_WORDS = 1 << 16  # 256 KiB ring >= 2x the 128K-1 max offset


def _exec_kernel_smem(lit_ref, seq_ll, seq_ml, seq_off, meta_ref, out_ref,
                      ring_ref, *, cap: int):
    LW = lit_ref.shape[2]
    M = _RING_WORDS - 1

    def lit_byte(i):
        return (lit_ref[0, 0, i >> 2] >> ((i & 3) * 8)) & 0xFF

    def lit_w32(i):
        # unaligned LE32 from the packed literal words
        q = i >> 2
        sh = ((i & 3) * 8).astype(jnp.uint32)
        lo = lit_ref[0, 0, q].astype(jnp.uint32)
        hi = lit_ref[0, 0, jnp.minimum(q + 1, LW - 1)].astype(jnp.uint32)
        return (lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))

    def ring_read(p):
        w = p >> 2
        return (ring_ref[w & M] >> ((p & 3) * 8)) & 0xFF

    def ring_w32(p):
        q = p >> 2
        sh = ((p & 3) * 8).astype(jnp.uint32)
        lo = ring_ref[q & M].astype(jnp.uint32)
        hi = ring_ref[(q + 1) & M].astype(jnp.uint32)
        return (lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))

    def ring_write(p, b):
        w = (p >> 2) & M
        sh = (p & 3) * 8
        old = ring_ref[w]
        ring_ref[w] = (old & ~(0xFF << sh)) | ((b & 0xFF) << sh)

    n_seq = meta_ref[0, 0, 0]
    content = meta_ref[0, 0, 1]
    base = meta_ref[0, 0, 2]      # block's decompressed offset in the frame

    def seq_body(state):
        j, op, lp = state
        ll = seq_ll[0, 0, j]
        ml = seq_ml[0, 0, j]
        off = seq_off[0, 0, j]

        # --- literal copy: align dst to a word, then 4 bytes/iteration ---
        head = jnp.minimum(ll, (-op) & 3)

        def lhead(k, _):
            ring_write(op + k, lit_byte(lp + k))
            return 0

        jax.lax.fori_loop(0, head, lhead, 0)
        nw = (ll - head) >> 2
        dw0 = (op + head) >> 2

        def lword(k, _):
            ring_ref[(dw0 + k) & M] = lit_w32(lp + head + 4 * k).astype(
                jnp.int32)
            return 0

        jax.lax.fori_loop(0, nw, lword, 0)
        done = head + 4 * nw

        def ltail(k, _):
            ring_write(op + done + k, lit_byte(lp + done + k))
            return 0

        jax.lax.fori_loop(0, ll - done, ltail, 0)

        # --- match copy: word-wise when off >= 4 (source fully behind) ---
        ms = op + ll
        safe = off >= 4
        mhead = jnp.where(safe, jnp.minimum(ml, (-ms) & 3), ml)

        def mbyte(k, _):
            ring_write(ms + k, ring_read(ms + k - off))
            return 0

        jax.lax.fori_loop(0, mhead, mbyte, 0)
        mw = jnp.where(safe, (ml - mhead) >> 2, 0)
        mw0 = (ms + mhead) >> 2

        def mword(k, _):
            ring_ref[(mw0 + k) & M] = ring_w32(
                ms + mhead + 4 * k - off).astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, mw, mword, 0)
        mdone = mhead + 4 * mw

        def mtail(k, _):
            ring_write(ms + mdone + k, ring_read(ms + mdone + k - off))
            return 0

        jax.lax.fori_loop(0, ml - mdone, mtail, 0)
        return j + 1, op + ll + ml, lp + ll

    j, op, lp = jax.lax.while_loop(
        lambda s: s[0] < n_seq, seq_body,
        (jnp.int32(0), base, jnp.int32(0)))

    # stream the block's bytes out of the ring (word-aligned: blocks start
    # at 128 KiB boundaries)
    def out_copy(w, _):
        out_ref[0, 0, w] = ring_ref[((base >> 2) + w) & (_RING_WORDS - 1)]
        return 0

    jax.lax.fori_loop(0, (content + 3) >> 2, out_copy, 0)


@partial(jax.jit, static_argnames=("cap", "interpret"))
def execute_blocks_smem(lit_words: jnp.ndarray, ll: jnp.ndarray,
                        ml: jnp.ndarray, off: jnp.ndarray,
                        meta: jnp.ndarray, cap: int | None = None,
                        interpret: bool = False):
    """Execute per-block sequence lists into output bytes.

    lit_words: (BL, LW) int32 packed literal bytes per block;
    ll/ml/off: (BL, S) int32 (off = raw distance; a trailing
    literals-only pseudo-sequence carries the block tail);
    meta: (BL, 3) int32 = (n_seq, content_bytes, d_offset_in_frame).
    Blocks must be frame-major ordered with frames starting at
    d_offset 0.  Returns (BL, 32768) int32 output words."""
    BL, LW = lit_words.shape
    S = ll.shape[1]
    if cap is None:
        cap = S
    kernel = partial(_exec_kernel_smem, cap=cap)

    def smem(shape):
        return pl.BlockSpec(memory_space=pltpu.SMEM,
                            block_shape=(1,) + shape[1:],
                            index_map=lambda b: (b,) + (0,) *
                            (len(shape) - 1))

    out = pl.pallas_call(
        kernel,
        grid=(BL,),
        in_specs=[smem((BL, 1, LW)), smem((BL, 1, S)), smem((BL, 1, S)),
                  smem((BL, 1, S)), smem((BL, 1, 3))],
        out_specs=smem((BL, 1, 1 << 15)),
        out_shape=jax.ShapeDtypeStruct((BL, 1, 1 << 15), jnp.int32),
        scratch_shapes=[pltpu.SMEM((_RING_WORDS,), jnp.int32)],
        interpret=interpret,
    )(lit_words.reshape(BL, 1, LW), ll.reshape(BL, 1, S),
      ml.reshape(BL, 1, S), off.reshape(BL, 1, S),
      meta.reshape(BL, 1, 3))
    return out[:, 0]
