"""Fused SMEM zstd block decoder — Huffman + FSE + execution in one pass.

The XLA decode pipeline (ops/zstd_decode.py) pays gather rates (~100M
elem/s, 2+ gathers per symbol) across three separate dispatches (Huffman
lanes, FSE lanes, sequence executor) with host syncs between them.  This
kernel replaces all three with ONE sequential scalar pass per block on the
TPU core, the decode-side mirror of ops/pallas_entropy.py:

  * literal streams (4-stream or 1-stream Huffman) decode backward with a
    12-bit MSB peek into the block's padded dtable (same packing as
    zstd_decode._HufReg), 4 symbols per loop iteration, into an SMEM
    literal buffer;
  * the sequence section decodes backward with the interleaved 3-state
    tANS walk (any FSE mode via the packed table rows), resolving repcodes
    inline — the rep state lives in SMEM scratch and persists across grid
    steps, so linked blocks of a frame chain without host round trips;
  * each decoded sequence executes immediately (word-at-a-time literal and
    match copies) against the persistent 256 KiB output ring shared with
    ops/pallas_match.execute_blocks_smem.

Eligibility mirrors the SMEM executor: content <= 128 KiB per block,
match offsets < 128K (our encoder's bound; checked in-kernel, reported in
the stat row so the host can fall back to the XLA path for foreign
archives with larger windows).

Reference counterpart: the single scalar ZSTD_decompressDCtx call
(/root/reference/src/decompress.c:537).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libzseek_tpu.format import zstd_frame as zf

# meta[0] mode bits
DMODE_HUF4 = 1       # literal section: 4-stream Huffman
DMODE_HUF1 = 2       # literal section: 1-stream Huffman
DMODE_DIRECT = 4     # literal payload is the literal bytes themselves
DMODE_SEQ = 8        # block has a sequence section (n_seq > 0)
DMODE_FRAME_START = 16  # first block of a frame: reset repcode state
DMODE_TRANSCODE = 32    # emit (literals, packed seq tokens) instead of
                        # executing matches: the host C executor
                        # (native/zn.cc zn_zir_execute) expands them at
                        # memory speed, so only ~compressed-size bytes
                        # cross the device->host link instead of the full
                        # decompressed frame
DMODE_LIT_HOST = 64     # literals stay on host (raw/RLE section of a
                        # transcoded block): nothing uploaded or fetched

# transcode token packing (2 int32 words per sequence):
#   w0 = ll | (ml_lo14 << 18)        w1 = off | (ml_hi4 << 28)
# ll <= 2^18-1 (block max 128 KiB), ml <= 2^18-1 (131074 max), off up to
# 2^28-1 — host execution has the whole frame window, so transcode
# accepts long-range offsets far beyond the exec path's 128 KiB ring
# (both our LDM-produced frames and foreign big-window archives)

_RING_WORDS = 1 << 16   # 256 KiB ring, shared bound with execute_blocks_smem
_HUF_PEEK = 12
MAX_OFFSET = (1 << 17) - 1   # ring-implied match offset bound
MAX_LP_WORDS = 1 << 15       # literal payload window cap (128 KiB)
MAX_SQ_WORDS = 1 << 14       # sequence stream window cap (64 KiB): keeps
                             # the double-buffered SMEM windows within the
                             # ~1 MiB budget; longer streams fall back

# meta layout (int32 x 16)
#  0 mode | 1 content_expected | 2 base d_off | 3 lit_regen
#  4..7 per-stream total bits | 8..11 per-stream byte base in payload
#  12 seq total bits | 13 n_seq | 14 tl_pack (ll | of<<8 | ml<<16) | 15 spare
META_W = 16


def _build_ctab() -> tuple[np.ndarray, dict[str, int]]:
    parts = [("ll_bits", zf.LL_BITS), ("ll_base", zf.LL_BASELINE),
             ("ml_bits", zf.ML_BITS), ("ml_base", zf.ML_BASELINE)]
    offs, chunks, pos = {}, [], 0
    for name, arr in parts:
        offs[name] = pos
        a = np.asarray(arr, np.int32)
        chunks.append(a)
        pos += len(a)
    return np.concatenate(chunks).astype(np.int32), offs


_CTAB, _COFF = _build_ctab()


def _decode_kernel(lp_ref, sq_ref, dtab_ref, ftab_ref, meta_ref, ctab_ref,
                   out_ref, stat_ref, ring_ref, rep_ref):
    # SMEM is the scarce resource (~1 MiB incl. double-buffered windows):
    # decoded literals live in the OUT window itself — they are consumed
    # strictly before the final ring->out copy overwrites it — so the
    # kernel needs no separate literal scratch.
    M = _RING_WORDS - 1
    LPW = lp_ref.shape[2]
    SQW = sq_ref.shape[2]
    LW = out_ref.shape[2]
    O = _COFF

    mode = meta_ref[0, 0, 0]
    base = meta_ref[0, 0, 2]
    regen = meta_ref[0, 0, 3]
    n_seq = meta_ref[0, 0, 13]
    tlp = meta_ref[0, 0, 14]
    tc = (mode & DMODE_TRANSCODE) != 0

    # ---- unaligned bit reads from a packed word ref ----
    def u32_at(ref, W, b):
        # LE32 starting at byte b (b >= 0)
        q = b >> 2
        sh = ((b & 3) * 8).astype(jnp.uint32)
        lo = ref[0, 0, q].astype(jnp.uint32)
        hi = ref[0, 0, jnp.minimum(q + 1, W - 1)].astype(jnp.uint32)
        return (lo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                      hi << (jnp.uint32(32) - sh))

    def read_at(ref, W, base_bit, start, nb):
        # bits [start, start+nb) relative to base_bit, nb <= 16; negative
        # start reads zero-filled from below — REQUIRED for valid streams,
        # not just corrupt ones: the last symbols of a backward stream
        # peek _HUF_PEEK bits past bit 0 (same semantics as
        # zstd_decode._read_at)
        a = base_bit + start
        a0 = jnp.maximum(a, 0)
        w = u32_at(ref, W, a0 >> 3) >> (a0 & 7).astype(jnp.uint32)
        mask = (jnp.uint32(1) << nb.astype(jnp.uint32)) - 1
        under = jnp.clip(-a, 0, 31).astype(jnp.uint32)
        return jnp.where(a >= 0, w & mask,
                         (w << under) & mask).astype(jnp.int32)

    def read_wide(ref, W, base_bit, start, nb):
        nb_lo = jnp.minimum(nb, 16)
        lo = read_at(ref, W, base_bit, start, nb_lo)
        hi = read_at(ref, W, base_bit, start + 16, nb - nb_lo)
        return lo | (hi << 16)

    # ---- literal buffer byte ops (buffer = the out window, see above) ----
    def lit_store(w, v):
        out_ref[0, 0, w] = v

    def lit_write(i, b):
        w = i >> 2
        sh = (i & 3) * 8
        old = out_ref[0, 0, w]
        out_ref[0, 0, w] = (old & ~(0xFF << sh)) | ((b & 0xFF) << sh)

    def lit_byte(i):
        return (out_ref[0, 0, i >> 2] >> ((i & 3) * 8)) & 0xFF

    def lit_w32(i):
        q = i >> 2
        sh = ((i & 3) * 8).astype(jnp.uint32)
        lo = out_ref[0, 0, q].astype(jnp.uint32)
        hi = out_ref[0, 0, jnp.minimum(q + 1, LW - 1)].astype(jnp.uint32)
        return (lo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                      hi << (jnp.uint32(32) - sh))

    # ---- ring ops (identical addressing to execute_blocks_smem) ----
    def ring_read(p):
        return (ring_ref[(p >> 2) & M] >> ((p & 3) * 8)) & 0xFF

    def ring_w32(p):
        q = p >> 2
        sh = ((p & 3) * 8).astype(jnp.uint32)
        lo = ring_ref[q & M].astype(jnp.uint32)
        hi = ring_ref[(q + 1) & M].astype(jnp.uint32)
        return (lo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                      hi << (jnp.uint32(32) - sh))

    def ring_write(p, b):
        w = (p >> 2) & M
        sh = (p & 3) * 8
        old = ring_ref[w]
        ring_ref[w] = (old & ~(0xFF << sh)) | ((b & 0xFF) << sh)

    @pl.when((mode & DMODE_FRAME_START) != 0)
    def _():
        rep_ref[0] = 1
        rep_ref[1] = 4
        rep_ref[2] = 8

    stat_ref[0, 0, 0] = 0
    stat_ref[0, 0, 1] = 1   # ok flag
    stat_ref[0, 0, 2] = 0
    stat_ref[0, 0, 3] = 0

    # ---------------- literal section -> lit buffer ----------------
    @pl.when(((mode & DMODE_DIRECT) != 0) & ((mode & DMODE_LIT_HOST) == 0))
    def _():
        def cpw(w, _):
            lit_store(w, lp_ref[0, 0, w])
            return 0
        jax.lax.fori_loop(0, (regen + 3) >> 2, cpw, 0)

    @pl.when((mode & DMODE_HUF1) != 0)
    def _():
        # single stream (literal sets < 256 bytes): serial walk
        sbits = meta_ref[0, 0, 4]
        sbase8 = meta_ref[0, 0, 8] * 8

        def dec1(pos):
            v = read_at(lp_ref, LPW, sbase8, pos - _HUF_PEEK,
                        jnp.int32(_HUF_PEEK))
            ent = dtab_ref[0, 0, v]
            return pos - (ent >> 8), ent & 255

        nq = regen >> 2

        def qb(k, pos):
            pos, s0 = dec1(pos)
            pos, s1 = dec1(pos)
            pos, s2 = dec1(pos)
            pos, s3 = dec1(pos)
            lit_store(k, s0 | (s1 << 8) | (s2 << 16) | (s3 << 24))
            return pos

        pos = jax.lax.fori_loop(0, nq, qb, sbits)

        def tb(k, pos):
            pos, sym = dec1(pos)
            lit_write(4 * nq + k, sym)
            return pos

        pos = jax.lax.fori_loop(0, regen - 4 * nq, tb, pos)

        # exact consumption: leftover bits mean corruption, not success
        @pl.when(pos != 0)
        def _():
            stat_ref[0, 0, 1] = 0

    @pl.when((mode & DMODE_HUF4) != 0)
    def _():
        # 4 streams decoded in LOCKSTEP: four independent dependency
        # chains overlap on the pipelined scalar core (measured ~2x the
        # throughput of walking the streams one after another).  Each
        # lane decodes 4 symbols per iteration into its own WORD-ALIGNED
        # temp region (stream s at word s*per_w), so every iteration ends
        # in one unconditional word store per lane — no partial-word
        # bookkeeping in the hot loop.  When per % 4 != 0 the temp
        # regions are then shifted down to the packed layout (byte offset
        # s*per) with a one-word-lookahead overlapping copy.  Total temp
        # is 4*ceil(per/4) <= 32768 words, so any regen <= 128 KiB fits.
        per = (regen + 3) >> 2
        n3 = jnp.maximum(regen - 3 * per, 0)
        per_w = (per + 3) >> 2
        sb0 = meta_ref[0, 0, 8] * 8
        sb1 = meta_ref[0, 0, 9] * 8
        sb2 = meta_ref[0, 0, 10] * 8
        sb3 = meta_ref[0, 0, 11] * 8

        def lane(t, pos, n_out, sbase8, wbase):
            syms = []
            for k in range(4):
                active = 4 * t + k < n_out
                v = read_at(lp_ref, LPW, sbase8, pos - _HUF_PEEK,
                            jnp.int32(_HUF_PEEK))
                ent = jnp.where(active, dtab_ref[0, 0, v], 0)
                pos = pos - (ent >> 8)
                syms.append(ent & 255)
            lit_store(wbase + t, syms[0] | (syms[1] << 8) |
                      (syms[2] << 16) | (syms[3] << 24))
            return pos

        def body(t, st):
            p0, p1, p2, p3 = st
            p0 = lane(t, p0, per, sb0, 0)
            p1 = lane(t, p1, per, sb1, per_w)
            p2 = lane(t, p2, per, sb2, 2 * per_w)
            p3 = lane(t, p3, n3, sb3, 3 * per_w)
            return p0, p1, p2, p3

        st = jax.lax.fori_loop(
            0, per_w, body,
            (meta_ref[0, 0, 4], meta_ref[0, 0, 5], meta_ref[0, 0, 6],
             meta_ref[0, 0, 7]))
        # exact consumption per stream (ADVICE r2: pos == 0, not >= 0)
        ok = jnp.where((st[0] == 0) & (st[1] == 0) &
                       (st[2] == 0) & (st[3] == 0), 1, 0)

        # compact: shift streams 1..3 from word-aligned temp starts
        # (byte 4*s*per_w) down to the packed layout (byte s*per)
        @pl.when((per & 3) != 0)
        def _():
            for s in (1, 2, 3):
                dstb = s * per
                srcb = 4 * s * per_w
                n = per if s < 3 else n3
                # head: bytes until dst is word-aligned (reads stay >= 1
                # byte ahead of writes; byte-forward copy is safe)
                head = jnp.minimum(n, (-dstb) & 3)

                def hb(k, _):
                    lit_write(dstb + k, lit_byte(srcb + k))
                    return 0

                jax.lax.fori_loop(0, head, hb, 0)
                nw = (n - head) >> 2
                dw0 = (dstb + head) >> 2

                def wb(w, cur):
                    nxt = lit_w32(srcb + head + 4 * (w + 1))
                    lit_store(dw0 + w, cur.astype(jnp.int32))
                    return nxt

                cur0 = lit_w32(srcb + head)
                jax.lax.fori_loop(0, nw, wb, cur0)
                done = head + 4 * nw

                def tb(k, _):
                    lit_write(dstb + done + k, lit_byte(srcb + done + k))
                    return 0

                jax.lax.fori_loop(0, n - done, tb, 0)

        @pl.when(ok == 0)
        def _():
            stat_ref[0, 0, 1] = 0

    # ---------------- sequences + execution ----------------
    def lit_copy(op, lp, ll):
        head = jnp.minimum(ll, (-op) & 3)

        def lh(k, _):
            ring_write(op + k, lit_byte(lp + k))
            return 0

        jax.lax.fori_loop(0, head, lh, 0)
        nw = (ll - head) >> 2
        dw0 = (op + head) >> 2

        def lw(k, _):
            ring_ref[(dw0 + k) & M] = lit_w32(lp + head + 4 * k).astype(
                jnp.int32)
            return 0

        jax.lax.fori_loop(0, nw, lw, 0)
        done = head + 4 * nw

        def lt(k, _):
            ring_write(op + done + k, lit_byte(lp + done + k))
            return 0

        jax.lax.fori_loop(0, ll - done, lt, 0)

    def match_copy(ms, off, ml):
        safe = off >= 4
        mhead = jnp.where(safe, jnp.minimum(ml, (-ms) & 3), ml)

        def mb(k, _):
            ring_write(ms + k, ring_read(ms + k - off))
            return 0

        jax.lax.fori_loop(0, mhead, mb, 0)
        mw = jnp.where(safe, (ml - mhead) >> 2, 0)
        mw0 = (ms + mhead) >> 2

        def mwf(k, _):
            ring_ref[(mw0 + k) & M] = ring_w32(
                ms + mhead + 4 * k - off).astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, mw, mwf, 0)
        mdone = mhead + 4 * mw

        def mt(k, _):
            ring_write(ms + mdone + k, ring_read(ms + mdone + k - off))
            return 0

        jax.lax.fori_loop(0, ml - mdone, mt, 0)

    def with_seqs():
        sbits = meta_ref[0, 0, 12]
        tl_ll = tlp & 255
        tl_of = (tlp >> 8) & 255
        tl_ml = (tlp >> 16) & 255
        z = jnp.int32(0)

        # init states: LL, OF, ML each table_log bits from the top
        pos = sbits
        s_ll = read_at(sq_ref, SQW, z, pos - tl_ll, tl_ll)
        pos = pos - tl_ll
        s_of = read_at(sq_ref, SQW, z, pos - tl_of, tl_of)
        pos = pos - tl_of
        s_ml = read_at(sq_ref, SQW, z, pos - tl_ml, tl_ml)
        pos = pos - tl_ml

        def seq_body(state):
            t, pos, s_ll, s_of, s_ml, r1, r2, r3, op, lp, okf = state
            e_ll = ftab_ref[0, 0, s_ll]
            e_of = ftab_ref[0, 0, 512 + s_of]
            e_ml = ftab_ref[0, 0, 1024 + s_ml]
            llc, ofc, mlc = e_ll & 255, e_of & 255, e_ml & 255
            of_extra = read_wide(sq_ref, SQW, z, pos - ofc, ofc)
            pos = pos - ofc
            ofv = (jnp.int32(1) << jnp.minimum(ofc, 30)) + of_extra
            mlb = ctab_ref[0, 0, O["ml_bits"] +
                           jnp.clip(mlc, 0, zf.MAX_ML_CODE)]
            ml = ctab_ref[0, 0, O["ml_base"] +
                          jnp.clip(mlc, 0, zf.MAX_ML_CODE)] + \
                read_at(sq_ref, SQW, z, pos - mlb, mlb)
            pos = pos - mlb
            llb = ctab_ref[0, 0, O["ll_bits"] +
                           jnp.clip(llc, 0, zf.MAX_LL_CODE)]
            ll = ctab_ref[0, 0, O["ll_base"] +
                          jnp.clip(llc, 0, zf.MAX_LL_CODE)] + \
                read_at(sq_ref, SQW, z, pos - llb, llb)
            pos = pos - llb
            # repcode resolution
            idx = ofv + jnp.where(ll == 0, 1, 0)
            off = jnp.where(ofv > 3, ofv - 3,
                            jnp.where(idx == 1, r1,
                                      jnp.where(idx == 2, r2,
                                                jnp.where(idx == 3, r3,
                                                          r1 - 1))))
            n_r3 = jnp.where(ofv > 3, r2,
                             jnp.where(idx == 1, r3,
                                       jnp.where(idx == 2, r3, r2)))
            n_r2 = jnp.where(ofv > 3, r1, jnp.where(idx == 1, r2, r1))
            r1, r2, r3 = off, n_r2, n_r3
            # transcode: any in-frame offset the 28-bit token field holds
            lim = jnp.where(tc, jnp.minimum(op + ll, 0x0FFFFFFF),
                            jnp.minimum(op + ll, MAX_OFFSET))
            okf = okf & jnp.where((off >= 1) & (off <= lim), 1, 0)
            # state updates (skipped for the last sequence): LL, ML, OF
            upd = t < n_seq - 1
            nb_ll = (e_ll >> 8) & 255
            s_ll_n = (e_ll >> 16) + read_at(sq_ref, SQW, z,
                                            pos - nb_ll, nb_ll)
            pos = jnp.where(upd, pos - nb_ll, pos)
            nb_ml = (e_ml >> 8) & 255
            s_ml_n = (e_ml >> 16) + read_at(sq_ref, SQW, z,
                                            pos - nb_ml, nb_ml)
            pos = jnp.where(upd, pos - nb_ml, pos)
            nb_of = (e_of >> 8) & 255
            s_of_n = (e_of >> 16) + read_at(sq_ref, SQW, z,
                                            pos - nb_of, nb_of)
            pos = jnp.where(upd, pos - nb_of, pos)
            s_ll = jnp.where(upd, s_ll_n, s_ll)
            s_ml = jnp.where(upd, s_ml_n, s_ml)
            s_of = jnp.where(upd, s_of_n, s_of)
            # transcode: emit one packed 2-word token after the literal
            # words; execution happens on the host (zn_zir_execute)
            @pl.when(tc)
            def _():
                # tokens follow the literal words (at word 0 when the
                # literals never entered the device)
                lw = jnp.where((mode & DMODE_LIT_HOST) != 0, 0,
                               (regen + 3) >> 2)
                tw = lw + 2 * t
                out_ref[0, 0, tw] = ll | ((ml & 0x3FFF) << 18)
                out_ref[0, 0, tw + 1] = off | ((ml >> 14) << 28)

            # execute (clamped on corruption so addressing stays in range;
            # okf reports the failure); zero-length in transcode mode
            offc = jnp.clip(off, 1, MAX_OFFSET)
            ll_x = jnp.where(tc, 0, ll)
            ml_x = jnp.where(tc, 0, ml)
            lit_copy(op, lp, ll_x)
            match_copy(op + ll_x, offc, ml_x)
            return (t + 1, pos, s_ll, s_of, s_ml, r1, r2, r3,
                    op + ll + ml, lp + ll, okf)

        st0 = (jnp.int32(0), pos, s_ll, s_of, s_ml,
               rep_ref[0], rep_ref[1], rep_ref[2],
               base, jnp.int32(0), jnp.int32(1))
        st = jax.lax.while_loop(lambda s: s[0] < n_seq, seq_body, st0)
        (_, pos, _, _, _, r1, r2, r3, op, lp, okf) = st
        rep_ref[0] = r1
        rep_ref[1] = r2
        rep_ref[2] = r3

        # exact consumption (ADVICE r2): a corrupt stream that happens to
        # produce the right advance with leftover bits must fail, matching
        # libzstd's end-of-stream check
        @pl.when((okf == 0) | (pos != 0))
        def _():
            stat_ref[0, 0, 1] = 0

        return op, lp

    def no_seqs():
        return base, jnp.int32(0)

    op, lp = jax.lax.cond(((mode & DMODE_SEQ) != 0) & (n_seq > 0),
                          with_seqs, no_seqs)

    # trailing literals (already in place in transcode mode)
    trail = jnp.maximum(regen - lp, 0)
    lit_copy(op, lp, jnp.where(tc, 0, trail))
    op = op + trail
    stat_ref[0, 0, 0] = op - base

    # stream the block's bytes out of the ring (blocks start word-aligned);
    # transcode keeps the out window as [literal words][token words].
    # The loop bound clamps to the window: a corrupt frame can inflate
    # the decoded advance past 128 KiB (the stat check still fails it),
    # and an unclamped dynamic SMEM store would go out of bounds
    def out_copy(w, _):
        out_ref[0, 0, w] = ring_ref[((base >> 2) + w) & M]
        return 0

    jax.lax.fori_loop(0, jnp.where(tc, 0,
                                   jnp.minimum((op - base + 3) >> 2, LW)),
                      out_copy, 0)


@partial(jax.jit, static_argnames=("interpret",))
def decode_blocks_smem(lp_words: jnp.ndarray, sq_words: jnp.ndarray,
                       dtabs: jnp.ndarray, ftabs: jnp.ndarray,
                       meta: jnp.ndarray, interpret: bool = False):
    """Decode a batch of zstd blocks in one fused SMEM pass.

    lp_words: (B, LPW) int32 literal payload words (compressed streams for
    HUF modes, the literal bytes for DIRECT); sq_words: (B, SQW) int32
    sequence stream words; dtabs: (B, 4096) int32 per-block padded Huffman
    dtable (zstd_decode._HufReg packing); ftabs: (B, 1536) int32 the three
    512-entry FSE tables (LL | OF | ML, fse packing sym|nb<<8|base<<16);
    meta: (B, 16) int32 (see module docstring).

    Blocks must be frame-major ordered with word-aligned base offsets.
    Returns (out (B, 32768) int32 words, stat (B, 4) int32
    [advance, ok, -, -])."""
    B, LPW = lp_words.shape
    SQW = sq_words.shape[1]

    def smem(shape, const=False):
        if const:
            return pl.BlockSpec(memory_space=pltpu.SMEM,
                                block_shape=(1,) + shape[1:],
                                index_map=lambda b: (0,) * len(shape))
        return pl.BlockSpec(memory_space=pltpu.SMEM,
                            block_shape=(1,) + shape[1:],
                            index_map=lambda b: (b,) + (0,) *
                            (len(shape) - 1))

    ctab = jnp.asarray(_CTAB)[None, None, :]
    out, stat = pl.pallas_call(
        _decode_kernel,
        grid=(B,),
        in_specs=[smem((B, 1, LPW)), smem((B, 1, SQW)),
                  smem((B, 1, 1 << _HUF_PEEK)), smem((B, 1, 1536)),
                  smem((B, 1, META_W)),
                  smem((1, 1, _CTAB.shape[0]), const=True)],
        out_specs=[smem((B, 1, 1 << 15)), smem((B, 1, 4))],
        out_shape=[jax.ShapeDtypeStruct((B, 1, 1 << 15), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1, 4), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((_RING_WORDS,), jnp.int32),
                        pltpu.SMEM((4,), jnp.int32)],
        interpret=interpret,
    )(lp_words.reshape(B, 1, LPW), sq_words.reshape(B, 1, SQW),
      dtabs.reshape(B, 1, 1 << _HUF_PEEK), ftabs.reshape(B, 1, 1536),
      meta.reshape(B, 1, META_W), ctab)
    return out[:, 0], stat[:, 0]
