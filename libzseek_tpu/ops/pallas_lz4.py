"""Fused LZ4 block encode — hash-probe parse + inline emission in SMEM.

LZ4 has no entropy stage, so the whole block encode is one sequential
scalar pass: the probe loop emits each sequence's token/extension bytes,
literal run (word-at-a-time copy) and 2-byte offset straight into an SMEM
output buffer the moment a match is found.

This kernel carries the same cycle-diet treatment as the zstd parse
(ops/pallas_match.py):

  * ONE wide SMEM input stream per grid step (prev block || cur block,
    concatenated on device) — two shifted SMEM streams measured ~15x
    slower per grid step;
  * a TAGGED hash table: entries pack {tag:7, pos:24} so tag-equality,
    in-window, dist >= 1 and empty-slot rejections fuse into one integer
    range check;
  * a QUAD-PROBE miss loop: two aligned word loads yield four unaligned
    probe words per iteration with compile-time shifts.

The hash table persists across grid steps with absolute stream positions
(liblz4's LZ4_compress_fast_continue behavior).  Greedy walk and end
rules match liblz4 (probe stop at blen-12, matches end before the last
5 literals); output is golden-verified against stock liblz4.  Reference
counterpart: LZ4F_compressFrame's LZ4_compress_default core
(/root/reference/src/compress.c:737-786).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PRIME = np.uint32(2654435761)


def _lz4_kernel(win_ref, len_ref, out_ref, olen_ref, table_ref, *,
                hash_log: int, block_bytes: int, max_offset: int,
                lazy: int = 0, accel_log: int = 6):
    # window coords: [0, block_bytes) = previous block (context),
    # [block_bytes, blen) = this block; absolute position = base + p
    WW = win_ref.shape[2]
    tab_size = 1 << hash_log
    shift = np.uint32(32 - hash_log)
    TAGB_SH = hash_log - 1
    TAG_MASK = 0x7F << 24

    b = pl.program_id(0)
    base = b * block_bytes

    @pl.when(b == 0)
    def _():
        def zb(i, _):
            table_ref[i] = -1
            return 0

        jax.lax.fori_loop(0, tab_size, zb, 0)

    blen = len_ref[0, 0, 0]
    min_ref = len_ref[0, 0, 1]
    limit = blen - 12
    lit_limit = blen - 5    # matches may not cover the last 5 bytes

    def U(v):
        return v.astype(jnp.uint32)

    def word(q):
        return win_ref[0, 0, jnp.clip(q, 0, WW - 1)]

    def byte(i):
        return (word(i >> 2) >> ((i & 3) * 8)) & 0xFF

    def w32(i):
        q = i >> 2
        sh = ((i & 3) * 8).astype(jnp.uint32)
        lo = U(word(q))
        hi = U(word(q + 1))
        v = (lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
        return v.astype(jnp.int32)

    # unclamped fast path (callers stay in window bounds)
    def byte_c(i):
        return (win_ref[0, 0, i >> 2] >> ((i & 3) * 8)) & 0xFF

    def w32_c(i):
        q = i >> 2
        sh = ((i & 3) * 8).astype(jnp.uint32)
        lo = U(win_ref[0, 0, q])
        hi = U(win_ref[0, 0, jnp.minimum(q + 1, WW - 1)])
        v = (lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
        return v.astype(jnp.int32)

    def h_tagb(u):
        h = (u >> shift).astype(jnp.int32)
        tagb = ((u << TAGB_SH).astype(jnp.int32)) & TAG_MASK
        return h, tagb

    def probe_sig(ip):
        # unclamped loads: probes stay >= 12 bytes from block end
        q = ip >> 2
        sh = ((ip & 3) * 8).astype(jnp.uint32)
        lo = U(win_ref[0, 0, q])
        hi = U(win_ref[0, 0, q + 1])
        w = ((lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0),
            hi << (jnp.uint32(32) - sh))).astype(jnp.int32)
        h, tagb = h_tagb(U(w) * PRIME)
        return h, tagb, w

    def insert_at(p):
        h, tagb = h_tagb(U(w32_c(p)) * PRIME)
        table_ref[h] = (base + p) | tagb

    def out_write(p, v):
        w = p >> 2
        sh = (p & 3) * 8
        old = out_ref[0, 0, w]
        out_ref[0, 0, w] = (old & ~(0xFF << sh)) | ((v & 0xFF) << sh)

    def out_write_w(w, v):
        out_ref[0, 0, w] = v

    def extend(ip, cand):
        def wcond(l):
            return (ip + l + 4 <= lit_limit) & \
                (w32_c(ip + l) == w32(cand + l))

        l = jax.lax.while_loop(wcond, lambda l: l + 4, jnp.int32(4))
        for _ in range(3):
            ok = (ip + l < lit_limit) & (byte_c(ip + l) == byte(cand + l))
            l = l + ok
        return l

    def emit_len_ext(op, v):
        # LZ4 length extension: (v // 255) bytes of 255 then v % 255
        def body(state):
            op2, v2 = state
            out_write(op2, jnp.int32(255))
            return op2 + 1, v2 - 255

        op, v = jax.lax.while_loop(lambda st: st[1] >= 255, body, (op, v))
        out_write(op, v)
        return op + 1

    def copy_lits(op, src, n):
        # word-at-a-time copy from input to output (dst-aligned)
        head = jnp.minimum(n, (-op) & 3)

        def hb(k, _):
            out_write(op + k, byte_c(src + k))
            return 0

        jax.lax.fori_loop(0, head, hb, 0)
        nw = (n - head) >> 2
        dw0 = (op + head) >> 2

        def wb(k, _):
            out_write_w(dw0 + k, w32_c(src + head + 4 * k))
            return 0

        jax.lax.fori_loop(0, nw, wb, 0)
        done = head + 4 * nw

        def tb(k, _):
            out_write(op + done + k, byte_c(src + done + k))
            return 0

        jax.lax.fori_loop(0, n - done, tb, 0)
        return op + n

    def emit_seq(op, anchor, ip, mlen, dist):
        litlen = ip - anchor
        tok_pos = op
        op = op + 1
        op = jax.lax.cond(litlen >= 15,
                          lambda o: emit_len_ext(o, litlen - 15),
                          lambda o: o, op)
        op = copy_lits(op, anchor, litlen)
        mtok = jnp.minimum(mlen - 4, 15)
        out_write(tok_pos, (jnp.minimum(litlen, 15) << 4) | mtok)
        out_write(op, dist & 0xFF)
        out_write(op + 1, dist >> 8)
        op = op + 2
        op = jax.lax.cond(mlen - 4 >= 15,
                          lambda o: emit_len_ext(o, mlen - 4 - 15),
                          lambda o: o, op)
        return op

    def do_match_at(ip, anchor, op, miss, cand_abs, w):
        """Confirm the candidate's bytes (tag collisions), then extend
        (lazily at HC levels), emit; unconfirmed candidates take the miss
        transition."""
        cand = cand_abs - base
        conf = w32(cand) == w

        def hit(_):
            l = extend(ip, cand)
            ipf, candf, lf = ip, cand, l
            # HC levels (compression_level >= 3 maps to LZ4HC in the
            # reference, /root/reference/src/compress.c:186-207): probe
            # ip+1(/+2) for a strictly longer match before committing
            for _lz in range(lazy):
                def try_next(args):
                    ipf, candf, lf = args
                    h2, tagb2, w2 = probe_sig(ipf + 1)
                    e2 = table_ref[h2]
                    pos2 = base + ipf + 1
                    wlo2 = jnp.maximum(min_ref, pos2 - max_offset)
                    good2 = (e2 >= tagb2 + wlo2) & (e2 < tagb2 + pos2)
                    table_ref[h2] = pos2 | tagb2
                    c2 = (e2 & 0xFFFFFF) - base

                    def probe2(_):
                        conf2 = w32(c2) == w2
                        l2 = jax.lax.cond(
                            conf2, lambda _: extend(ipf + 1, c2),
                            lambda _: jnp.int32(0), None)
                        better = conf2 & (l2 > lf)
                        return (jnp.where(better, ipf + 1, ipf),
                                jnp.where(better, c2, candf),
                                jnp.where(better, l2, lf))

                    return jax.lax.cond(good2, probe2,
                                        lambda _: (ipf, candf, lf), None)

                ipf, candf, lf = jax.lax.cond(
                    ipf + 1 < limit, try_next, lambda a: a,
                    (ipf, candf, lf))
            op2 = emit_seq(op, anchor, ipf, lf, ipf - candf)
            # keep the table warm at the match tail (liblz4 stores ip-2
            # after a match); clamped insert, may sit near block end
            insert_at(ipf + lf - 2)
            return ipf + lf, ipf + lf, op2, jnp.int32(0)

        def do_miss(_):
            return ip + 1 + (miss >> accel_log), anchor, op, miss + 1

        return jax.lax.cond(conf, hit, do_miss, None)

    def body1(state):
        ip, anchor, op, miss = state
        h, tagb, w = probe_sig(ip)
        entry = table_ref[h]
        pos = base + ip
        wlo = jnp.maximum(min_ref, pos - max_offset)
        good = (entry >= tagb + wlo) & (entry < tagb + pos)
        table_ref[h] = pos | tagb

        def hit(_):
            return do_match_at(ip, anchor, op, miss, entry & 0xFFFFFF, w)

        def do_miss(_):
            return ip + 1 + (miss >> accel_log), anchor, op, miss + 1

        return jax.lax.cond(good, hit, do_miss, None)

    # --- quad miss loop: probe four word-aligned positions per iteration
    # from two aligned loads; hits exit to the shared match arm ---

    def qcond(s):
        q, fnd = s[0], s[1]
        return (fnd == 0) & (4 * q <= blen - 16)

    def qbody(s):
        q, fnd, e0, e1, e2, e3, miss, qp = s
        w0 = U(win_ref[0, 0, q])
        w1 = U(win_ref[0, 0, q + 1])
        pos0 = base + 4 * q
        # one window bound for all four positions (conservative by 3
        # bytes at the far edge, so emitted dists stay <= max_offset)
        wlo = jnp.maximum(min_ref, pos0 - (max_offset - 3))
        es = []
        for k in range(4):
            wk = w0 if k == 0 else \
                ((w0 >> (8 * k)) | (w1 << (32 - 8 * k)))
            u = wk * PRIME
            h = (u >> shift).astype(jnp.int32)
            tagb = ((u << TAGB_SH).astype(jnp.int32)) & TAG_MASK
            entry = table_ref[h]
            pos_k = pos0 + k
            good = (entry >= tagb + wlo) & (entry < tagb + pos_k)
            table_ref[h] = pos_k | tagb
            fnd = fnd | (good.astype(jnp.int32) << k)
            es.append(entry)
        return (q + 1 + (miss >> (accel_log + 2)), fnd, es[0], es[1],
                es[2], es[3], miss + 4, q)

    def outer(state):
        # realign: single-step while ip is not word-aligned
        st = jax.lax.while_loop(
            lambda s: (s[0] < limit) & ((s[0] & 3) != 0), body1, state)
        ip, anchor, op, miss = st
        q0 = ip >> 2
        z = jnp.int32(0)
        qs = jax.lax.while_loop(
            qcond, qbody, (q0, z, z, z, z, z, miss, q0))
        q, fnd, e0, e1, e2, e3, missq, qp = qs

        def with_hit(_):
            k = jnp.where(
                (fnd & 1) != 0, jnp.int32(0), jnp.where(
                    (fnd & 2) != 0, jnp.int32(1), jnp.where(
                        (fnd & 4) != 0, jnp.int32(2), jnp.int32(3))))
            entry = jnp.where(
                (fnd & 1) != 0, e0, jnp.where(
                    (fnd & 2) != 0, e1, jnp.where(
                        (fnd & 4) != 0, e2, e3)))
            iph = 4 * qp + k
            wv = w32_c(iph)
            return do_match_at(iph, anchor, op, missq,
                               entry & 0xFFFFFF, wv)

        def no_hit(_):
            # tail (< 16 bytes to the limit): single-step to the end
            st2 = (4 * q, anchor, op, missq)
            return jax.lax.while_loop(lambda s: s[0] < limit, body1, st2)

        return jax.lax.cond(fnd != 0, with_hit, no_hit, None)

    # seed the batch's context row once (liblz4 dictionary loading); later
    # steps inherit the table (absolute positions) from their predecessors
    @pl.when(b == 0)
    def _():
        def seed(p, _):
            insert_at(p)
            return 0

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(block_bytes - 3), seed, 0)

    ip0 = jnp.int32(block_bytes)
    ip, anchor, op, miss = jax.lax.while_loop(
        lambda s: s[0] < limit, outer,
        (ip0, ip0, jnp.int32(0), jnp.int32(0)))
    # final literal run [anchor, blen)
    litlen = blen - anchor
    tok_pos = op
    op = op + 1
    op = jax.lax.cond(litlen >= 15,
                      lambda o: emit_len_ext(o, litlen - 15),
                      lambda o: o, op)
    out_write(tok_pos, jnp.minimum(litlen, 15) << 4)
    op = copy_lits(op, anchor, litlen)
    olen_ref[0, 0, 0] = op


@partial(jax.jit, static_argnames=("hash_log", "block_bytes", "max_offset",
                                   "out_cap", "lazy", "accel_log",
                                   "interpret"))
def lz4_emit_blocks_smem(blocks: jnp.ndarray, lengths: jnp.ndarray,
                         min_ref: jnp.ndarray, out_cap: int,
                         block_bytes: int = 1 << 16,
                         hash_log: int = 16,
                         max_offset: int = 65535,
                         lazy: int = 0, accel_log: int = 6,
                         interpret: bool = False):
    """Fused LZ4 block encode with shared linked-block context.

    blocks: (B+1, block_bytes) uint8 — row 0 is the context for row 1;
    row r is both block r and the context of block r+1.  lengths (B,)
    = context + block bytes per encoded row (i.e. block_bytes + size of
    block r); min_ref (B,) first referenceable ABSOLUTE byte position
    (block r's bytes occupy absolute [(r+1)*block_bytes, ...)).  Returns
    (out_words (B, out_cap//4) int32, out_len (B,) int32)."""
    B1, N = blocks.shape
    B = B1 - 1
    # table entries pack absolute positions into 24 bits (7-bit tag above)
    assert B1 * N <= (1 << 24), "batch too large for tagged-table positions"
    NW = N // 4
    OW = out_cap // 4
    assert N == block_bytes
    words = jax.lax.bitcast_convert_type(
        blocks.reshape(B1, NW, 4), jnp.int32)
    kernel = partial(_lz4_kernel, hash_log=hash_log, block_bytes=block_bytes,
                     max_offset=max_offset, lazy=lazy, accel_log=accel_log)

    def smem(shape):
        return pl.BlockSpec(memory_space=pltpu.SMEM,
                            block_shape=(1,) + shape[1:],
                            index_map=lambda b: (b,) + (0,) *
                            (len(shape) - 1))

    # ONE wide SMEM input stream (prev || cur), concatenated on device
    wide = jnp.concatenate([words[:-1], words[1:]], axis=1)
    out, olen = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[smem((B, 1, 2 * NW)), smem((B, 1, 2))],
        out_specs=[smem((B, 1, OW)), smem((B, 1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, OW), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1 << hash_log,), jnp.int32)],
        interpret=interpret,
    )(wide.reshape(B, 1, 2 * NW),
      jnp.stack([lengths.astype(jnp.int32), min_ref.astype(jnp.int32)],
                axis=1).reshape(B, 1, 2))
    return out[:, 0], olen[:, 0, 0]
