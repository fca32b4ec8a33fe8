"""Fused LZ4 block encode — hash-probe parse + inline emission in SMEM.

LZ4 has no entropy stage, so the whole block encode is one sequential
scalar pass: the zstd-fast-style probe loop (ops/pallas_match.py) emits
each sequence's token/extension bytes, literal run (word-at-a-time copy)
and 2-byte offset straight into an SMEM output buffer the moment a match
is found.  This replaces hash_parse_blocks_smem + the XLA packing stage
(_pack_lz4's scatter passes) for the TPU path.

Linked-block context is NOT duplicated into each row: the data array holds
one 64 KiB block per row (plus one leading context row per batch) and each
grid step maps the same array twice — its own row and the preceding row —
so the upload volume equals the input size instead of 2x.

The hash table persists across grid steps with absolute stream
positions (liblz4's LZ4_compress_fast_continue behavior) — context is
never re-seeded per block, which would cost as much as the parse itself.
Greedy walk and end rules match the two-stage path (probe stop at
blen-12, matches end before the last 5 literals); output is golden-
verified against stock liblz4.  Reference counterpart:
LZ4F_compressFrame's LZ4_compress_default core
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


def _lz4_kernel(prev_ref, cur_ref, len_ref, out_ref, olen_ref, table_ref, *,
                hash_log: int, start_ip: int, max_offset: int):
    # logical window: bytes [0, CW*4) = previous block (context), bytes
    # [CW*4, CW*4 + NW*4) = this block
    CW = prev_ref.shape[2]
    NW = cur_ref.shape[2]
    tab_size = 1 << hash_log
    shift = np.uint32(32 - hash_log)

    b = pl.program_id(0)
    base = b * (4 * CW)          # absolute position of the window start

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

    def word(q):
        # dual-ref read: context (prev row) below CW, this block above
        inprev = q < CW
        pw = prev_ref[0, 0, jnp.minimum(q, CW - 1)]
        cw = cur_ref[0, 0, jnp.clip(q - CW, 0, NW - 1)]
        return jnp.where(inprev, pw, cw)

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

    # fast single-ref variants for positions known to be >= CW*4 (the
    # probe pointer, forward extension and literal sources never reach
    # back into the context row)
    def byte_c(i):
        j = i - 4 * CW
        return (cur_ref[0, 0, j >> 2] >> ((j & 3) * 8)) & 0xFF

    def w32_c(i):
        j = i - 4 * CW
        q = j >> 2
        sh = ((j & 3) * 8).astype(jnp.uint32)
        lo = cur_ref[0, 0, q].astype(jnp.uint32)
        hi = cur_ref[0, 0, jnp.minimum(q + 1, NW - 1)].astype(jnp.uint32)
        v = (lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
        return v.astype(jnp.int32)

    def out_write(p, b):
        w = p >> 2
        sh = (p & 3) * 8
        old = out_ref[0, 0, w]
        out_ref[0, 0, w] = (old & ~(0xFF << sh)) | ((b & 0xFF) << sh)

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

    def body(state):
        ip, anchor, op, miss = state
        w = w32_c(ip)
        h = ((w.astype(jnp.uint32) * PRIME) >> shift).astype(jnp.int32)
        cand_abs = table_ref[h]
        table_ref[h] = base + ip
        cand = cand_abs - base   # local window position (may be negative)
        good = (cand_abs >= min_ref) & (base + ip - cand_abs <= max_offset)
        good = good & (w32(jnp.clip(cand, 0, 8 * CW)) == w)

        def do_match(_):
            l = extend(ip, cand)
            op2 = emit_seq(op, anchor, ip, l, ip - cand)
            return ip + l, ip + l, op2, jnp.int32(0)

        def do_miss(_):
            return ip + 1 + (miss >> 6), anchor, op, miss + 1

        return jax.lax.cond(good, do_match, do_miss, None)

    if start_ip > 0:
        # seed the batch's context row once; later steps inherit the
        # table (absolute positions) from their predecessors
        @pl.when(b == 0)
        def _():
            def seed(p, _):
                w = w32(p)
                h = ((w.astype(jnp.uint32) * PRIME)
                     >> shift).astype(jnp.int32)
                table_ref[h] = p
                return 0

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(start_ip - 3),
                              seed, 0)
    ip0 = jnp.int32(start_ip)
    ip, anchor, op, miss = jax.lax.while_loop(
        lambda s: s[0] < limit, body,
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
                                   "out_cap", "interpret"))
def lz4_emit_blocks_smem(blocks: jnp.ndarray, lengths: jnp.ndarray,
                         min_ref: jnp.ndarray, out_cap: int,
                         block_bytes: int = 1 << 16,
                         hash_log: int = 16,
                         max_offset: int = 65535,
                         interpret: bool = False):
    """Fused LZ4 block encode with shared linked-block context.

    blocks: (B+1, block_bytes) uint8 — row 0 is the context for row 1;
    row r is both block r and the context of block r+1.  lengths (B,)
    = context + block bytes per encoded row (i.e. block_bytes + size of
    block r); min_ref (B,) first referenceable byte in the logical
    [context | block] window.  Returns (out_words (B, out_cap//4) int32,
    out_len (B,) int32)."""
    B1, N = blocks.shape
    B = B1 - 1
    NW = N // 4
    OW = out_cap // 4
    assert N == block_bytes
    words = jax.lax.bitcast_convert_type(
        blocks.reshape(B1, NW, 4), jnp.int32)
    kernel = partial(_lz4_kernel, hash_log=hash_log, start_ip=block_bytes,
                     max_offset=max_offset)

    def smem(shape, shift=0):
        return pl.BlockSpec(memory_space=pltpu.SMEM,
                            block_shape=(1,) + shape[1:],
                            index_map=lambda b: (b + shift,) + (0,) *
                            (len(shape) - 1))

    out, olen = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[smem((B1, 1, NW)), smem((B1, 1, NW), shift=1),
                  smem((B, 1, 2))],
        out_specs=[smem((B, 1, OW)), smem((B, 1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, OW), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1 << hash_log,), jnp.int32)],
        interpret=interpret,
    )(words.reshape(B1, 1, NW), words.reshape(B1, 1, NW),
      jnp.stack([lengths.astype(jnp.int32), min_ref.astype(jnp.int32)],
                axis=1).reshape(B, 1, 2))
    return out[:, 0], olen[:, 0, 0]
