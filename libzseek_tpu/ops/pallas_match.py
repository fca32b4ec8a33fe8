"""Pallas scalar hash-probe LZ parser (prototype of the next-generation
match finder).

The production parse (ops/match.py) is exact but sort+gather bound: XLA
gathers run ~100M elem/s on TPU, capping the pipeline far below the
reference's CPU throughput.  This kernel instead runs zstd-fast's actual
algorithm — single-probe hash table, greedy emit, inline extension — as a
sequential SCALAR loop per block on the TPU core, with the hash table and
input resident in VMEM.  One grid step = 8 block rows (TPU tiling needs
sublane multiples of 8); rows run as an inner loop, grid steps sequence on
the core, so wall time ~ scalar-ops-per-block x blocks.

Inputs are precomputed 4-byte LE windows (int32), so the kernel never
assembles bytes.  Outputs are per-block sequence arrays compatible with
zstd_sequences' consumers (ll, ml, offv = offset+3, n_seq, cover_end);
literal extraction and entropy coding stay in the existing XLA pipeline.

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

HASH_LOG = 15
HASH_SIZE = 1 << HASH_LOG
_TAB_COLS = 4096          # hash table as (8, 4096) to satisfy VMEM tiling
PRIME = np.uint32(2654435761)
ROWS = 8                  # rows per grid step


def _parse_kernel(win_ref, len_ref, ll_ref, ml_ref, off_ref, n_ref,
                  table_ref, *, cap: int, max_offset: int):
    N = win_ref.shape[1]

    def hash_of(w):
        return ((w.astype(jnp.uint32) * PRIME) >>
                np.uint32(32 - HASH_LOG)).astype(jnp.int32)

    def row_body(r, _):
        table_ref[:] = jnp.full_like(table_ref[:], -1)
        blen = len_ref[r, 0]
        limit = blen - 12

        def extend(ip, cand):
            def cond(l):
                return (ip + l + 4 <= blen) & \
                    (win_ref[r, ip + l] == win_ref[r, cand + l])

            l = jax.lax.while_loop(cond, lambda l: l + 4, jnp.int32(4))
            ok_tail = ip + l + 4 <= blen
            d = win_ref[r, jnp.minimum(ip + l, N - 1)] ^ \
                win_ref[r, jnp.minimum(cand + l, N - 1)]
            b0 = (d & 0xFF) == 0
            b1 = (d & 0xFFFF) == 0
            b2 = (d & 0xFFFFFF) == 0
            partial_ = b0.astype(jnp.int32) + b1.astype(jnp.int32) + \
                b2.astype(jnp.int32)
            l = l + jnp.where(ok_tail, partial_, 0)
            return jnp.minimum(l, blen - ip)

        def body(state):
            ip, anchor, cnt, miss = state
            w = win_ref[r, ip]
            h = hash_of(w)
            hrow = h >> 12
            hcol = h & (_TAB_COLS - 1)
            base = pl.multiple_of((hcol >> 7) * 128, 128)
            lane = hcol & 127
            row = table_ref[hrow, pl.ds(base, 128)]
            sel = jax.lax.broadcasted_iota(jnp.int32, (128,), 0) == lane
            cand = jnp.sum(jnp.where(sel, row, 0))  # one-lane select
            table_ref[hrow, pl.ds(base, 128)] = jnp.where(sel, ip, row)
            good = (cand >= 0) & (ip - cand <= max_offset) & \
                (win_ref[r, jnp.maximum(cand, 0)] == w) & (cnt < cap)

            def do_match(_):
                l = extend(ip, cand)
                ebase = pl.multiple_of((cnt >> 7) * 128, 128)
                elane = cnt & 127
                esel = jax.lax.broadcasted_iota(jnp.int32, (128,), 0) == elane
                row_ll = ll_ref[r, pl.ds(ebase, 128)]
                ll_ref[r, pl.ds(ebase, 128)] = jnp.where(esel, ip - anchor,
                                                         row_ll)
                row_ml = ml_ref[r, pl.ds(ebase, 128)]
                ml_ref[r, pl.ds(ebase, 128)] = jnp.where(esel, l, row_ml)
                row_of = off_ref[r, pl.ds(ebase, 128)]
                off_ref[r, pl.ds(ebase, 128)] = jnp.where(esel,
                                                          ip - cand + 3,
                                                          row_of)
                return ip + l, ip + l, cnt + 1, jnp.int32(0)

            def do_miss(_):
                # zstd-fast acceleration: step grows with the miss run
                return ip + 1 + (miss >> 6), anchor, cnt, miss + 1

            return jax.lax.cond(good, do_match, do_miss, None)

        def cond(state):
            return state[0] < limit

        ip0 = jnp.int32(0)
        ip, anchor, cnt, miss = jax.lax.while_loop(
            cond, body, (ip0, ip0, jnp.int32(0), jnp.int32(0)))
        n_ref[r, 0] = cnt
        n_ref[r, 1] = anchor  # cover end (tail literals start here)
        return 0

    jax.lax.fori_loop(0, ROWS, row_body, 0)


@partial(jax.jit, static_argnames=("cap", "max_offset", "interpret"))
def hash_parse_blocks(win32: jnp.ndarray, lengths: jnp.ndarray,
                      cap: int | None = None,
                      max_offset: int = (1 << 17) - 1,
                      interpret: bool = False):
    """win32: (B, N) int32 LE 4-byte windows (B a multiple of 8);
    lengths: (B,).  Returns (ll, ml, offv, n_seq, cover_end)."""
    B, N = win32.shape
    assert B % ROWS == 0, "row count must be a multiple of 8"
    if cap is None:
        cap = max(128, N // 8)
    kernel = partial(_parse_kernel, cap=cap, max_offset=max_offset)
    ll, ml, off, nn = pl.pallas_call(
        kernel,
        grid=(B // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, N), lambda b: (b, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM, block_shape=(ROWS, 1),
                         index_map=lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, cap), lambda b: (b, 0)),
            pl.BlockSpec((ROWS, cap), lambda b: (b, 0)),
            pl.BlockSpec((ROWS, cap), lambda b: (b, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM, block_shape=(ROWS, 2),
                         index_map=lambda b: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 2), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((ROWS, _TAB_COLS), jnp.int32)],
        interpret=interpret,
    )(win32, lengths.reshape(B, 1))
    return ll, ml, off, nn[:, 0], nn[:, 1]


# ---------------------------------------------------------------------------
# v2: SMEM-resident parser (production path)
#
# Mosaic rejects dynamic per-element VMEM access, but SMEM supports scalar
# load/store — measured: 1 MiB capacity, ~12 ns per probe-loop iteration.
# The whole zstd-fast loop (input bytes, hash table, emission buffers)
# lives in SMEM; pallas streams the input block HBM->SMEM per grid step
# (double-buffered, hence the raw-byte input: 128 KiB x2 fits, the int32
# window plane would not) and the emission buffers stream back out.
# ---------------------------------------------------------------------------

def _parse_kernel_smem(w_ref, len_ref, ll_ref, ml_ref, off_ref, n_ref,
                       table_ref, *, cap: int, max_offset: int,
                       hash_log: int):
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
    limit = blen - 12

    def word(q):
        return w_ref[0, 0, jnp.clip(q, 0, NW - 1)]

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

    def extend(ip, cand):
        def cond(l):
            return (ip + l < blen) & (byte(ip + l) == byte(cand + l))

        return jax.lax.while_loop(cond, lambda l: l + 1, jnp.int32(4))

    def body(state):
        ip, anchor, cnt, miss = state
        w = w32(ip)
        h = ((w.astype(jnp.uint32) * PRIME) >> shift).astype(jnp.int32)
        cand = table_ref[h]
        table_ref[h] = ip
        good = (cand >= 0) & (ip - cand <= max_offset) & (cnt < cap)
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

    ip0 = jnp.int32(0)
    ip, anchor, cnt, miss = jax.lax.while_loop(
        lambda s: s[0] < limit, body, (ip0, ip0, jnp.int32(0), jnp.int32(0)))
    n_ref[0, 0, 0] = cnt
    n_ref[0, 0, 1] = anchor


@partial(jax.jit, static_argnames=("cap", "max_offset", "hash_log",
                                   "interpret"))
def hash_parse_blocks_smem(x: jnp.ndarray, lengths: jnp.ndarray,
                           cap: int | None = None,
                           max_offset: int = (1 << 17) - 1,
                           hash_log: int = 16,
                           interpret: bool = False):
    """SMEM-resident hash-probe parse.  x: (B, N) uint8 raw block bytes
    (N a multiple of 4); lengths (B,).  Returns (ll, ml, offv, n_seq,
    cover_end) with the same meaning as hash_parse_blocks."""
    B, N = x.shape
    words = jax.lax.bitcast_convert_type(
        x.reshape(B, N // 4, 4), jnp.int32)
    if cap is None:
        cap = max(128, N // 8)
    kernel = partial(_parse_kernel_smem, cap=cap, max_offset=max_offset,
                     hash_log=hash_log)

    def smem(shape):
        return pl.BlockSpec(memory_space=pltpu.SMEM,
                            block_shape=(1,) + shape[1:],
                            index_map=lambda b: (b,) + (0,) *
                            (len(shape) - 1))

    ll, ml, off, nn = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[smem((B, 1, N // 4)), smem((B, 1, 1))],
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
      lengths.reshape(B, 1, 1).astype(jnp.int32))
    return (ll[:, 0], ml[:, 0], off[:, 0], nn[:, 0, 0], nn[:, 0, 1])
