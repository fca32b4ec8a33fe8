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
            return (ip + l < blen - end_margin) & \
                (byte(ip + l) == byte(cand + l))

        return jax.lax.while_loop(cond, lambda l: l + 1, jnp.int32(4))

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
