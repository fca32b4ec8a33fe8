"""LZ4 block decoder as a batched TPU program.

Two phases, mirroring how a decoder must treat the format's two kinds of
state (reference scalar equivalent: liblz4 inside zseek_pread_lz4,
/root/reference/src/decompress.c:576-683):

  A. **Sequence parse** — the token stream is inherently sequential *per
     block*, so we run one jax.lax.while_loop whose state is vectorized over
     the batch of blocks (lanes).  Extension-byte runs (0xFF chains) are
     pre-computed for the whole buffer in parallel, so each step consumes an
     entire sequence header in O(1) gathers.

  B. **Sequence execution** — literals land via one batched scatter; match
     back-references form copy chains (offset < length allowed) that are
     resolved with log2(N) pointer-doubling rounds instead of a serial byte
     copy.

Returns per-row validity flags; a malformed block yields ok=False rather
than undefined behavior.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from libzseek_tpu.ops import common as C


@partial(jax.jit, static_argnames=("out_size", "max_seqs"))
def lz4_decode_blocks(comp: jnp.ndarray, comp_lens: jnp.ndarray,
                      out_size: int, max_seqs: int | None = None):
    """Decode a batch of independent LZ4 blocks.

    comp: (B, M) uint8 zero-padded; comp_lens: (B,) int32.
    out_size: static decompressed capacity per row.
    Returns (out (B, out_size) uint8, out_lens (B,) int32, ok (B,) bool).
    """
    B, Mcap = comp.shape
    N = out_size
    if max_seqs is None:
        # a sequence is >= 3 bytes (token + offset) except the final one
        max_seqs = min(Mcap // 3 + 2, N // 4 + 2)

    ff = C.ff_run_length(comp, 0xFF)
    compi = comp.astype(jnp.int32)

    def g(idx):
        return C.take1(compi, idx)

    # --- phase A: parse ---
    def cond(state):
        k, ip, op, active, bad, *_ = state
        return (k < max_seqs) & jnp.any(active)

    def body(state):
        (k, ip, op, active, bad,
         lit_src, lit_len, lit_dst, m_off, m_len, m_dst) = state
        token = g(ip)
        ll0 = token >> 4
        # literal length extension
        ll_ext = ll0 == 15
        ffr = C.take1(ff, ip + 1)
        ll_extbytes = jnp.where(ll_ext, ffr + 1, 0)
        ll = jnp.where(ll_ext, 15 + 255 * ffr + g(ip + 1 + ffr), ll0)
        src = ip + 1 + ll_extbytes
        dst = op
        lit_end = src + ll
        # last sequence: literals run to end of block, no match
        is_last = lit_end >= comp_lens
        ml0 = token & 15
        off = g(lit_end) | (g(lit_end + 1) << 8)
        ml_ext = ml0 == 15
        ffr2 = C.take1(ff, lit_end + 2)
        ml_extbytes = jnp.where(ml_ext, ffr2 + 1, 0)
        ml = jnp.where(ml_ext, 4 + 15 + 255 * ffr2 + g(lit_end + 2 + ffr2), ml0 + 4)
        ml = jnp.where(is_last, 0, ml)
        match_dst = op + ll
        # malformed-block checks
        overrun = (lit_end > comp_lens) | \
            (~is_last & (lit_end + 2 + ml_extbytes > comp_lens)) | \
            (match_dst + ml > N) | \
            (~is_last & ((off == 0) | (off > match_dst)))
        bad = bad | (active & overrun)
        upd = active & ~bad

        def put(arr, vals):
            return arr.at[:, k].set(jnp.where(upd, vals, arr[:, k]))

        lit_src = put(lit_src, src)
        lit_len = put(lit_len, jnp.where(upd, ll, 0))
        lit_dst = put(lit_dst, dst)
        m_off = put(m_off, off)
        m_len = put(m_len, jnp.where(upd, ml, 0))
        m_dst = put(m_dst, match_dst)

        ip = jnp.where(upd & ~is_last, lit_end + 2 + ml_extbytes, ip)
        op = jnp.where(upd, match_dst + ml, op)
        active = upd & ~is_last
        return (k + 1, ip, op, active, bad,
                lit_src, lit_len, lit_dst, m_off, m_len, m_dst)

    z = jnp.zeros((B,), jnp.int32)
    zk = jnp.zeros((B, max_seqs), jnp.int32)
    active0 = comp_lens > 0
    state = (jnp.int32(0), z, z, active0, jnp.zeros((B,), bool),
             zk, zk, zk, zk, zk, zk)
    (k, ip, op, active, bad,
     lit_src, lit_len, lit_dst, m_off, m_len, m_dst) = jax.lax.while_loop(
        cond, body, state)
    bad = bad | active  # ran out of sequence budget mid-block
    out_lens = op

    # --- phase B: execute ---
    nseq = max_seqs
    seq_valid = lit_len > 0
    # literals: comp-stream membership -> output scatter.  region_index ranks
    # positions among *masked* region starts, so gather through rank-compacted
    # tables (zero-literal sequences would otherwise shift the mapping).
    is_lit_src = C.fill_regions(Mcap, lit_src, lit_src + lit_len, seq_valid)
    src_region = C.region_index(Mcap, lit_src, seq_valid)
    lr_rank = jnp.cumsum(seq_valid.astype(jnp.int32), axis=1) - 1
    lit_src_tab = C.scatter1_set(jnp.zeros((B, nseq), jnp.int32), lr_rank,
                                 lit_src, seq_valid)
    lit_dst_tab = C.scatter1_set(jnp.zeros((B, nseq), jnp.int32), lr_rank,
                                 lit_dst, seq_valid)
    jpos = jnp.broadcast_to(np.arange(Mcap, dtype=np.int32)[None, :], (B, Mcap))
    ldst = C.take1(lit_dst_tab, src_region) + \
        (jpos - C.take1(lit_src_tab, src_region))
    val_layer = jnp.zeros((B, N), jnp.int32)
    val_layer = C.scatter1_set(val_layer, ldst, compi, is_lit_src)
    # matches: output-stream membership -> back-reference indices
    m_valid = m_len > 0
    in_match = C.fill_regions(N, m_dst, m_dst + m_len, m_valid)
    m_region = C.region_index(N, m_dst, m_valid)
    mr_rank = jnp.cumsum(m_valid.astype(jnp.int32), axis=1) - 1
    m_off_tab = C.scatter1_set(jnp.ones((B, nseq), jnp.int32), mr_rank,
                               m_off, m_valid)
    ipos = jnp.broadcast_to(np.arange(N, dtype=np.int32)[None, :], (B, N))
    src0 = jnp.where(in_match, ipos - C.take1(m_off_tab, m_region), ipos)
    src0 = jnp.clip(src0, 0, N - 1)
    rounds = max(1, int(np.ceil(np.log2(max(2, N)))))
    src_final = C.resolve_copy_chains(src0, rounds)
    out = C.take1(val_layer, src_final).astype(jnp.uint8)
    return out, out_lens, ~bad
