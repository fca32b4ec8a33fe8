"""Stage-level profile of the zstd encode path on the live TPU.

Times each piece of ZstdCodec._dispatch_parse/_finish_blocks separately
(with block_until_ready fences) for one 8 MiB batch, so PERF.md numbers
stay honest.  Not part of the test suite.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libzseek_tpu.utils.platform import apply_platform

apply_platform()

import jax
import jax.numpy as jnp
import numpy as np

from libzseek_tpu.runtime.zstd_codec import ZstdCodec, BLOCK
from libzseek_tpu.testing.corpus import mixed_corpus


def fence(tree):
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, tree)


def main():
    rng = np.random.default_rng(7)
    nblocks = int(os.environ.get("PROF_BLOCKS", "64"))
    data = mixed_corpus(rng, nblocks * BLOCK)
    blocks = [data[i * BLOCK:(i + 1) * BLOCK] for i in range(nblocks)]
    codec = ZstdCodec()

    # warm-up (compile)
    staged = codec._dispatch_parse(blocks)
    fence(staged[0])
    codec._finish_blocks(staged)

    for rep in range(2):
        t0 = time.time()
        staged = codec._dispatch_parse(blocks)
        fence(staged[0])
        t1 = time.time()
        out, _ = codec._finish_blocks(staged)
        t2 = time.time()
        csize = sum(len(p) for p in out if p)
        print(f"rep{rep}: parse+fence {t1-t0:.3f}s  finish {t2-t1:.3f}s  "
              f"total {t2-t0:.3f}s  ratio {nblocks*BLOCK/max(csize,1):.3f}  "
              f"({nblocks*BLOCK/(t2-t0)/2**20:.1f} MiB/s)")

    # finer split of finish (replicates _finish_blocks stage by stage)
    from libzseek_tpu import native
    from libzseek_tpu.ops.zstd_encode import (fse_encode_sequences,
                                              huffman_encode_literals)
    from libzseek_tpu.runtime.zstd_codec import (LIT_ANCHOR_INTERVAL,
                                                 SEQ_ANCHOR_INTERVAL, _ceil_to)
    staged = codec._dispatch_parse(blocks)
    fence(staged[0])
    seqs, lens = staged
    B = lens.shape[0]
    Bp = seqs["n_seq"].shape[0]
    N = BLOCK
    t0 = time.time()
    packed = np.asarray(jnp.concatenate([
        seqs["hist"].reshape(-1), seqs["lit_count"], seqs["n_seq"]]))
    t1 = time.time()
    hist = packed[: Bp * 256].reshape(Bp, 256)[:B]
    lit_count = packed[Bp * 256: Bp * 256 + Bp][:B]
    n_seq = packed[Bp * 256 + Bp:][:B]
    n_lengths, n_codes, n_trees, _mb = native.huf_build_batch(
        hist.astype(np.uint32))
    t2 = time.time()
    code_vals = np.zeros((Bp, 256), np.int32)
    code_bits = np.zeros((Bp, 256), np.int32)
    for i in range(B):
        if n_trees[i] is not None:
            code_vals[i] = n_codes[i]
            code_bits[i] = n_lengths[i]
    lmax = int(lit_count.max())
    lcap = min(N, max(128, 1 << max(0, (lmax - 1)).bit_length()))
    lit_cap = _ceil_to(lcap + 64, 128)
    hout = huffman_encode_literals(
        jax.lax.slice_in_dim(seqs["literals"], 0, lcap, axis=1),
        seqs["lit_count"], jnp.asarray(code_vals), jnp.asarray(code_bits),
        lit_cap, anchor_interval=LIT_ANCHOR_INTERVAL)
    fence(hout)
    t3 = time.time()
    nmax = int(n_seq.max())
    smax = max(16, 1 << max(0, (nmax - 1)).bit_length())
    seq_cap = _ceil_to(min(N // 2, 11 * smax) + 64, 128)
    fout = fse_encode_sequences(
        seqs["ll"], seqs["ml"], seqs["offv"], seqs["n_seq"], seq_cap,
        smax=smax, anchor_interval=SEQ_ANCHOR_INTERVAL)
    fence(fout)
    t4 = time.time()
    meta_parts = [hout[1].reshape(-1), fout[1],
                  hout[2].reshape(-1), fout[2][0].reshape(-1),
                  fout[2][1].reshape(-1), fout[2][2].reshape(-1)]
    meta = np.asarray(jnp.concatenate(meta_parts))
    both = np.asarray(jnp.concatenate([hout[0], fout[0]], axis=1))
    t5 = time.time()
    print(f"packed fetch {t1-t0:.3f}s | huf build host {t2-t1:.3f}s | "
          f"huf kernel {t3-t2:.3f}s (lcap={lcap}) | fse kernel {t4-t3:.3f}s "
          f"(smax={smax}) | payload fetch {t5-t4:.3f}s ({both.nbytes} B)")

    # parse split: pallas kernel alone vs _fast_post XLA tail
    from libzseek_tpu.ops.pallas_match import hash_parse_blocks_smem
    from libzseek_tpu.ops.zstd_encode import _fast_post
    X = np.zeros((Bp, N), np.uint8)
    lens2 = np.zeros((Bp,), np.int32)
    for i, blk in enumerate(blocks):
        X[i, : len(blk)] = blk
        lens2[i] = len(blk)
    Xd, Ld = jnp.asarray(X), jnp.asarray(lens2)
    r = hash_parse_blocks_smem(Xd, Ld); fence(r)
    out = _fast_post(Xd, Ld, *r, r[0].shape[1]); fence(out)
    for rep in range(2):
        t0 = time.time()
        r = hash_parse_blocks_smem(Xd, Ld); fence(r)
        t1 = time.time()
        out = _fast_post(Xd, Ld, *r, r[0].shape[1]); fence(out)
        t2 = time.time()
        print(f"parse split rep{rep}: pallas {t1-t0:.3f}s  "
              f"fast_post {t2-t1:.3f}s")


if __name__ == "__main__":
    main()
