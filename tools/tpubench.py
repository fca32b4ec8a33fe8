"""Development microbenchmark for the TPU compute path.

Axon-tunnel-safe timing: block_until_ready does not actually block through
the tunnel and small device->host fetches are pathologically slow, so we
time K dependent on-device iterations inside ONE jitted program and do a
single >=2 MiB fetch at the end.  A tiny input perturbation per iteration
defeats CSE/loop hoisting.

Usage: python tools/tpubench.py [--op lz4_encode] [--mb 64] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

from libzseek_tpu.ops import common as C
from libzseek_tpu.ops import match as M
from libzseek_tpu.ops.lz4_encode import lz4_encode_blocks
from libzseek_tpu.testing.corpus import mixed_corpus, text_corpus


def timed_loop(fn, args, iters: int):
    """Dispatch + single big fetch; returns seconds per iteration."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            perturbed = a[0].at[0, 0].set((i & 0xFF).astype(jnp.uint8))
            out = fn(perturbed, *a[1:])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1].astype(jnp.int32)) for l in leaves)
            return acc + s
        total = jax.lax.fori_loop(0, iters, body, jnp.int32(0))
        # pad the fetched result to >=2 MiB so the tunnel fast path is used
        return jnp.full((1 << 19,), total, dtype=jnp.int32)

    # warmup/compile
    r = loop(*args)
    np.asarray(r[:1 << 19])
    t0 = time.time()
    r = loop(*args)
    np.asarray(r[:1 << 19])
    dt = time.time() - t0
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="lz4_encode")
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--block-kb", type=int, default=64)
    ap.add_argument("--corpus", default="mixed", choices=["mixed", "text", "zeros"])
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    N = args.block_kb * 1024
    B = args.mb * (1 << 20) // N
    rng = np.random.default_rng(42)
    gen = {"mixed": mixed_corpus, "text": text_corpus,
           "zeros": lambda r, n: np.zeros(n, np.uint8)}[args.corpus]
    data = gen(rng, B * N).reshape(B, N)
    X = jax.device_put(jnp.asarray(data))
    L = jax.device_put(jnp.full((B,), N, jnp.int32))

    if args.op == "lz4_encode":
        fn = lambda x, lens: lz4_encode_blocks(x, lens)
    elif args.op == "nearest":
        fn = lambda x, lens: M.nearest_prev_occurrence(x, lens)
    elif args.op == "sort_only":
        def fn(x, lens):
            v = C.u32_window(x)
            pos = jnp.broadcast_to(
                jnp.arange(x.shape[1], dtype=jnp.int32)[None, :], x.shape)
            return jax.lax.sort((v, pos), num_keys=2)
    elif args.op == "segmatch":
        fn = lambda x, lens: M.find_segment_matches(
            x, lens, seg_size=8, max_len=64, min_tail=12, max_back=4)
    elif args.op == "select":
        def fn(x, lens):
            p, off, e, has = M.find_segment_matches(
                x, lens, seg_size=8, max_len=64, min_tail=12, max_back=4)
            return M.greedy_select(p, off, e, has, lens, min_tail=12)
    else:
        raise SystemExit(f"unknown op {args.op}")

    t0 = time.time()
    sec = timed_loop(fn, (X, L), args.iters)
    mb = B * N / (1 << 20)
    print(f"{args.op}: {sec*1000:.1f} ms / {mb:.0f} MiB batch "
          f"-> {mb/sec:.0f} MiB/s  (total incl. compile {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
