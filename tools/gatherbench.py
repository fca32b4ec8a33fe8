"""Measure TPU gather/scatter primitive throughput — these dominate the
codec pipelines, so the kernel design follows these numbers.

Axon-safe timing (on-device loop, one big fetch)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

B, N, K = 256, 65536, 8192  # table rows, table size, lookups per row
SPAN = 48


def timed(name, fn, *args, iters=20):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            r = fn(a[0] + i.astype(a[0].dtype), *a[1:])
            return acc + jnp.sum(r[..., :1].astype(jnp.int32))
        t = jax.lax.fori_loop(0, iters, body, jnp.int32(0))
        return jnp.full((1 << 19,), t, jnp.int32)

    r = loop(*args); np.asarray(r[:8192])  # compile+warm
    t0 = time.time()
    r = loop(*args); np.asarray(r[:1 << 19])
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    tbl = jax.device_put(jnp.asarray(rng.integers(0, 2**31, (B, N), dtype=np.int32)))
    tbl8 = jax.device_put(jnp.asarray(rng.integers(0, 255, (B, N), dtype=np.uint8)))
    idx = jax.device_put(jnp.asarray(rng.integers(0, N - 64, (B, K), dtype=np.int32)))
    idxN = jax.device_put(jnp.asarray(rng.integers(0, N - 64, (B, N), dtype=np.int32)))

    # 1. element gather i32, K per row (2M total)
    timed("gather i32 (B,K)=2M", lambda i, t: jnp.take_along_axis(t, jnp.clip(i, 0, N-1), axis=1), idx, tbl)
    # 2. element gather i32, N per row (16M total)
    timed("gather i32 (B,N)=16M", lambda i, t: jnp.take_along_axis(t, jnp.clip(i, 0, N-1), axis=1), idxN, tbl)
    # 3. element gather u8 (16M)
    timed("gather u8  (B,N)=16M", lambda i, t: jnp.take_along_axis(t, jnp.clip(i, 0, N-1), axis=1), idxN, tbl8)
    # 4. span gather: 48 consecutive u8 per index via vmap dynamic_slice-like indexing
    def span_gather(i, t):
        i = jnp.clip(i, 0, N - SPAN - 1)
        return t[jnp.arange(B)[:, None, None], i[:, :, None] + np.arange(SPAN)[None, None, :]]
    timed("span  u8 (B,K,48)=100M", span_gather, idx, tbl8)
    # 5. scatter set i32 (2M)
    def scat(i, t):
        return t.at[jnp.arange(B)[:, None], jnp.clip(i, 0, N-1)].set(i, mode="drop")
    timed("scatter i32 (B,K)=2M", scat, idx, tbl)
    # 6. scatter set i32 (16M)
    timed("scatter i32 (B,N)=16M", scat, idxN, tbl)
    # 7. cumsum i32 (16M)
    timed("cumsum i32 (B,N)=16M", lambda i, t: jnp.cumsum(t + i[:, :1], axis=1), idxN, tbl)
    # 8. sort 2-key (16M)
    timed("sort2 (B,N)=16M", lambda i, t: jax.lax.sort((t + i[:, :1], i), num_keys=2)[0], idxN, tbl, iters=5)


if __name__ == "__main__":
    main()
