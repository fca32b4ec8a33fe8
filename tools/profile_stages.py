"""Microbenchmark the zstd encode device stages in isolation (real TPU).

The tunnel makes block_until_ready unreliable, so each stage is timed as a
chain of REPS dependent iterations (a scalar from iteration k's output is
xor-ed into iteration k+1's input, all on device) closed by one small
scalar fetch; per-iteration time = (total - round_trip) / REPS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libzseek_tpu.utils.platform import apply_platform

apply_platform()

import jax
import jax.numpy as jnp
import numpy as np

from libzseek_tpu.testing.corpus import mixed_corpus, text_corpus

B = int(os.environ.get("PB", "64"))
N = 131072
REPS = int(os.environ.get("REPS", "8"))

rng = np.random.default_rng(3)
kind = os.environ.get("CORPUS", "text")
gen = text_corpus if kind == "text" else mixed_corpus
data = gen(rng, B * N)
X = np.frombuffer(data.tobytes(), np.uint8).reshape(B, N)
lens = np.full((B,), N, np.int32)

Xd = jnp.asarray(X)
lensd = jnp.asarray(lens)
# measure the round-trip cost of the closing scalar fetch
_ = np.asarray(jnp.sum(lensd))
t0 = time.time()
for _i in range(3):
    _ = np.asarray(jnp.sum(lensd) + _i)
RT = (time.time() - t0) / 3
print(f"round trip ~{RT*1000:.0f} ms   corpus={kind} B={B}")


def timeit(name, fn):
    """fn(tweak_scalar) -> (outputs, dep_scalar). Chained REPS times."""
    out, dep = fn(jnp.int32(0))           # warm/compile
    _ = np.asarray(dep)
    t0 = time.time()
    dep = jnp.int32(0)
    for _ in range(REPS):
        out, dep = fn(dep & 0)
    _ = np.asarray(dep)
    dt = (time.time() - t0 - RT) / REPS
    mibs = B * N / dt / (1 << 20)
    print(f"{name:30s} {dt*1000:8.1f} ms   {mibs:8.1f} MiB/s")
    return out


from libzseek_tpu.ops.pallas_match import hash_parse_blocks_smem
from libzseek_tpu.ops.zstd_encode import _fast_post_nolit


def run_parse(tweak):
    out = hash_parse_blocks_smem(Xd ^ tweak.astype(jnp.uint8), lensd)
    return out, out[3][0]


parsed = run_parse(jnp.int32(0))[0]
ll, ml, offv, n_seq, cover = parsed
cap = ll.shape[1]
timeit("parse (hash_parse_smem)", run_parse)


def run_post(tweak):
    out = _fast_post_nolit(Xd, lensd, ll ^ (tweak & 0), ml, offv, n_seq,
                           cover, cap=cap)
    return out, out["n_seq"][0]


post = run_post(jnp.int32(0))[0]
timeit("midstage (_fast_post_nolit)", run_post)

n2 = np.asarray(post["n_seq"])
lc = np.asarray(post["lit_count"])
print("gated n_seq mean:", n2.mean(), "max:", n2.max(),
      "lit mean:", lc.mean())
print("raw n_seq mean:", float(jnp.mean(n_seq)), "max:", int(jnp.max(n_seq)))
