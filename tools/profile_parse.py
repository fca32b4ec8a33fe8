"""Microbenchmark the linked zstd parse (zstd_sequences_linked) on the
real TPU, timed as a chain of dependent iterations (see profile_stages.py
for the method).  CORPUS=text|mixed  PB=blocks  REPS=n.
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
data = gen(rng, (B + 1) * N)
X2 = np.frombuffer(data.tobytes(), np.uint8).reshape(B + 1, N)
lens = np.full((B,), N, np.int32)
min_abs = np.concatenate([[N], np.arange(1, B, dtype=np.int32) * N])

X2d = jnp.asarray(X2)
lensd = jnp.asarray(lens)
mind = jnp.asarray(min_abs)

_ = np.asarray(jnp.sum(lensd))
t0 = time.time()
for _i in range(3):
    _ = np.asarray(jnp.sum(lensd) + _i)
RT = (time.time() - t0) / 3
print(f"round trip ~{RT*1000:.0f} ms   corpus={kind} B={B}")

from libzseek_tpu.ops.zstd_encode import zstd_sequences_linked


def run(tweak):
    out = zstd_sequences_linked(X2d ^ tweak.astype(jnp.uint8), lensd, mind)
    return out, out["n_seq"][0]


out, dep = run(jnp.int32(0))
_ = np.asarray(dep)
t0 = time.time()
dep = jnp.int32(0)
for _ in range(REPS):
    out, dep = run(dep & 0)
_ = np.asarray(dep)
dt = (time.time() - t0 - RT) / REPS
print(f"linked parse: {dt*1000:8.1f} ms   {B*N/dt/(1<<20):8.1f} MiB/s")
print("n_seq mean:", float(jnp.mean(out["n_seq"])),
      "lit mean:", float(jnp.mean(out["lit_count"])))
