"""Parse-kernel deep profile: per-regime timing + in-kernel counters.

Times zstd_parse_linked_smem alone (K dependent iterations inside one
jitted lax.scan, per tpu-tunnel timing discipline), then re-runs it with
debug_counters=True and prints per-quarter (the mixed corpus is 4 equal
regimes: text-like / period-337 / zeros / noise) iteration counts:
quad-loop iterations, single-step iterations, match-arm entries, and the
strict-arm flag.  CORPUS=mixed|text PB=blocks K=iters.
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

from libzseek_tpu.ops.zstd_encode import GATE_FIXED_BITS, block_entropy_h16
from libzseek_tpu.ops.pallas_match import zstd_parse_linked_smem
from libzseek_tpu.testing.corpus import mixed_corpus, text_corpus

B = int(os.environ.get("PB", "64"))
N = 131072
K = int(os.environ.get("K", "8"))

rng = np.random.default_rng(3)
kind = os.environ.get("CORPUS", "mixed")
if kind == "noise":
    data = rng.integers(0, 256, (B + 1) * N, dtype=np.uint8)
elif kind == "zeros":
    data = np.zeros((B + 1) * N, np.uint8)
else:
    gen = text_corpus if kind == "text" else mixed_corpus
    data = gen(rng, (B + 1) * N)
X2 = jnp.asarray(np.frombuffer(data.tobytes(), np.uint8).reshape(B + 1, N))
nominal = 0 if os.environ.get("ZLEN") else N
lens = jnp.asarray(np.full((B,), nominal, np.int32))
min_abs = jnp.asarray(
    np.concatenate([[N], np.arange(1, B, dtype=np.int32) * N]))
h16, _ = block_entropy_h16(
    jax.lax.slice_in_dim(X2, 1, B + 1, axis=0), lens)
h16 = jax.block_until_ready(h16)

KW = dict(gate_bits=GATE_FIXED_BITS)
if os.environ.get("CAP"):
    KW["cap"] = int(os.environ["CAP"])


def timed(tag, **kw):
    @jax.jit
    def run(d0):
        def step(c, _):
            x2 = X2 ^ c.astype(jnp.uint8)
            ll, ml, offv, n_seq, cover, _m = zstd_parse_linked_smem(
                x2, lens, min_abs, h16, **KW, **kw)
            return n_seq[0] & 1, None
        c, _ = jax.lax.scan(step, d0, None, length=K)
        return c

    _ = np.asarray(run(jnp.int32(0)))
    best = 1e9
    for arg in (0, 1):
        t0 = time.time()
        _ = np.asarray(run(jnp.int32(arg)))
        best = min(best, time.time() - t0)
    ms = best / K * 1000
    print(f"{tag:>28}: {ms:8.2f} ms/iter  "
          f"({B * N / (best / K) / 2**20:7.1f} MiB/s)", flush=True)
    return ms


timed("parse (production)")

# --- counters ---
out = zstd_parse_linked_smem(X2, lens, min_abs, h16, **KW,
                             debug_counters=True)
ll, ml, offv, n_seq, cover, _mask, ctr = [np.asarray(a) for a in out]
q = B // 4
names = ["text", "rep337", "zeros", "noise"] if kind == "mixed" else [kind] * 4
print(f"{'quarter':>8} {'quad_it':>10} {'single_it':>10} {'match_arm':>10} "
      f"{'strict':>6} {'n_seq':>8} {'h16':>5}")
h16_h = np.asarray(h16)
for Q in range(4):
    s = slice(Q * q, (Q + 1) * q)
    print(f"{names[Q]:>8} {ctr[s, 0].sum():>10} {ctr[s, 1].sum():>10} "
          f"{ctr[s, 2].sum():>10} {ctr[s, 3].sum():>6} "
          f"{n_seq[s].sum():>8} {h16_h[s].mean():5.0f}")
print(f"{'TOTAL':>8} {ctr[:, 0].sum():>10} {ctr[:, 1].sum():>10} "
      f"{ctr[:, 2].sum():>10} {ctr[:, 3].sum():>6} {n_seq.sum():>8}")
