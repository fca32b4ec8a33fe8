"""Dump the linked parse kernel's in-kernel counters per block regime:
quad-loop iterations, single-step probes, match-arm (handler) calls, and
the strict-arm flag.  Separates "too many iterations" from "slow
iterations" when tuning the parse.  CORPUS=text|mixed PB=blocks.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libzseek_tpu.utils.platform import apply_platform

apply_platform()

import jax.numpy as jnp
import numpy as np

from libzseek_tpu.ops.pallas_match import zstd_parse_linked_smem
from libzseek_tpu.ops.zstd_encode import block_entropy_h16
from libzseek_tpu.testing.corpus import mixed_corpus, text_corpus

B = int(os.environ.get("PB", "16"))
N = 131072

rng = np.random.default_rng(3)
kind = os.environ.get("CORPUS", "mixed")
gen = text_corpus if kind == "text" else mixed_corpus
data = gen(rng, (B + 1) * N)
X2 = np.frombuffer(data.tobytes(), np.uint8).reshape(B + 1, N)
lens = np.full((B,), N, np.int32)
min_abs = np.concatenate([[N], np.arange(1, B, dtype=np.int32) * N])

h16, _hist = block_entropy_h16(jnp.asarray(X2[1:]), jnp.asarray(lens))
ll, ml, off, n_seq, cover, _mask, ctr = zstd_parse_linked_smem(
    jnp.asarray(X2), jnp.asarray(lens), jnp.asarray(min_abs), h16,
    debug_counters=True)
ctr = np.asarray(ctr)
n_seq = np.asarray(n_seq)
h16 = np.asarray(h16)
print(f"{'blk':>4} {'h16':>5} {'strict':>6} {'quad_it':>8} {'single':>8} "
      f"{'handler':>8} {'n_seq':>6}")
for i in range(B):
    print(f"{i:>4} {h16[i]:>5} {ctr[i, 3]:>6} {ctr[i, 0]:>8} "
          f"{ctr[i, 1]:>8} {ctr[i, 2]:>8} {n_seq[i]:>6}")
tot = ctr.sum(axis=0)
print(f"totals: quad_it={tot[0]} single={tot[1]} handler={tot[2]} "
      f"bytes={B * N}")
