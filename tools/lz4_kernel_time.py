"""Honest on-device timing of the fused LZ4 encode kernel: K dependent
iterations inside one jitted lax.scan (cf. tools/scan_profile.py).  The
carry XORs one context word so XLA cannot hoist the call; block contents
are unchanged."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libzseek_tpu.utils.platform import apply_platform

apply_platform()

import jax
import jax.numpy as jnp
import numpy as np

from libzseek_tpu.ops.lz4_encode import lz4_compress_bound
from libzseek_tpu.ops.pallas_lz4 import lz4_emit_blocks_smem
from libzseek_tpu.testing.corpus import mixed_corpus, text_corpus

MB = int(os.environ.get("PROF_MB", "8"))
K = int(os.environ.get("K", "4"))
kind = os.environ.get("CORPUS", "mixed")
BLOCK = 1 << 16

rng = np.random.default_rng(5)
gen = text_corpus if kind == "text" else mixed_corpus
B = (MB << 20) // BLOCK
D = np.zeros((B + 1, BLOCK), np.uint8)
D[1:] = gen(rng, B * BLOCK).reshape(B, BLOCK)
dlens = np.full((B,), 2 * BLOCK, np.int32)
dminr = np.full((B,), BLOCK, np.int32)
dminr[1:] = (np.arange(1, B, dtype=np.int32)) * BLOCK
cap = lz4_compress_bound(BLOCK)
cap += (-cap) % 128

Dj = jnp.asarray(D)
lj = jnp.asarray(dlens)
mj = jnp.asarray(dminr)


@jax.jit
def run(d0):
    def step(c, _):
        d2 = Dj.at[0, 0].set((Dj[0, 0].astype(jnp.int32)
                              ^ (c & 1)).astype(jnp.uint8))
        out, olens = lz4_emit_blocks_smem(d2, lj, mj, cap,
                                          block_bytes=BLOCK)
        return (out[0, 0] ^ olens[0]) & 1, None

    c, _ = jax.lax.scan(step, d0, None, length=K)
    return c


_ = np.asarray(run(jnp.int32(0)))
best = 1e9
for arg in (0, 1):
    t0 = time.time()
    _ = np.asarray(run(jnp.int32(arg)))
    best = min(best, time.time() - t0)
ms = best / K * 1000
print(f"corpus={kind} {MB} MiB batch: kernel {ms:.1f} ms/iter = "
      f"{MB / (best / K):.1f} MiB/s device-side")
