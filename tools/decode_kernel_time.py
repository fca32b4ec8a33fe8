"""Honest on-device timing of the fused SMEM decode kernel: K dependent
iterations inside one jitted lax.scan (the tunnel cannot contaminate the
measurement; cf. tools/scan_profile.py).  The carry feeds meta[:, 15]
(a spare field the kernel ignores) so XLA cannot hoist the call."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libzseek_tpu.utils.platform import apply_platform

apply_platform()

import jax
import jax.numpy as jnp
import numpy as np

from libzseek_tpu.ops import zstd_decode as zd
from libzseek_tpu.ops import pallas_decode as pd
from libzseek_tpu.runtime.zstd_codec import ZstdCodec
from libzseek_tpu.testing.corpus import mixed_corpus, text_corpus

MB = int(os.environ.get("PROF_MB", "8"))
K = int(os.environ.get("K", "4"))
kind = os.environ.get("CORPUS", "mixed")

rng = np.random.default_rng(5)
gen = text_corpus if kind == "text" else mixed_corpus
data = gen(rng, MB << 20).tobytes()
frames_in = [data[i: i + (1 << 20)] for i in range(0, len(data), 1 << 20)]
codec = ZstdCodec()
frames = codec.compress_frames(frames_in)

# host-side row build (copied shape of _try_decode_smem's prep)
hufreg, fsereg = zd._HufReg(), zd._FseReg()
plans = [zd._parse_frame_impl(d, hufreg, fsereg, len(r))
         for d, r in zip(frames, frames_in)]

import types
captured = {}
orig = pd.decode_blocks_smem


def capture(lp, sq, dt, ft, meta, interpret=False):
    captured.update(lp=lp, sq=sq, dt=dt, ft=ft, meta=meta)
    return orig(lp, sq, dt, ft, meta, interpret=interpret)


pd.decode_blocks_smem = capture
res = zd._try_decode_smem(plans, hufreg, fsereg, False, False)
pd.decode_blocks_smem = orig
assert res is not None and b"".join(res) == data

lp, sq, dt, ft, meta = (captured[k] for k in ("lp", "sq", "dt", "ft", "meta"))


@jax.jit
def run(d0):
    def step(c, _):
        m = meta.at[:, 15].set(c)
        outw, stat = orig(lp, sq, dt, ft, m)
        return (outw[0, 0] & 1) + stat[0, 0] * 0, None

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
