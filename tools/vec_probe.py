"""On-chip microbenchmarks for the vectorized entropy-emission design
(round 5): measures each candidate primitive with the scan-based timing
discipline (one dispatch, K dependent iterations) so tunnel noise cannot
contaminate the numbers.  Stages:

  lookup   per-byte packed-code lookup via nibble one-hot matmuls
  cumsum   per-byte suffix sums (bit offsets) + masks + spreads
  l0       quad windows (per-4-byte 3-word spread, int32 select-adds)
  l1       group einsum (8 quads -> 14-word window) + skew-reshape
  l2       super einsum (16 groups -> ~180-word window) + skew-reshape
  roll     Pallas kernel: dynamic-shift pltpu.roll + dynamic-sublane adds
           (the final placement primitive)

PB=blocks K=iters.  Numbers feed PERF.md's roofline statement.
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
from functools import partial

B = int(os.environ.get("PB", "64"))
N = 131072
K = int(os.environ.get("K", "8"))
NQ = N // 4

rng = np.random.default_rng(0)
Xh = rng.integers(0, 256, (B, N)).astype(np.uint8)
X = jnp.asarray(Xh)
# plausible packed code table (val<<4 | len), len in [2, 11]
lens_t = rng.integers(2, 12, (B, 256)).astype(np.int32)
vals_t = rng.integers(0, 1 << 11, (B, 256)).astype(np.int32)
T = jnp.asarray((vals_t << 4) | lens_t)
MASKh = (rng.random((B, N)) < 0.45)
MASK = jnp.asarray(MASKh)


def lookup(x, tab):
    """p[i] = tab[b, x[i]] via nibble one-hot: A = hi_oh @ T2d (MXU f32,
    exact: entries < 2^16), p = rowsum(A * lo_oh)."""
    hi = (x >> 4).astype(jnp.int32)
    lo = (x & 15).astype(jnp.int32)
    t2 = tab.reshape(B, 16, 16).astype(jnp.float32)
    hi_oh = (hi[:, :, None] == np.arange(16, dtype=np.int32)).astype(
        jnp.float32)
    a = jnp.einsum("bnh,bhl->bnl", hi_oh, t2,
                   preferred_element_type=jnp.float32)
    lo_oh = (lo[:, :, None] == np.arange(16, dtype=np.int32))
    p = jnp.sum(jnp.where(lo_oh, a, 0.0), axis=2)
    return p.astype(jnp.int32)


def stage_lookup(x):
    p = lookup(x, T)
    return p[0, 0]


def offsets(x):
    p = lookup(x, T)
    ln = jnp.where(MASK, p & 15, 0)
    # suffix exclusive sum: off[i] = sum_{j>i} len[j]
    tot = jnp.sum(ln, axis=1, keepdims=True)
    inc = jnp.cumsum(ln, axis=1)
    suf = tot - inc                       # exclusive suffix sum
    val = jnp.where(MASK, p >> 4, 0).astype(jnp.uint32)
    sh = (suf & 31).astype(jnp.uint32)
    lo = (val << sh).astype(jnp.uint32)
    hi = ((val >> (31 - sh)) >> 1).astype(jnp.uint32)
    w = (suf >> 5).astype(jnp.int32)
    return lo, hi, w, suf


def stage_cumsum(x):
    lo, hi, w, suf = offsets(x)
    return (lo[0, 0] ^ hi[0, 0]).astype(jnp.int32) + w[0, 0]


def l0(x):
    """Quad windows: (B, NQ, 3) int32, W_q = word of quad's first
    contribution (positions DESCEND over i in the real stream; this probe
    uses the suffix-sum offsets as-is, so take the quad's min word)."""
    lo, hi, w, _ = offsets(x)
    w4 = w.reshape(B, NQ, 4)
    lo4 = lo.reshape(B, NQ, 4)
    hi4 = hi.reshape(B, NQ, 4)
    wq = jnp.min(w4, axis=2)
    d = w4 - wq[:, :, None]               # in [0..2] for real streams
    v = jnp.zeros((B, NQ, 3), jnp.uint32)
    for j in range(3):
        v = v.at[:, :, j].set(
            jnp.sum(jnp.where(d == j, lo4, 0), axis=2)
            + jnp.sum(jnp.where(d == j - 1, hi4, 0), axis=2))
    return v, wq


def stage_l0(x):
    v, wq = l0(x)
    return v[0, 0, 0].astype(jnp.int32) + wq[0, 0]


def _skew_sum(p):
    """p: (..., J, C) -> out (..., J + C - 1): out[d] = sum_j p[j, d - j]
    via the pad-flatten-reshape diagonal trick (no gathers)."""
    *lead, J, C = p.shape
    P = C + J
    pad = jnp.concatenate(
        [p, jnp.zeros((*lead, J, P - C), p.dtype)], axis=-1)
    flat = pad.reshape(*lead, J * P)[..., : J * (P - 1)]
    return jnp.sum(flat.reshape(*lead, J, P - 1), axis=-2)[..., : J + C - 1]


def l1(x):
    v, wq = l0(x)
    # halves for exact f32 matmuls
    vl = (v & 0xFFFF).astype(jnp.float32)
    vh = (v >> 16).astype(jnp.float32)
    G = NQ // 8
    wq8 = wq.reshape(B, G, 8)
    wg = wq8[:, :, 0]
    d = jnp.clip(wq8 - wg[:, :, None], 0, 11)
    oh = (d[:, :, :, None] == np.arange(12, dtype=np.int32)).astype(
        jnp.float32)
    vl8 = vl.reshape(B, G, 8, 3)
    vh8 = vh.reshape(B, G, 8, 3)
    pl = jnp.einsum("bgqj,bgqk->bgjk", vl8, oh,
                    preferred_element_type=jnp.float32)
    ph = jnp.einsum("bgqj,bgqk->bgjk", vh8, oh,
                    preferred_element_type=jnp.float32)
    wl = _skew_sum(pl)                    # (B, G, 14)
    wh = _skew_sum(ph)
    return wl, wh, wg


def stage_l1(x):
    wl, wh, wg = l1(x)
    return wl[0, 0, 0].astype(jnp.int32) + wg[0, 0]


def l2(x):
    wl, wh, wg = l1(x)
    G = wg.shape[1]
    S = G // 16
    wg16 = wg.reshape(B, S, 16)
    ws = wg16[:, :, 0]
    d = jnp.clip(wg16 - ws[:, :, None], 0, 165)
    oh = (d[:, :, :, None] == np.arange(166, dtype=np.int32)).astype(
        jnp.float32)
    vl = wl.reshape(B, S, 16, 14)
    vh = wh.reshape(B, S, 16, 14)
    pl = jnp.einsum("bsgj,bsgk->bsjk", vl, oh,
                    preferred_element_type=jnp.float32)
    ph = jnp.einsum("bsgj,bsgk->bsjk", vh, oh,
                    preferred_element_type=jnp.float32)
    ol = _skew_sum(pl)                    # (B, S, 179)
    oh2 = _skew_sum(ph)
    w32 = (ol.astype(jnp.int32) + (oh2.astype(jnp.int32) << 16))
    return w32, ws


def stage_l2(x):
    w32, ws = l2(x)
    return w32[0, 0, 0] + ws[0, 0]


# ---- Pallas placement kernel probe: dynamic roll + dynamic sublane add ----

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUP = 256          # supers per block
WIN = 256          # window words (padded to 2 lanes rows)
ROWS = 264         # output rows of 128 words (33792 words >= 32800)


def _place_kernel(win, ws, out):
    out[0, :, :] = jnp.zeros((ROWS, 128), jnp.int32)

    def body(s, _):
        w = ws[0, s]
        r = w // 128
        c = w % 128
        blockw = win[0, s]                        # (WIN//128=2, 128) int32
        rolled = pltpu.roll(blockw, shift=c, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        prev = jnp.concatenate(
            [jnp.zeros((1, 128), jnp.int32), rolled[:-1]], axis=0)
        lowpart = jnp.where(lane < c, prev, rolled)      # rows 0..1
        tail = jnp.where(lane < c, rolled[-1:], 0)       # row 2
        v = jnp.concatenate([lowpart, tail], axis=0)     # (3, 128)
        cur = out[0, pl.ds(r, 3), :]
        out[0, pl.ds(r, 3), :] = cur + v
        return 0

    jax.lax.fori_loop(0, SUP, body, 0)


@jax.jit
def place(win, ws):
    return pl.pallas_call(
        _place_kernel,
        grid=(win.shape[0],),
        in_specs=[
            pl.BlockSpec((1, SUP, WIN // 128, 128),
                         lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUP), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((win.shape[0], ROWS, 128),
                                       jnp.int32),
    )(win, ws)


WINS = jnp.asarray(
    rng.integers(0, 1 << 30, (B, SUP, WIN // 128, 128)).astype(np.int32))
WS = jnp.asarray(
    np.sort(rng.integers(0, ROWS * 128 - WIN - 256, (B, SUP))
            .astype(np.int32), axis=1))


def stage_roll(x):
    out = place(WINS + x[0, 0].astype(jnp.int32), WS)
    return out[0, 0, 0]


# ---- cheaper variants ----


def lookup_i8(x, tab):
    """Same lookup with int8 one-hot and byte-split table (int8 MXU path,
    f32->int32 exact), minimizing HBM-resident one-hot width."""
    hi = (x >> 4).astype(jnp.int32)
    lo = (x & 15).astype(jnp.int32)
    t2 = tab.reshape(B, 16, 16)
    tcat = jnp.concatenate([t2 & 0xFF, t2 >> 8], axis=2).astype(jnp.int8)
    hi_oh = (hi[:, :, None] == np.arange(16, dtype=np.int32)).astype(
        jnp.int8)
    a = jax.lax.dot_general(
        hi_oh, tcat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)          # (B, N, 32)
    lo_oh = lo[:, :, None] == np.arange(16, dtype=np.int32)
    p = (jnp.sum(jnp.where(lo_oh, a[:, :, :16], 0), axis=2)
         + (jnp.sum(jnp.where(lo_oh, a[:, :, 16:], 0), axis=2) << 8))
    return p


def stage_lookup_i8(x):
    return lookup_i8(x, T)[0, 0]


def l1_b(x):
    """L1 with bf16 byte-split values (4 splits < 2^8, exact in bf16 with
    f32 accumulation) and bf16 one-hot."""
    v, wq = l0(x)
    G = NQ // 8
    wq8 = wq.reshape(B, G, 8)
    wg = wq8[:, :, 0]
    d = jnp.clip(wq8 - wg[:, :, None], 0, 11)
    oh = (d[:, :, :, None] == np.arange(12, dtype=np.int32)).astype(
        jnp.bfloat16)
    v8 = v.reshape(B, G, 8, 3)
    parts = []
    for k in range(4):
        vb = ((v8 >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
        p = jnp.einsum("bgqj,bgqk->bgjk", vb, oh,
                       preferred_element_type=jnp.float32)
        parts.append(_skew_sum(p).astype(jnp.int32))
    w32 = (parts[0] + (parts[1] << 8) + (parts[2] << 16)
           + (parts[3] << 24))
    return w32, wg


def stage_l1b(x):
    w32, wg = l1_b(x)
    return w32[0, 0, 0] + wg[0, 0]


def l2_shift(x):
    """L2 via shifted one-hots: one einsum contracting (group, j) jointly,
    no P2 materialization, no separate skew pass."""
    wl, wh, wg = l1(x)
    G = wg.shape[1]
    S = G // 16
    J1 = wl.shape[2]                      # 14
    W2 = 176
    wg16 = wg.reshape(B, S, 16)
    ws = wg16[:, :, 0]
    d = jnp.clip(wg16 - ws[:, :, None], 0, W2 - J1 - 1)
    oh = (d[:, :, :, None] == np.arange(W2 - J1, dtype=np.int32)).astype(
        jnp.bfloat16)                     # (B, S, 16, W2-J1)
    # ohj[g, j, :] = oh[g] shifted right by j (static pad+slice)
    ohp = jnp.pad(oh, ((0, 0), (0, 0), (0, 0), (J1, 0)))
    ohj = jnp.stack([ohp[..., J1 - j: W2 - j] for j in range(J1)],
                    axis=3)               # (B, S, 16, J1, W2-J1)... wide
    vl = wl.reshape(B, S, 16, J1)
    vh = wh.reshape(B, S, 16, J1)
    outs = []
    for v16 in (vl, vh):
        parts = []
        for k in range(2):
            vb = (v16.astype(jnp.int32) >> (8 * k) & 0xFF).astype(
                jnp.bfloat16)
            p = jnp.einsum("bsgj,bsgjk->bsk", vb, ohj,
                           preferred_element_type=jnp.float32)
            parts.append(p.astype(jnp.int32))
        outs.append(parts[0] + (parts[1] << 8))
    w32 = outs[0] + (outs[1] << 16)
    return w32, ws


def stage_l2s(x):
    w32, ws = l2_shift(x)
    return w32[0, 0, 0] + ws[0, 0]


def scan_fn(stage):
    @jax.jit
    def run(d0):
        def step(c, _):
            return stage(X ^ c.astype(jnp.uint8)) & 1, None
        c, _ = jax.lax.scan(step, d0, None, length=K)
        return c
    return run


stages = [("lookup", stage_lookup), ("lookup_i8", stage_lookup_i8),
          ("cumsum", stage_cumsum),
          ("l0", stage_l0), ("l1", stage_l1), ("l1b", stage_l1b),
          ("l2", stage_l2), ("l2s", stage_l2s),
          ("roll", stage_roll)]
which = os.environ.get("STAGES")
if which:
    keep = which.split(",")
    stages = [s for s in stages if s[0] in keep]

print(f"B={B} K={K}  ({B * N / 2**20:.0f} MiB batch; Δ = stage cost)")
prev = 0.0
for name, fn in stages:
    f = scan_fn(fn)
    try:
        _ = np.asarray(f(jnp.int32(0)))
    except Exception as e:
        print(f"{name:>8}: FAILED {type(e).__name__}: {str(e)[:200]}")
        continue
    best = 1e9
    for arg in (0, 1):
        t0 = time.time()
        _ = np.asarray(f(jnp.int32(arg)))
        best = min(best, time.time() - t0)
    ms = best / K * 1000
    print(f"{name:>8}: {ms:8.2f} ms/iter   Δ {ms - prev:7.2f} ms")
    prev = ms
