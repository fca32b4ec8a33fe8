"""Mosaic feature probe for the fused vector-entropy kernel: verifies the
specific in-kernel primitives the design needs, each in a tiny kernel:

  cumsum   jnp.cumsum along lanes and sublanes in VMEM
  reshape  sublane-split reshape (1024,128)->(256,4,128) + reduce
  dot      bf16 matmul (M,16)@(16,32) with f32 accum (the code lookup)
  roll     pltpu.roll with DYNAMIC shift + dynamic-sublane read/write
  smalldot f32 (14,16)@(16,176) inside a fori loop (the L2 per-super dot)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libzseek_tpu.utils.platform import apply_platform

apply_platform()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def run(name, fn):
    try:
        out = fn()
        print(f"{name:>9}: OK {np.asarray(out).ravel()[:4]}")
    except Exception as e:
        print(f"{name:>9}: FAILED {type(e).__name__}: {str(e)[:300]}")


# 1. cumsum in-kernel
def _k_cumsum(x, o):
    a = jnp.cumsum(x[:], axis=1)
    b = jnp.cumsum(a, axis=0)
    o[:] = b


def t_cumsum():
    x = jnp.asarray(rng.integers(0, 3, (1024, 128)).astype(np.int32))
    f = pl.pallas_call(
        _k_cumsum,
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = f(x)
    exp = np.cumsum(np.cumsum(np.asarray(x), axis=1), axis=0)
    assert np.array_equal(np.asarray(r), exp), "cumsum mismatch"
    return r[-1, -4:]


# 2. sublane-split reshape + reduce
def _k_reshape(x, o):
    v = x[:].reshape(256, 4, 128)
    o[:] = jnp.sum(v, axis=1)


def t_reshape():
    x = jnp.asarray(rng.integers(0, 100, (1024, 128)).astype(np.int32))
    f = pl.pallas_call(
        _k_reshape,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = f(x)
    exp = np.asarray(x).reshape(256, 4, 128).sum(axis=1)
    assert np.array_equal(np.asarray(r), exp)
    return r[0, :4]


# 3. bf16 dot with f32 accum
def _k_dot(x, t, o):
    hi = (x[:] >> 4).astype(jnp.int32)
    oh = (hi[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 16), 2)).astype(jnp.bfloat16)
    a = jax.lax.dot_general(oh.reshape(1024 * 128 // 512, 512, 16)[0],
                            t[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o[:] = a


def t_dot():
    x = jnp.asarray(rng.integers(0, 256, (4, 128)).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 250, (16, 32)).astype(np.float32)
                    .astype(np.float32)).astype(jnp.bfloat16)

    def _k(x, t, o):
        hi = (x[:] >> 4).astype(jnp.int32)
        flat = hi.reshape(512, 1)
        oh = (flat == jax.lax.broadcasted_iota(
            jnp.int32, (512, 16), 1)).astype(jnp.bfloat16)
        o[:] = jax.lax.dot_general(oh, t[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        _k,
        out_shape=jax.ShapeDtypeStruct((512, 32), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = f(x, t)
    hi = (np.asarray(x) >> 4).reshape(512)
    exp = np.asarray(t, np.float32)[hi]
    assert np.allclose(np.asarray(r), exp), "dot lookup mismatch"
    return r[0, :4]


# 4. dynamic roll + dynamic sublane rmw
def _k_roll(x, s, o):
    o[:] = jnp.zeros_like(o)

    def body(i, _):
        c = s[0, 2 * i]
        r = s[0, 2 * i + 1]
        rolled = pltpu.roll(x[:], shift=c, axis=1)
        cur = o[pl.ds(r, 2), :]
        o[pl.ds(r, 2), :] = cur + rolled
        return 0

    jax.lax.fori_loop(0, 4, body, 0)


def t_roll():
    x = jnp.asarray(rng.integers(0, 100, (2, 128)).astype(np.int32))
    sh = np.array([[3, 0, 77, 5, 0, 9, 127, 14]], np.int32)
    f = pl.pallas_call(
        _k_roll,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = np.asarray(f(x, jnp.asarray(sh)))
    exp = np.zeros((16, 128), np.int32)
    for i in range(4):
        c, row = sh[0, 2 * i], sh[0, 2 * i + 1]
        exp[row: row + 2] += np.roll(np.asarray(x), c, axis=1)
    assert np.array_equal(r, exp), "roll mismatch"
    return r[0, :4]


# 5. small dots inside fori loop
def _k_smalldot(v, m, o):
    def body(s, acc):
        p = jax.lax.dot_general(
            v[s], m[s], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + jnp.sum(p)

    tot = jax.lax.fori_loop(0, 256, body, jnp.float32(0))
    o[0, 0] = tot


def t_smalldot():
    v = jnp.asarray(rng.integers(0, 100, (256, 16, 16)).astype(np.float32))
    m = jnp.asarray(rng.integers(0, 2, (256, 16, 176)).astype(np.float32))
    f = pl.pallas_call(
        _k_smalldot,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))
    r = f(v, m)
    exp = np.einsum("sij,sjk->", np.asarray(v), np.asarray(m))
    assert np.allclose(np.asarray(r)[0, 0], exp, rtol=1e-5), (r, exp)
    return r


for nm, fn in [("cumsum", t_cumsum), ("reshape", t_reshape),
               ("dot", t_dot), ("roll", t_roll),
               ("smalldot", t_smalldot)]:
    run(nm, fn)
