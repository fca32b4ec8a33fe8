"""Bit-exactness of the vectorized literal emitter (ops/vector_entropy)
against the XLA reference encoder (ops/zstd_encode.huffman_encode_literals,
the same oracle tools/check_entropy_kernel.py validates the scalar SMEM
kernel against)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from libzseek_tpu.ops import common as C
from libzseek_tpu.ops import huffman
from libzseek_tpu.ops.vector_entropy import (N_BLOCK, VEC_MIN_LC,
                                             vector_literals)
from libzseek_tpu.ops.zstd_encode import (extract_literals,
                                          huffman_encode_literals,
                                          zstd_sequences)

N = N_BLOCK
LIT_CAP = ((N + 64 + 127) // 128) * 128


def _corpus(rng, kind):
    if kind == "text":
        base = np.frombuffer(b"the quick brown fox jumps over a dog ",
                             np.uint8)
        x = rng.choice(base, N).astype(np.uint8)
        # plant matches so the literal mask has real holes
        for _ in range(200):
            s = int(rng.integers(0, N - 4096))
            d = int(rng.integers(8, 2048))
            ln = int(rng.integers(8, 512))
            e = min(N, s + d + ln)
            x[s + d: e] = x[s: e - d]
        return x
    if kind == "skewed":
        return rng.choice(
            np.arange(256, dtype=np.uint8),
            N, p=np.r_[np.full(8, 0.09), np.full(248, 0.28 / 248)]
        ).astype(np.uint8)
    raise AssertionError(kind)


def _setup(kinds, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack([_corpus(rng, k) for k in kinds])
    B = X.shape[0]
    lens = np.full((B,), N, np.int32)
    seqs = zstd_sequences(jnp.asarray(X), jnp.asarray(lens))
    ll = np.asarray(seqs["ll"])
    ml = np.asarray(seqs["ml"])
    n_seq = np.asarray(seqs["n_seq"])
    lit_count = np.asarray(seqs["lit_count"])
    hist = np.asarray(seqs["hist"])
    lits_plane = np.asarray(extract_literals(
        jnp.asarray(X), jnp.asarray(lens), seqs["ll"], seqs["ml"],
        seqs["n_seq"]))
    # literal coverage mask -> packed 32-bit words (parse-kernel format)
    seq_end = np.cumsum(ll + ml, axis=1)
    seq_start = seq_end - ml
    valid = (np.arange(ll.shape[1])[None, :]
             < n_seq[:, None])
    in_match = np.asarray(C.fill_regions(
        N, jnp.asarray(seq_start), jnp.asarray(seq_end),
        jnp.asarray(valid)))
    is_lit = ~in_match
    mask_words = (is_lit.reshape(B, N // 32, 32).astype(np.uint64)
                  << np.arange(32, dtype=np.uint64)).sum(axis=2)
    mask_words = mask_words.astype(np.uint32).view(np.int32)

    code_vals = np.zeros((B, 256), np.int32)
    code_bits = np.zeros((B, 256), np.int32)
    for i in range(B):
        ct = huffman.build_ctable(hist[i])
        code_vals[i] = ct.codes
        code_bits[i] = ct.lengths
    codes_packed = ((code_vals << 4) | code_bits).astype(np.int32)
    return (X, lens, lit_count, lits_plane, mask_words, code_vals,
            code_bits, codes_packed)


def _oracle(lits_plane, lit_count, code_vals, code_bits):
    hx = huffman_encode_literals(
        jnp.asarray(lits_plane), jnp.asarray(lit_count),
        jnp.asarray(code_vals), jnp.asarray(code_bits), LIT_CAP,
        anchor_interval=512)
    return (np.asarray(hx[0]), np.asarray(hx[1]), np.asarray(hx[2]))


def _check(kinds, emulate, seed=0):
    (X, lens, lit_count, lits_plane, mask_words, code_vals, code_bits,
     codes_packed) = _setup(kinds, seed)
    B = X.shape[0]
    assert (lit_count >= VEC_MIN_LC).all(), lit_count
    x_stream, x_sizes, x_anch = _oracle(lits_plane, lit_count,
                                        code_vals, code_bits)
    import jax
    interp = jax.devices()[0].platform == "cpu"
    flat, sz, anch = vector_literals(
        jnp.asarray(X), jnp.asarray(mask_words), jnp.asarray(codes_packed),
        jnp.asarray(lens), jnp.asarray(np.ones(B, bool)), LIT_CAP,
        emulate=emulate, interpret=interp)
    flat = np.asarray(flat).view(np.uint8).reshape(B, -1)
    sz = np.asarray(sz)
    anch = np.asarray(anch)
    for i in range(B):
        np.testing.assert_array_equal(sz[i], x_sizes[i],
                                      err_msg=f"row {i} sizes")
        tot = int(x_sizes[i].sum())
        np.testing.assert_array_equal(
            flat[i, :tot], x_stream[i, :tot], err_msg=f"row {i} stream")
        s123 = (int(lit_count[i]) + 3) >> 2
        cnts = [s123, s123, s123, int(lit_count[i]) - 3 * s123]
        for s4 in range(4):
            na = max(0, -(-cnts[s4] // 512) - 1)
            np.testing.assert_array_equal(
                anch[i, s4, :na], x_anch[i, s4, :na],
                err_msg=f"row {i} stream {s4} anchors")
            assert (anch[i, s4, na:] == -1).all()


def test_vector_literals_emulate_text():
    _check(["text", "skewed"], emulate=True)


def test_vector_literals_kernel_interpret():
    try:
        _check(["text"], emulate=False)
    except NotImplementedError as e:
        pytest.skip(f"pallas interpret gap: {e}")
