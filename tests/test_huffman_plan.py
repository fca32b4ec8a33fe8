"""Device-side Huffman planner (ops/huffman_plan.py) properties.

The planner replaces host package-merge on the TPU chain, so its tables
must be (a) Kraft-exact — zstd weight serialization requires the weight
sum to complete a power of two (RFC 8878 §4.2.1) — and (b) canonical-code
compatible with the host implementation bit-for-bit.  Ratio is allowed to
trail package-merge slightly (measured ~0.06 % mean); conformance is
checked end-to-end by test_zstd via stock libzstd.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from libzseek_tpu import native
from libzseek_tpu.ops import huffman
from libzseek_tpu.ops import huffman_plan as hp


def _hists(rng):
    out = []
    for t in range(24):
        kind = t % 6
        h = np.zeros(256, np.int64)
        if kind == 0:
            h[:] = rng.integers(0, 1000, 256)
        elif kind == 1:
            syms = rng.choice(256, rng.integers(2, 30), replace=False)
            h[syms] = rng.integers(1, 100000, len(syms))
        elif kind == 2:
            z = (rng.zipf(1.5, 50000).clip(1, 256) - 1)
            h = np.bincount(z, minlength=256)[:256].astype(np.int64)
        elif kind == 3:
            h[rng.integers(0, 256)] = 12345         # single symbol
        elif kind == 4:
            h[:] = rng.integers(1, 10, 256)          # near-flat
        else:
            h[128:] = rng.integers(1, 500, 128)      # high symbols only
        out.append(h.astype(np.int32))
    return np.stack(out)


def test_kraft_exact_and_canonical(rng):
    H = _hists(rng)
    k = np.asarray(hp.assign_kraft(jnp.asarray(H)))
    lengths, codes, weights, max_bits = [
        np.asarray(a) for a in hp.canonical_from_kraft(jnp.asarray(k))]
    for i, h in enumerate(H):
        if np.count_nonzero(h) < 2:
            assert k[i].sum() == 0
            continue
        kraft = np.sum(np.where(lengths[i] > 0,
                                2.0 ** (11 - lengths[i]), 0))
        assert kraft == 2048, i
        assert np.all((h > 0) == (lengths[i] > 0)), i
        assert lengths[i].max() <= 11
        ct = huffman._canonical_codes(lengths[i])
        assert np.array_equal(ct.codes, codes[i]), i
        assert ct.max_bits == max_bits[i], i


def test_weights_roundtrip_and_trees(rng):
    H = _hists(rng)
    k = hp.assign_kraft(jnp.asarray(H))
    lengths, codes, weights, _ = [np.asarray(a)
                                  for a in hp.canonical_from_kraft(k)]
    packed = np.asarray(hp.pack_weights(jnp.asarray(weights)))
    assert np.array_equal(hp.unpack_weights(packed),
                          weights.astype(np.uint8))
    trees = native.huf_tree_batch(weights.astype(np.uint8))
    for i, h in enumerate(H):
        if np.count_nonzero(h) < 2:
            continue
        assert trees[i] is not None, i
        wrt, consumed = huffman.read_weights(trees[i], 0)
        assert consumed == len(trees[i]), i
        ct = huffman.ctable_from_weights(wrt)
        assert np.array_equal(ct.lengths, lengths[i]), i
        assert np.array_equal(ct.codes, codes[i]), i


def test_ratio_near_package_merge(rng):
    H = _hists(rng)
    k = hp.assign_kraft(jnp.asarray(H))
    lengths = np.asarray(hp.canonical_from_kraft(k)[0])
    worst = 1.0
    for i, h in enumerate(H):
        if np.count_nonzero(h) < 2:
            continue
        opt = huffman.build_ctable(h)
        b_opt = int(np.sum(h * opt.lengths))
        b_our = int(np.sum(h * lengths[i]))
        worst = max(worst, b_our / max(b_opt, 1))
    assert worst < 1.05, worst


def test_plan_modes(rng):
    from libzseek_tpu.ops import pallas_entropy as pe
    N = 131072
    rows = {
        "zeros": np.zeros(N, np.uint8),                       # rleblock
        "noise": rng.integers(0, 256, N, np.uint8),           # skip (raw)
        "text": rng.choice(np.frombuffer(b"abcdefgh ", np.uint8),
                           N).astype(np.uint8),               # huf
    }
    hist = np.zeros((3, 256), np.int32)
    for i, v in enumerate(rows.values()):
        hist[i] = np.bincount(v, minlength=256)
    lit_count = np.array([0, N, N], np.int32)
    n_seq = np.array([1, 0, 0], np.int32)
    const = np.array([0, -1, -1], np.int32)
    lens = np.array([N, N, N], np.int32)
    hist[0] = 0  # rleblock row: all matched, no literals
    mode, mode_bits, codes_packed, wpk, rle, _sz4 = hp.plan_blocks(
        jnp.asarray(hist), jnp.asarray(lit_count), jnp.asarray(n_seq),
        jnp.asarray(const), jnp.asarray(lens), mode_huf=pe.MODE_HUF,
        mode_huf1=pe.MODE_HUF1, mode_rawlit=pe.MODE_RAWLIT,
        mode_seq=pe.MODE_SEQ)
    mode = np.asarray(mode)
    assert mode[0] == hp.M_RLEBLOCK
    assert mode[1] == hp.M_SKIP
    assert mode[2] == hp.M_HUF
