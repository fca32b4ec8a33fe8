"""SMEM hash-probe parser tests (interpret mode — the TPU path is the
same kernel; real-chip validation happens via tools/zstd_ratio.py).

Every emitted sequence must be a real match (bytes at p equal bytes at
p-off for ml bytes), sequences must tile the block left-to-right, and the
XLA tail (_fast_post) must yield a container that stock libzstd decodes.
"""

import numpy as np
import pytest

from libzseek_tpu.ops.pallas_match import hash_parse_blocks_smem
from libzseek_tpu.testing import golden
from libzseek_tpu.testing.corpus import mixed_corpus, text_corpus

N = 16384


@pytest.fixture(scope="module")
def batch(rng):
    rows = [
        text_corpus(rng, N),
        mixed_corpus(rng, N),
        np.zeros(N, np.uint8),
        np.tile(rng.integers(0, 256, 337, np.uint8), N // 337 + 1)[:N],
    ]
    return np.stack(rows)


def test_sequences_are_valid_matches(batch):
    import jax.numpy as jnp
    lens = np.full((batch.shape[0],), N, np.int32)
    ll, ml, off, n_seq, cover = hash_parse_blocks_smem(
        jnp.asarray(batch), jnp.asarray(lens), interpret=True)
    ll, ml, off = np.asarray(ll), np.asarray(ml), np.asarray(off)
    n_seq, cover = np.asarray(n_seq), np.asarray(cover)
    for i in range(batch.shape[0]):
        pos = 0
        for j in range(n_seq[i]):
            p = pos + ll[i, j]
            o = off[i, j] - 3
            l = ml[i, j]
            assert o > 0 and p - o >= 0 and l >= 4
            assert np.array_equal(batch[i, p:p + l], batch[i, p - o:p - o + l])
            pos = p + l
        assert pos == cover[i] <= N


def test_long_runs_collapse(batch):
    import jax.numpy as jnp
    lens = np.full((batch.shape[0],), N, np.int32)
    _, ml, _, n_seq, _ = hash_parse_blocks_smem(
        jnp.asarray(batch), jnp.asarray(lens), interpret=True)
    # zeros row: a single sequence covering ~everything
    assert int(np.asarray(n_seq)[2]) == 1
    assert int(np.asarray(ml)[2, 0]) >= N - 16


@pytest.mark.skipif(not golden.have_zstd(), reason="no libzstd")
def test_fast_post_roundtrip(batch, monkeypatch):
    """ZstdCodec with the hash parser (interpret mode) emits frames stock
    libzstd decodes bit-exact."""
    import functools

    import libzseek_tpu.ops.zstd_encode as ze
    from libzseek_tpu.ops import pallas_match as pm
    from libzseek_tpu.runtime.zstd_codec import ZstdCodec

    monkeypatch.setattr(
        pm, "hash_parse_blocks_smem",
        functools.partial(pm.hash_parse_blocks_smem, interpret=True))
    codec = ZstdCodec(parser="hash")
    raw = batch[1].tobytes()
    frame = codec.compress_frames([raw])[0]
    assert golden.zstd_decompress(frame) == raw
