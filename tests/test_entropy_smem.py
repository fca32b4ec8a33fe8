"""Fused SMEM entropy kernel (ops/pallas_entropy.py) — interpret-mode
conformance: bit-identical with the XLA entropy kernels, and the codec's
smem path golden-decodes.  (Real-TPU compilation is exercised by bench.py
and the TPU validation tools.)"""

import numpy as np
import jax.numpy as jnp
import pytest

from libzseek_tpu.ops import huffman
from libzseek_tpu.ops.pallas_entropy import (MODE_HUF, MODE_RAWLIT, MODE_SEQ,
                                             entropy_emit_smem)
from libzseek_tpu.ops.zstd_encode import (fse_encode_sequences,
                                          huffman_encode_literals,
                                          zstd_sequences)
from libzseek_tpu.runtime.zstd_codec import ZstdCodec
from libzseek_tpu.testing import golden
from libzseek_tpu.testing.corpus import mixed_corpus


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(17)


def test_kernel_matches_xla(rng):
    N = 2048
    t = rng.choice(np.frombuffer(b"a small vocabulary of words ", np.uint8),
                   N).astype(np.uint8)
    t[600:800] = t[100:300]
    z = rng.integers(0, 256, N).astype(np.uint8)
    z[1024:1124] = z[0:100]
    X = np.stack([t, z])
    lens = np.full((2,), N, np.int32)
    seqs = zstd_sequences(jnp.asarray(X), jnp.asarray(lens))
    ll, ml, offv = (np.asarray(seqs[k]) for k in ("ll", "ml", "offv"))
    n_seq = np.asarray(seqs["n_seq"])
    lit_count = np.asarray(seqs["lit_count"])
    hist = np.asarray(seqs["hist"])
    code_vals = np.zeros((2, 256), np.int32)
    code_bits = np.zeros((2, 256), np.int32)
    ct = huffman.build_ctable(hist[0])
    code_vals[0], code_bits[0] = ct.codes, ct.lengths
    modes = np.array([MODE_HUF | MODE_SEQ, MODE_RAWLIT | MODE_SEQ], np.int32)
    lc_huf = np.where(modes & MODE_HUF, lit_count, 0).astype(np.int32)
    LIT_CAP = N + 128
    hx = huffman_encode_literals(
        jnp.asarray(seqs["literals"]), jnp.asarray(lc_huf),
        jnp.asarray(code_vals), jnp.asarray(code_bits), LIT_CAP,
        anchor_interval=512)
    S = int(ll.shape[1])
    SEQ_CAP = 11 * S // 8 + 128
    SEQ_CAP += (-SEQ_CAP) % 4
    fx = fse_encode_sequences(jnp.asarray(ll), jnp.asarray(ml),
                              jnp.asarray(offv), jnp.asarray(n_seq), SEQ_CAP,
                              smax=S, anchor_interval=128)
    # exact per-stream sizes (what huffman_plan.plan_blocks derives from
    # hist_q): position the kernel's lockstep streams, and must agree
    # with what the XLA encoder actually produced
    sizes4 = np.zeros((2, 4), np.int32)
    lits0 = np.asarray(seqs["literals"])[0, : int(lit_count[0])]
    q = (len(lits0) + 3) >> 2
    for k in range(4):
        part = lits0[k * q: len(lits0) if k == 3 else (k + 1) * q]
        sizes4[0, k] = (int(code_bits[0][part].sum()) + 1 + 7) >> 3
    meta = np.concatenate(
        [np.stack([lens, lit_count, n_seq, modes], axis=1), sizes4],
        axis=1).astype(np.int32)
    codes_packed = ((code_vals << 4) | code_bits).astype(np.int32)
    k_lit, k_seq, k_osz, k_lanch, k_sanch = entropy_emit_smem(
        jnp.asarray(X), jnp.asarray(ll), jnp.asarray(ml), jnp.asarray(offv),
        jnp.asarray(meta), jnp.asarray(codes_packed), S, LIT_CAP, SEQ_CAP,
        interpret=True)
    k_lit = np.asarray(k_lit).view(np.uint8).reshape(2, -1)
    k_seq = np.asarray(k_seq).view(np.uint8).reshape(2, -1)
    k_osz = np.asarray(k_osz)
    # huf row: sizes + stream bytes + anchors identical to XLA
    xs4 = np.asarray(hx[1])[0]
    assert np.array_equal(xs4, k_osz[0, :4])
    tot = int(xs4.sum())
    assert np.array_equal(np.asarray(hx[0])[0, :tot], k_lit[0, :tot])
    s123 = (int(lit_count[0]) + 3) >> 2
    na = max(0, -(-s123 // 512) - 1)
    assert np.array_equal(np.asarray(hx[2])[0, 0, :na],
                          np.asarray(k_lanch)[0, 0, :na])
    # raw row: literal bytes verbatim
    lc1 = int(lit_count[1])
    assert np.array_equal(np.asarray(seqs["literals"])[1, :lc1],
                          k_lit[1, :lc1])
    # sequence streams identical for both rows
    xs_sizes = np.asarray(fx[1])
    for i in range(2):
        if int(n_seq[i]) == 0:
            continue
        assert xs_sizes[i] == k_osz[i, 4]
        t2 = int(xs_sizes[i])
        assert np.array_equal(np.asarray(fx[0])[i, :t2], k_seq[i, :t2])
        na = max(0, -(-int(n_seq[i]) // 128) - 1)
        assert np.array_equal(np.asarray(fx[2][0])[i, :na],
                              np.asarray(k_sanch)[i, 0, :na])


def test_codec_smem_path_golden(rng):
    data = mixed_corpus(rng, 96 * 1024).tobytes()
    frames_in = [data[: 48 * 1024], data[48 * 1024:]]
    codec = ZstdCodec(entropy="smem")
    frames, fhints = codec.compress_frames(frames_in, return_hints=True)
    for fin, fr in zip(frames_in, frames):
        assert golden.zstd_frame_decompress(fr, len(fin)) == fin
    outs = codec.decompress_frames(frames, [len(f) for f in frames_in],
                                   frame_hints=fhints)
    assert all(o == f for o, f in zip(outs, frames_in))
    # byte-identical with the XLA entropy path
    frames2 = ZstdCodec(entropy="xla").compress_frames(frames_in)
    assert frames == frames2
