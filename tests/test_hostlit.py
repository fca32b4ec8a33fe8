"""Host-side Huffman literal decode (native zn_huf_decode_batch) — the
decode escape hatch's literal half: must reproduce lanes bit-exactly and
feed the transcode path to correct end-to-end output."""

from __future__ import annotations

import numpy as np
import pytest

from libzseek_tpu import native
from libzseek_tpu.ops import huffman

pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason="native library not built")


def _encode_lane(lits: np.ndarray, ct) -> bytes:
    acc = nb = 0
    out = bytearray()
    for s in lits[::-1]:
        v, l = int(ct.codes[s]), int(ct.lengths[s])
        acc |= v << nb
        nb += l
        while nb >= 8:
            out.append(acc & 255)
            acc >>= 8
            nb -= 8
    acc |= 1 << nb
    nb += 1
    while nb > 0:
        out.append(acc & 255)
        acc >>= 8
        nb -= 8
    return bytes(out)


def test_huf_decode_batch_lanes():
    rng = np.random.default_rng(0)
    streams = []
    metas = []
    outs = []
    expected = []
    weights = []
    spos = opos = 0
    for t in range(5):
        n = int(rng.integers(3, 9000))
        lits = rng.choice(np.frombuffer(b"abcdefgh  eetther0123", np.uint8),
                          n).astype(np.uint8)
        hist = np.bincount(lits, minlength=256)
        if (hist > 0).sum() < 2:
            continue
        ct = huffman.build_ctable(hist)
        st = _encode_lane(lits, ct)
        w = np.zeros(256, np.int32)
        used = ct.lengths > 0
        w[used] = ct.max_bits + 1 - ct.lengths[used]
        weights.append(w)
        streams.append(st)
        metas.append((spos, len(st), n, len(weights) - 1))
        outs.append(opos)
        expected.append(lits)
        spos += len(st)
        opos += n
    dec = native.huf_decode_batch(
        b"".join(streams), np.asarray(metas, np.int64),
        np.stack(weights), opos, np.asarray(outs, np.int64))
    assert dec is not None
    for (o, lits) in zip(outs, expected):
        np.testing.assert_array_equal(dec[o: o + len(lits)], lits)


def test_huf_decode_batch_rejects_garbage():
    w = np.zeros((1, 256), np.int32)
    w[0, 0] = 1
    w[0, 1] = 1
    meta = np.array([[0, 2, 10, 0]], np.int64)
    # zero last byte = missing sentinel -> lane rejected
    assert native.huf_decode_batch(b"\x00\x00", meta, w, 10,
                                   np.array([0], np.int64)) is None


def test_transcode_roundtrip_hostlit(monkeypatch):
    """End-to-end: our encoder's frames through the transcode decode path
    with host literal decode on and off must agree."""
    import jax
    if jax.devices()[0].platform == "cpu":
        from libzseek_tpu.runtime.zstd_codec import ZstdCodec
        rng = np.random.default_rng(1)
        base = np.frombuffer(b"the quick brown fox jumps over a dog ",
                             np.uint8)
        data = rng.choice(base, 1 << 18).astype(np.uint8).tobytes()
        codec = ZstdCodec(parser="linked", entropy="smem")
        frames, fh = codec.compress_frames([data], return_hints=True)
        for flag in ("on", "off"):
            monkeypatch.setenv("ZN_HOSTLIT", flag)
            out = codec.decompress_frames(frames, [len(data)],
                                          frame_hints=fh)
            assert out[0] == data, f"ZN_HOSTLIT={flag}"
