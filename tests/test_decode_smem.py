"""Fused SMEM decode kernel (ops/pallas_decode.py) — interpret-mode
conformance: the single-dispatch decode path must produce the same bytes
as the XLA decode passes on both our encoder's archives and stock-libzstd
frames, and report failures (not wrong bytes) for anything outside its
limits.  (Real-TPU compilation is exercised by bench.py / tools/.)"""

import os

import numpy as np
import pytest

from libzseek_tpu.ops.zstd_decode import decode_frames
from libzseek_tpu.runtime.zstd_codec import ZstdCodec
from libzseek_tpu.testing import golden
from libzseek_tpu.testing.corpus import mixed_corpus, text_corpus


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(91)


@pytest.fixture(autouse=True, params=["transcode", "exec"])
def _force_smem(monkeypatch, request):
    """Run every case through both fused arms: transcode (device entropy +
    host zn_zir_execute) and in-kernel execution (the device-resident
    path)."""
    monkeypatch.setenv("ZN_DECODE_SMEM", "force")
    monkeypatch.setenv("ZN_DECODE_TRANSCODE",
                       "auto" if request.param == "transcode" else "off")


def _cases(rng, n=24 * 1024):
    return {
        "text": text_corpus(rng, n).tobytes(),
        "periodic": (rng.integers(0, 256, 337, np.uint8).tobytes()
                     * (n // 337 + 1))[:n],
        "zeros": bytes(n),
        "noise": rng.integers(0, 256, n, np.uint8).tobytes(),
        "tiny": b"abcabcabcabc",
        "one": b"x",
        "empty": b"",
    }


def test_roundtrip_own_encoder(rng):
    cases = _cases(rng)
    codec = ZstdCodec()
    frames = codec.compress_frames(list(cases.values()))
    outs = decode_frames(frames, [len(v) for v in cases.values()])
    for (name, raw), out in zip(cases.items(), outs):
        assert out == raw, name


def test_multiblock_linked(rng):
    # 3 blocks with cross-block matches exercises the persistent ring and
    # the cross-block repcode chain in one frame
    raw = mixed_corpus(rng, 300 * 1024).tobytes()
    raw = raw[:150 * 1024] + raw[:100 * 1024] + raw[150 * 1024:]
    raw = raw[:300 * 1024]
    codec = ZstdCodec()
    fr = codec.compress_frames([raw])[0]
    out = decode_frames([fr], [len(raw)])[0]
    assert out == raw


@pytest.mark.skipif(not golden.have_zstd(), reason="libzstd unavailable")
def test_golden_frames(rng):
    cases = _cases(rng)
    for level in (1, 3, 19):
        frames = [golden.zstd_compress(v, level=level)
                  for v in cases.values() if v]
        sizes = [len(v) for v in cases.values() if v]
        outs = decode_frames(frames, sizes)
        for raw, out in zip((v for v in cases.values() if v), outs):
            assert out == raw, level


@pytest.mark.skipif(not golden.have_zstd(), reason="libzstd unavailable")
def test_golden_multiblock_multiframe_batch(rng):
    raws = [
        (text_corpus(rng, 150 * 1024).tobytes() + bytes(100 * 1024)
         + rng.integers(0, 256, 80 * 1024, np.uint8).tobytes()),
        text_corpus(rng, 200 * 1024).tobytes(),
    ]
    frames = [golden.zstd_compress(r, level=3) for r in raws]
    outs = decode_frames(frames, [len(r) for r in raws])
    for raw, out in zip(raws, outs):
        assert out == raw


def test_device_resident_output(rng):
    raw = mixed_corpus(rng, 64 * 1024).tobytes()
    codec = ZstdCodec()
    fr = codec.compress_frames([raw])[0]
    outs = decode_frames([fr], [len(raw)], to_device=True)
    arr = np.asarray(outs[0])
    assert arr.tobytes() == raw


def test_transcode_chunk_split_large_frame(rng):
    """A frame larger than ZN_DECODE_CHUNK blocks must split into
    pipelined chunks (mid-frame splits ride the hint-backed block-local
    rep invariant) and still decode bit-exact."""
    os.environ["ZN_DECODE_CHUNK"] = "2"
    try:
        raw = mixed_corpus(rng, 768 * 1024).tobytes()
        codec = ZstdCodec()
        fr, fh = codec.compress_frames([raw], return_hints=True)
        out = decode_frames([fr[0]], [len(raw)], hints=[fh[0]])[0]
        assert out == raw
    finally:
        os.environ.pop("ZN_DECODE_CHUNK", None)


def test_foreign_long_window_frame(rng):
    """Stock zstd with a multi-MiB window produces offsets beyond the
    exec path's 128 KiB ring; the transcode path (28-bit token offsets)
    or the XLA fallback must still decode it."""
    blk = rng.integers(0, 256, 400 * 1024, np.uint8).tobytes()
    raw = blk + bytes(16) + blk   # match at distance ~400 KiB
    fr = golden.zstd_compress(raw, level=19, strategy=None)
    assert decode_frames([fr], [len(raw)])[0] == raw
