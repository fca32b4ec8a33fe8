"""Fused LZ4 SMEM kernel (ops/pallas_lz4.py) — interpret-mode conformance:
linked blocks with shared context rows must golden-decode through stock
liblz4 (via LZ4F frame assembly) and match the block-level oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from libzseek_tpu.format import lz4f
from libzseek_tpu.ops.lz4_encode import lz4_compress_bound
from libzseek_tpu.ops.pallas_lz4 import lz4_emit_blocks_smem
from libzseek_tpu.testing import golden

BK = 4096  # small blocks keep interpret mode fast


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(23)
    s = rng.choice(np.frombuffer(b"a modest shared vocabulary ", np.uint8),
                   3 * BK).astype(np.uint8)
    s[BK + 100: BK + 400] = s[50: 350]          # cross-block reference
    s[2 * BK + 10: 2 * BK + 200] = s[2 * BK - 150: 2 * BK + 40]
    return s


def test_linked_blocks_golden(stream):
    B = 3
    D = np.zeros((B + 1, BK), np.uint8)
    for i in range(B):
        D[i + 1] = stream[i * BK: (i + 1) * BK]
    dlens = np.full((B,), 2 * BK, np.int32)
    # absolute min_ref: block 0 starts the frame (no context), the rest
    # may reference their predecessor row
    dminr = np.array([BK, BK, 2 * BK], np.int32)
    cap = lz4_compress_bound(BK)
    cap += (-cap) % 128
    out, olen = lz4_emit_blocks_smem(
        jnp.asarray(D), jnp.asarray(dlens), jnp.asarray(dminr), cap,
        block_bytes=BK, interpret=True)
    out = np.asarray(out).view(np.uint8).reshape(B, -1)
    olen = np.asarray(olen)
    blocks = [(out[i, : olen[i]].tobytes(), False) for i in range(B)]
    frame = lz4f.assemble_frame(blocks, 3 * BK, block_independent=False)
    assert bytes(golden.lz4f_decompress(frame)) == stream.tobytes()


def test_block_without_context_matches_oracle(stream):
    # single independent block: decoded bytes must round-trip and the
    # compressed size must be sane vs liblz4's own encoder
    D = np.zeros((2, BK), np.uint8)
    D[1] = stream[:BK]
    out, olen = lz4_emit_blocks_smem(
        jnp.asarray(D), jnp.asarray(np.array([2 * BK], np.int32)),
        jnp.asarray(np.array([BK], np.int32)),
        lz4_compress_bound(BK) + (-lz4_compress_bound(BK)) % 128,
        block_bytes=BK, interpret=True)
    comp = np.asarray(out).view(np.uint8).reshape(1, -1)[0]
    comp = comp[: int(np.asarray(olen)[0])].tobytes()
    ref = golden.lz4_block_compress(stream[:BK].tobytes())
    assert len(comp) <= int(len(ref) * 1.1) + 16
    frame = lz4f.assemble_frame([(comp, False)], BK, block_independent=True)
    assert bytes(golden.lz4f_decompress(frame)) == stream[:BK].tobytes()


def test_hc_levels_golden_and_monotone(stream):
    """HC level params (LZ4Codec._level_params: lazy probing + disabled
    miss accelerator for compression_level >= 3, the reference's LZ4HC
    arm) must stay golden-decodable and never compress worse than the
    default arm."""
    from libzseek_tpu.runtime.codec import LZ4Codec

    B = 3
    D = np.zeros((B + 1, BK), np.uint8)
    for i in range(B):
        D[i + 1] = stream[i * BK: (i + 1) * BK]
    dlens = np.full((B,), 2 * BK, np.int32)
    dminr = np.array([BK, BK, 2 * BK], np.int32)
    cap = lz4_compress_bound(BK)
    cap += (-cap) % 128
    sizes = {}
    for lvl in (0, 3, 9):
        p = LZ4Codec._level_params(lvl)
        out, olen = lz4_emit_blocks_smem(
            jnp.asarray(D), jnp.asarray(dlens), jnp.asarray(dminr), cap,
            block_bytes=BK, interpret=True, **p)
        out = np.asarray(out).view(np.uint8).reshape(B, -1)
        olen = np.asarray(olen)
        blocks = [(out[i, : olen[i]].tobytes(), False) for i in range(B)]
        frame = lz4f.assemble_frame(blocks, 3 * BK,
                                    block_independent=False)
        assert bytes(golden.lz4f_decompress(frame)) == stream.tobytes(), lvl
        sizes[lvl] = int(olen.sum())
    assert sizes[3] <= sizes[0] and sizes[9] <= sizes[3], sizes
