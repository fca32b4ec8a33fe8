"""Linked-block gated zstd parse tests (interpret mode — the TPU path is
the same kernel; real-chip validation via tools/zstd_ratio.py).

The kernel's contract: sequences tile each block left-to-right, every match
reproduces its source bytes from the logical [previous block | block]
window, sources never cross min_abs (frame/batch fences), and the
profitability gate drops matches whose bit cost exceeds their literal
entropy cost.
"""

import numpy as np
import pytest

from libzseek_tpu.ops.pallas_match import zstd_parse_linked_smem
from libzseek_tpu.testing.corpus import text_corpus

N = 16384


@pytest.fixture(scope="module")
def linked_batch(rng):
    # frame A = blocks 0..2 (linked), frame B = block 3; B's content is a
    # copy of A's last block to tempt illegal cross-frame matches.  Random
    # (unique) content so each block's prefix can only match the previous
    # block, never itself.
    a0 = rng.integers(0, 256, N, np.uint8).astype(np.uint8)
    a1 = np.concatenate(
        [a0[N // 2:], rng.integers(0, 256, N // 2, np.uint8)]).astype(np.uint8)
    a2 = np.concatenate(
        [a1[N // 2:], rng.integers(0, 256, N // 2, np.uint8)]).astype(np.uint8)
    b0 = a2.copy()
    x2 = np.stack([np.zeros(N, np.uint8), a0, a1, a2, b0])
    lens = np.full((4,), N, np.int32)
    min_abs = np.array([1 * N, 1 * N, 2 * N, 4 * N], np.int32)
    return x2, lens, min_abs


def _parse(x2, lens, min_abs, h16=None):
    import jax.numpy as jnp
    if h16 is None:
        h16 = np.full((len(lens),), 64, np.int32)  # H = 4 bits/byte
    out = zstd_parse_linked_smem(
        jnp.asarray(x2), jnp.asarray(lens), jnp.asarray(min_abs),
        jnp.asarray(h16), interpret=True)
    return [np.asarray(a) for a in out]


def test_linked_sequences_valid(linked_batch):
    x2, lens, min_abs = linked_batch
    ll, ml, off, n_seq, cover, _m = _parse(x2, lens, min_abs)
    assert n_seq.sum() > 0
    for i in range(4):
        window = np.concatenate([x2[i], x2[i + 1]])  # [prev | cur]
        pos = 0
        saw_cross = False
        for j in range(n_seq[i]):
            p = pos + ll[i, j]          # block-relative match start
            dist = off[i, j] - 3
            l = ml[i, j]
            assert dist > 0 and l >= 4
            pw = N + p                   # window coords
            src = pw - dist
            assert src >= 0
            # min_abs fence: absolute source must be referenceable
            src_abs = (i + 1) * N + p - dist
            assert src_abs >= min_abs[i], (i, j, src_abs, min_abs[i])
            assert np.array_equal(window[pw: pw + l], window[src: src + l])
            saw_cross |= src < N
            pos = p + l
        assert pos == cover[i] <= N
        if i in (1, 2):  # non-first blocks of frame A share prefix content
            assert saw_cross, f"block {i} found no cross-block match"


def test_frame_fence_blocks_cross_frame_matches(linked_batch):
    x2, lens, min_abs = linked_batch
    ll, ml, off, n_seq, _, _m = _parse(x2, lens, min_abs)
    # block 3 (frame B) equals block 2 (frame A's tail) byte-for-byte, but
    # the fence must keep all its sources inside itself
    for j in range(n_seq[3]):
        pass  # per-sequence min_abs assertion runs in the test above
    # ... and the first block of frame A can only reference itself
    pos = 0
    for j in range(n_seq[0]):
        p = pos + ll[0, j]
        assert p - (off[0, j] - 3) >= 0
        pos = p + ll[0, j] - ll[0, j] + ml[0, j] + 0
        pos = p + ml[0, j]


def test_gate_drops_unprofitable_matches(rng):
    # random bytes with H=8: every surviving sequence must satisfy the
    # in-kernel gate (ml >= min_match and ml*H16 > (gate+ebits)*16)
    from libzseek_tpu.ops.zstd_encode import GATE_FIXED_BITS
    noise = rng.integers(0, 256, N, np.uint8).astype(np.uint8)
    x2 = np.stack([np.zeros(N, np.uint8), noise])
    lens = np.array([N], np.int32)
    min_abs = np.array([N], np.int32)
    h16 = np.array([128], np.int32)
    ll, ml, off, n_seq, cover, _m = _parse(x2, lens, min_abs, h16)
    for j in range(n_seq[0]):
        ebits = int(np.floor(np.log2(off[0, j])))
        assert ml[0, j] >= 5
        assert ml[0, j] * 128 > (GATE_FIXED_BITS + ebits) * 16


def test_short_and_empty_rows(rng):
    x2 = np.zeros((3, N), np.uint8)
    x2[1, :100] = rng.integers(0, 256, 100, np.uint8)
    lens = np.array([100, 0], np.int32)
    min_abs = np.array([N, 2 * N], np.int32)
    ll, ml, off, n_seq, cover, _m = _parse(x2, lens, min_abs)
    assert n_seq[1] == 0 and cover[1] == 0
    assert cover[0] <= 100


def test_level_ladder_coverage_and_validity(rng):
    """Level-indexed search effort (ops/zstd_encode.level_search_params,
    the analog of /root/reference/src/compress.c:73-90).  Two fenced
    blocks probe the two level axes: noise with planted 5-byte repeats
    separates min_match 6 (L1) from 5 (L3+); zipf-word text rewards the
    lazy/dual probing of L9/L19 with longer matches at the same or lower
    sequence count.  Sequences must stay valid under lazy probing."""
    import jax.numpy as jnp

    from libzseek_tpu.ops.zstd_encode import level_search_params

    # block A: noise + DENSE planted 5-byte matches at short range (gate
    # passes ml=5 at H=8; only min_match separates levels here).  Dense
    # planting keeps the miss accelerator reset/halved at every level, so
    # the probe stride stays fine-grained and the comparison is robust to
    # the probe-loop width
    a = rng.integers(0, 256, N, np.uint8).astype(np.uint8)
    for k in range(160):
        p0 = 64 + 96 * k
        a[p0 + 40: p0 + 45] = a[p0: p0 + 5]
    # block B: zipf-word text (dense overlapping candidates)
    vocab = [rng.integers(97, 123, rng.integers(3, 11), np.uint8).tobytes()
             for _ in range(200)]
    probs = (1.0 / np.arange(1, 201)) ** 1.1
    probs /= probs.sum()
    words = rng.choice(200, 6000, p=probs)
    b = np.frombuffer(b" ".join(vocab[w] for w in words)[:N],
                      np.uint8).copy()

    x2 = np.stack([np.zeros(N, np.uint8), a, b])
    lens = np.array([N, N], np.int32)
    min_abs = np.array([N, 2 * N], np.int32)  # fenced: no cross-block
    h16 = np.array([128, 58], np.int32)

    cov = {}
    est = {}
    for lvl in (1, 3, 9, 19):
        prm = level_search_params(lvl)
        ll, ml, off, n_seq, cover, _m = [np.asarray(v) for v in
                                     zstd_parse_linked_smem(
            jnp.asarray(x2), jnp.asarray(lens), jnp.asarray(min_abs),
            jnp.asarray(h16), interpret=True, **prm)]
        tot_cov = 0
        tot_bits = 0.0
        for i in range(2):
            window = np.concatenate([x2[i], x2[i + 1]])
            pos = 0
            for j in range(n_seq[i]):
                pst = pos + ll[i, j]
                dist = off[i, j] - 3
                l = ml[i, j]
                assert dist > 0 and l >= prm["min_match"]
                src = N + pst - dist
                assert src >= 0
                assert np.array_equal(window[N + pst: N + pst + l],
                                      window[src: src + l]), (lvl, i, j)
                pos = pst + l
                tot_bits += 14 + np.floor(np.log2(max(1, dist)))
            ns = int(n_seq[i])
            c = int(ml[i, :ns].sum())
            tot_cov += c
            tot_bits += (N - c) * h16[i] / 16.0
        cov[lvl] = tot_cov
        est[lvl] = tot_bits
    # min_match: L1 must find strictly less than L3+
    assert cov[1] < cov[3], (cov, est)
    # lazy/dual: higher levels estimate at or below lower levels, with a
    # real improvement somewhere in the ladder
    assert est[3] <= est[1] and est[9] <= est[3] and est[19] <= est[9], est
    assert est[19] < est[1], est
