"""Device-side Huffman table construction + literal-mode planning.

Why this exists: the encode pipeline's critical path used to be
  parse (device) -> fetch histograms (tunnel RT) -> package-merge tables
  (host) -> entropy kernel (device)
which stalls the device between parse and entropy and lets later batches'
parses jump the queue (queue inversion).  This module builds the literal
Huffman tables and all per-block mode decisions ON DEVICE, so the whole
chain parse -> plan -> entropy -> compact is dispatched in one go at submit
time and the host only fetches finished payloads.

Table construction is a vectorized Kraft-exact assignment rather than
package-merge: initial code lengths are rounded from the scaled histogram
(k = round-to-power-of-two of count * 2048 / total), then a repair loop
doubles/halves per-symbol Kraft budgets until every row's budget sums to
exactly 2^11 — the validity condition zstd's weight serialization demands
(sum of 2^(weight-1) must be a power of two, RFC 8878 §4.2.1; reference
conformance via libzstd linking, /root/reference/src/compress.c:666).
Rows the loop cannot repair fall back to the always-valid balanced code.
Measured cost: ~0.5 % compressed-size vs package-merge, for zero host time
and no tunnel round trip.

Canonical code values follow HUF_buildCTable's valPerRank scheme exactly
(same construction as ops/huffman._canonical_codes, vectorized).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_BITS = 11
TAB = 1 << MAX_BITS          # Kraft budget in 2^-11 units

# literal-section modes (host codes, fetched for assembly)
M_SKIP = 0      # block certain to be stored raw: no streams at all
M_RLEBLOCK = 1  # whole block is one repeated byte -> RLE block
M_NONE = 2      # no literals (lit section empty)
M_RLE = 3       # single literal byte value -> RLE literal section
M_RAW = 4       # raw literal bytes
M_HUF = 5       # 4-stream Huffman literals
M_HUF1 = 6      # 1-stream Huffman literals (lit set < 256 bytes)


def _floor_log2(x):
    return 31 - jax.lax.clz(jnp.maximum(x, 1).astype(jnp.int32))


@jax.jit
def assign_kraft(hist: jnp.ndarray) -> jnp.ndarray:
    """hist: (B, 256) int32 -> per-symbol Kraft budgets k (B, 256) int32,
    each a power of two in [1, 1024] for used symbols (0 unused), with
    sum(k) == 2048 per row.  Code length = 11 - log2(k).

    Rows with < 2 used symbols return k = 0 (callers handle RLE/none)."""
    B = hist.shape[0]
    hist = hist.astype(jnp.int32)
    used = hist > 0
    m = jnp.sum(used.astype(jnp.int32), axis=1)
    total = jnp.sum(hist, axis=1, keepdims=True)
    multi = (m >= 2)[:, None]

    # initial: k = floor power of two of count * 2048 / total — always
    # under-budget except for the min-1 bump of sub-2^-11 symbols, so the
    # repair loop mostly GROWS, spending the leftover budget greedily
    scaled = (hist * TAB // jnp.maximum(total, 1)).astype(jnp.int32)
    scaled = jnp.maximum(scaled, 1)
    k0 = jnp.clip(1 << jnp.clip(_floor_log2(scaled), 0, 10), 1, 1 << 10)
    k = jnp.where(used & multi, k0, 0)

    neg_inf = jnp.float32(-1e30)
    big = jnp.float32(1e30)
    histf = hist.astype(jnp.float32)

    # --- bulk grow rounds -------------------------------------------------
    # The deficit after floor assignment is typically hundreds of units;
    # retiring it one doubling per while_loop iteration costs ~0.3 ms per
    # iteration on TPU.  Each round accepts every doubling whose
    # bits-saved-per-Kraft-unit clears a per-row threshold, with the
    # threshold found by binary search so the accepted set's total cost
    # fits the remaining deficit.  (An argsort + prefix-sum formulation
    # is the greedier classic, but two (B,256) sorts cost ~0.5 ms EACH on
    # TPU — the search is ~20 dense passes over 16K elements, ~free; the
    # exact single-move loop below finishes whatever either leaves.)
    def bulk_round(k, _):
        D = jnp.maximum(TAB - jnp.sum(k, axis=1), 0).astype(jnp.float32)
        kf = jnp.maximum(k, 1).astype(jnp.float32)
        elig = (k > 0) & (k < (1 << 10))
        prio = jnp.where(elig, histf / kf, neg_inf)
        cost = jnp.where(elig, k, 0).astype(jnp.float32)
        hi0 = jnp.max(jnp.where(elig, prio, 0.0), axis=1) + 1.0

        def bs(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            c = jnp.sum(jnp.where(prio >= mid[:, None], cost, 0.0),
                        axis=1)
            ok = c <= D
            return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

        lo, hi = jax.lax.fori_loop(
            0, 24, bs, (jnp.zeros_like(hi0), hi0))
        accept = elig & (prio >= hi[:, None])
        # the accepted set's cost fits D by construction of `hi`
        return jnp.where(accept, k * 2, k), 0

    k, _ = jax.lax.scan(bulk_round, k, None, length=8)

    def body(state):
        k, it = state
        K = jnp.sum(k, axis=1)
        D = TAB - K                      # >0: grow someone, <0: shrink
        need = (D != 0) & (jnp.sum((k > 0).astype(jnp.int32), axis=1) >= 2)
        kf = jnp.maximum(k, 1).astype(jnp.float32)

        # grow: doubling symbol s shortens its code by 1 bit, saving
        # hist[s] output bits at a Kraft cost of k[s]; greedily pick the
        # best bits-per-cost among symbols whose doubling fits in D
        jg = jnp.clip(_floor_log2(jnp.maximum(D, 1)), 0, 10)
        tg = (1 << jg)[:, None]
        elig_g = (k > 0) & (k <= tg) & (k < (1 << 10))
        pick_g = jnp.argmax(jnp.where(elig_g, histf / kf, neg_inf), axis=1)
        ok_g = jnp.any(elig_g, axis=1)

        # shrink: halving symbol s costs hist[s] bits and frees k[s]/2;
        # pick the lowest bits-per-freed-unit with k/2 <= E.  If none
        # qualifies (parity deadlock), double the smallest k instead —
        # later iterations re-shrink
        E = jnp.maximum(-D, 1)
        js = jnp.clip(_floor_log2(E), 0, 10)
        ts = (2 << js)[:, None]
        elig_s = (k >= 2) & (k <= ts)
        pick_s = jnp.argmin(jnp.where(elig_s, histf / kf, big), axis=1)
        ok_s = jnp.any(elig_s, axis=1)
        elig_p = (k > 0) & (k < (1 << 10))
        pick_p = jnp.argmin(jnp.where(elig_p, k, jnp.int32(1 << 30)),
                            axis=1)

        grow = D > 0
        pick = jnp.where(grow, pick_g,
                         jnp.where(ok_s, pick_s, pick_p))
        can = jnp.where(grow, ok_g, ok_s | jnp.any(elig_p, axis=1))
        do_grow = grow | ~ok_s           # parity fallback also doubles
        rows = jnp.arange(k.shape[0])
        cur = k[rows, pick]
        new = jnp.where(do_grow, cur * 2, cur // 2)
        upd = jnp.where(need & can, new, cur)
        k = k.at[rows, pick].set(upd)
        return k, it + 1

    def cond(state):
        k, it = state
        K = jnp.sum(k, axis=1)
        bad = (K != TAB) & (jnp.sum((k > 0).astype(jnp.int32), axis=1) >= 2)
        return jnp.any(bad) & (it < 64)

    k, _ = jax.lax.while_loop(cond, body, (k, jnp.int32(0)))

    # balanced-code fallback for any row the loop failed to repair:
    # with m used symbols and L = ceil(log2 m), the (2^L - m) most
    # frequent symbols get length L-1 (k = 2^(12-L)), the rest L
    K = jnp.sum(k, axis=1)
    bad = (K != TAB) & (m >= 2)
    L = jnp.maximum(_floor_log2(jnp.maximum(m - 1, 1)) + 1, 1)
    n_short = (1 << L) - m
    order = jnp.argsort(jnp.where(used, -hist, 1), axis=1)
    rank_of = jnp.argsort(order, axis=1)        # rank by frequency desc
    k_bal = jnp.where(
        used,
        jnp.where(rank_of < n_short[:, None],
                  1 << jnp.clip(12 - L, 1, 11)[:, None],
                  1 << jnp.clip(11 - L, 0, 10)[:, None]),
        0)
    k = jnp.where(bad[:, None], k_bal, k)

    # A perfectly FLAT code over > 127 symbols (possible from the
    # balanced fallback when m is a power of two, or from the threshold
    # bulk rounds on near-uniform histograms) is valid Huffman but
    # unserializable in zstd's tree formats: direct weights cap at 127
    # symbols and FSE-coded weights need >= 2 distinct symbols.  Break
    # the tie Kraft-neutrally: double the most frequent symbol's k,
    # halve the two least frequent.
    used_k = k > 0
    kmax = jnp.max(jnp.where(used_k, k, 0), axis=1)
    kmin = jnp.min(jnp.where(used_k, k, 1 << 30), axis=1)
    flat_bad = (m > 127) & (kmax == kmin) & (kmin >= 2) & \
        (kmax < (1 << 10))
    top = jnp.argmax(jnp.where(used_k, hist, -1), axis=1)
    oh_top = jax.nn.one_hot(top, k.shape[1], dtype=bool)
    b1 = jnp.argmin(jnp.where(used_k & ~oh_top, hist, 1 << 30), axis=1)
    oh_b1 = jax.nn.one_hot(b1, k.shape[1], dtype=bool)
    b2 = jnp.argmin(jnp.where(used_k & ~oh_top & ~oh_b1, hist, 1 << 30),
                    axis=1)
    fb = flat_bad[:, None]
    k = jnp.where(fb & oh_top, k * 2, k)
    k = jnp.where(fb & (oh_b1 | jax.nn.one_hot(b2, k.shape[1],
                                               dtype=bool)),
                  k // 2, k)
    return k


@jax.jit
def canonical_from_kraft(k: jnp.ndarray):
    """k: (B, 256) Kraft budgets -> (lengths, codes, weights, max_bits).
    Value assignment per HUF_buildCTable's valPerRank scheme (longest codes
    first, symbol order within a length) — must match
    ops/huffman._canonical_codes bit-for-bit."""
    used = k > 0
    lengths = jnp.where(used, MAX_BITS - _floor_log2(jnp.maximum(k, 1)), 0)
    max_bits = jnp.max(lengths, axis=1)
    # nb_per_rank / val_per_rank over the static rank range 1..11
    mn = jnp.zeros(k.shape[0], jnp.int32)
    codes = jnp.zeros_like(lengths)
    val_per_rank = {}
    for nb in range(MAX_BITS, 0, -1):
        val_per_rank[nb] = mn
        nbr = jnp.sum((lengths == nb).astype(jnp.int32), axis=1)
        mn = (mn + nbr) >> 1
    for nb in range(1, MAX_BITS + 1):
        is_nb = lengths == nb
        pos = jnp.cumsum(is_nb.astype(jnp.int32), axis=1) - 1
        codes = jnp.where(is_nb, val_per_rank[nb][:, None] + pos, codes)
    weights = jnp.where(used, max_bits[:, None] + 1 - lengths, 0)
    return lengths, codes, weights, max_bits


@jax.jit
def pack_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """(B, 256) weights in [0, 11] -> (B, 32) int32, 8 nibbles per word
    (little-endian nibble order) for a compact host fetch."""
    B = weights.shape[0]
    w = weights.reshape(B, 32, 8)
    shifts = (4 * np.arange(8, dtype=np.int32))[None, None, :]
    return jnp.sum(w << shifts, axis=2).astype(jnp.int32)


def unpack_weights(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse of pack_weights: (B, 32) int32 -> (B, 256) uint8."""
    B = packed.shape[0]
    p = packed.astype(np.uint32)[:, :, None]
    shifts = (4 * np.arange(8, dtype=np.uint32))[None, None, :]
    return ((p >> shifts) & 0xF).reshape(B, 256).astype(np.uint8)


@partial(jax.jit, static_argnames=("mode_huf", "mode_huf1", "mode_rawlit",
                                   "mode_seq"))
def plan_blocks(hist: jnp.ndarray, lit_count: jnp.ndarray,
                n_seq: jnp.ndarray, const: jnp.ndarray, lens: jnp.ndarray,
                mode_huf: int, mode_huf1: int, mode_rawlit: int,
                mode_seq: int, hist_q: jnp.ndarray | None = None):
    """Full per-block literal planning on device.

    Returns (mode_code (B,) int32 per M_*, mode_bits (B,) int32 for the
    entropy kernel, codes_packed (B, 256) int32 = (value << 4) | nbits,
    weights_packed (B, 32) int32, rle_byte (B,) int32, sizes4 (B, 4)
    int32 exact per-stream byte sizes).

    hist_q (B, 4, 256): per-Huffman-stream literal histograms
    (ops/zstd_encode._hist_quarters).  They make the per-stream encoded
    sizes EXACT — sum over the stream's literals of its code length, plus
    one sentinel bit, rounded to bytes — which is what lets the SMEM
    entropy kernel emit all four streams concurrently at precomputed
    offsets.  Without hist_q, sizes4 is zero (legacy sequential layout).

    Mirrors ZstdCodec._decide_modes' conservative (exact=False) logic:
    mode decisions must be final before the entropy kernel runs, so the
    huf-vs-raw comparison uses provable bounds (tree size bounded by the
    4-bit direct serialization; per-stream padding worst case)."""
    B = hist.shape[0]
    lc = lit_count.astype(jnp.int32)
    blen = lens.astype(jnp.int32)
    nz = jnp.sum((hist > 0).astype(jnp.int32), axis=1)

    k = assign_kraft(hist)
    lengths, codes, weights, max_bits = canonical_from_kraft(k)
    codes_packed = (codes << 4) | lengths
    weights_packed = pack_weights(weights)
    rle_byte = jnp.argmax(hist, axis=1).astype(jnp.int32)

    # last used symbol index (weights before it are serialized; it is
    # implied) -> serialized-tree size bound: direct 4-bit form when
    # last <= 127, else the FSE form's 128-byte format cap (the host
    # stores the block raw in the rare case FSE serialization fails)
    sym = jnp.arange(256, dtype=jnp.int32)[None, :]
    last = jnp.max(jnp.where(hist > 0, sym, -1), axis=1)
    tree_bound = jnp.where(last <= 127,
                           1 + (jnp.maximum(last, 0) + 1) // 2, 128)

    one = lc < 256
    jump = jnp.where(one, 0, 6)
    est_bits = jnp.sum(hist * lengths, axis=1)
    if hist_q is not None:
        bits_q = jnp.sum(hist_q * lengths[:, None, :], axis=2)  # (B, 4)
        sz_q = (bits_q + 1 + 7) >> 3
        sz_one = (est_bits + 1 + 7) >> 3
        sizes4 = jnp.where(
            one[:, None],
            jnp.stack([sz_one, jnp.zeros_like(sz_one),
                       jnp.zeros_like(sz_one), jnp.zeros_like(sz_one)],
                      axis=1),
            sz_q)
        est_payload = jnp.sum(sizes4, axis=1) + tree_bound + jump
    else:
        pad = jnp.where(one, 2, 8)
        sizes4 = jnp.zeros((B, 4), jnp.int32)
        est_payload = est_bits // 8 + tree_bound + jump + pad
    raw_hdr = jnp.where(lc < 32, 1, jnp.where(lc < 4096, 2, 3))
    huf_hdr = jnp.where((lc <= 1023) & (est_payload <= 1023), 3,
                        jnp.where((lc <= 16383) & (est_payload <= 16383),
                                  4, 5))
    huf_ok = (nz >= 2) & (lc >= 64) & (est_payload < lc) & \
        (huf_hdr + est_payload < raw_hdr + lc)

    mode = jnp.where(huf_ok, jnp.where(one, M_HUF1, M_HUF), M_RAW)
    # raw rows whose minimal payload reaches the block size: skip streams
    skip = (mode == M_RAW) & (lc > 0) & (raw_hdr + lc + 1 >= blen)
    mode = jnp.where(skip, M_SKIP, mode)
    mode = jnp.where(nz == 1, M_RLE, mode)
    mode = jnp.where(lc == 0, M_NONE, mode)
    mode = jnp.where((const >= 0) & (blen > 4), M_RLEBLOCK, mode)

    mb = jnp.where(mode == M_HUF, mode_huf | mode_seq, 0)
    mb = jnp.where(mode == M_HUF1, mode_huf | mode_huf1 | mode_seq, mb)
    mb = jnp.where((mode == M_RAW) & (lc > 0), mode_rawlit | mode_seq, mb)
    mb = jnp.where((mode == M_NONE) | (mode == M_RLE) |
                   ((mode == M_RAW) & (lc == 0)), mode_seq, mb)
    # M_SKIP / M_RLEBLOCK: no streams at all
    mb = jnp.where((mode == M_SKIP) | (mode == M_RLEBLOCK), 0, mb)
    # padding rows (blen == 0) emit nothing
    mb = jnp.where(blen == 0, 0, mb)
    mode = jnp.where(blen == 0, M_SKIP, mode)
    sizes4 = jnp.where(((mode == M_HUF) | (mode == M_HUF1))[:, None],
                       sizes4, 0)
    return mode, mb, codes_packed, weights_packed, rle_byte, sizes4
