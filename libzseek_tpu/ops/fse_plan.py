"""Device-side per-block FSE sequence-table planning (RFC 8878 §3.1.1.4).

The entropy kernel historically emitted every sequence section with the
PREDEFINED distributions (compression-modes byte 0x00).  Real encoders win
a few percent on structured data by shipping per-block tables: libzstd
picks per stream type among Predefined / RLE / FSE_Compressed / Repeat
(the reference inherits this via ZSTD_compress2,
/root/reference/src/compress.c:666).  This module makes the same choice on
device — no host round trip, the chain stays dispatch-only:

  * code histograms for LL/OF/ML via masked one-hot sums;
  * RLE detection (single used code -> 1-byte table description);
  * normalization to the predefined accuracy logs (6/5/6 — same logs keep
    the kernel's flush widths and anchor biases static) with an exact
    sum-to-table-size fixup;
  * a VECTORIZED FSE_buildCTable: the spec's symbol spread is computed in
    closed form (assignment k lands at (k*step) mod table_size; no
    high-threshold skips because we emit no -1 probabilities) and the
    state table follows from one small argsort;
  * profitability: estimated custom bits + a table-description bound must
    beat the predefined bits.

The host serializes the chosen norms with ops/fse.write_norm_counts and
emits the matching compression-modes byte; the kernel reads per-block
tables laid out exactly like its predefined constant pack (same segment
offsets), so the state walk itself is unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from libzseek_tpu.format import zstd_frame as zf

# stream-table mode bits, merged into the entropy kernel's meta[3]
# (single source: ops/pallas_entropy.py; no cycle — that module only
# imports this one lazily inside its wrapper)
from libzseek_tpu.ops.pallas_entropy import (CT_MAXLOG, CTAB_PREDEF,
                                             CTAB_WIDTH, MODE_LL_FSE,
                                             MODE_LL_RLE, MODE_LOG_SHIFT,
                                             MODE_ML_FSE, MODE_ML_RLE,
                                             MODE_OF_FSE, MODE_OF_RLE, _CTO)

_STREAMS = (
    ("ll", len(zf.LL_DEFAULT_NORM), zf.LL_DEFAULT_LOG, zf.LL_DEFAULT_NORM),
    ("of", len(zf.OF_DEFAULT_NORM), zf.OF_DEFAULT_LOG, zf.OF_DEFAULT_NORM),
    ("ml", len(zf.ML_DEFAULT_NORM), zf.ML_DEFAULT_LOG, zf.ML_DEFAULT_NORM),
)
NSYMS = {k: n for k, n, _, _ in _STREAMS}
LOGS = {k: lg for k, _, lg, _ in _STREAMS}
NORM_WIDTH = sum(n for _, n, _, _ in _STREAMS)      # fetched per block

# minimum sequences for a custom table to amortize its description
MIN_SEQ_FSE = 32


def _pd_bits16(norm, log):
    """Per-symbol predefined cost in 1/16 bits: log2(tab/slots); -1
    ("less than 1") entries occupy one slot -> cost ~= log bits."""
    n = np.asarray(norm, np.float64)
    slots = np.where(n < 0, 1.0, np.maximum(n, 1e-9))
    bits = log - np.log2(slots)
    bits = np.where(n == 0, float(log + 1), bits)
    return np.round(bits * 16).astype(np.int32)


_PD_BITS16 = {k: _pd_bits16(nm, lg) for k, _, lg, nm in _STREAMS}


def _spread_pos(log):
    """Assignment k's table position under the spec spread (no -1 probs:
    every position is below the high threshold, so positions are simply
    (k*step) mod table_size)."""
    tab = 1 << log
    step = (tab >> 1) + (tab >> 3) + 3
    return ((np.arange(tab) * step) & (tab - 1)).astype(np.int32)


_SPREAD_POS = {lg: _spread_pos(lg) for lg in (5, 6, 8, 9)}


def _floor_log2(x):
    return 31 - jax.lax.clz(jnp.maximum(x, 1).astype(jnp.int32))


def _hist_codes(codes, nsyms, mask):
    """(B, S) int32 codes -> (B, nsyms) masked histogram (dense one-hot
    sum; S*nsyms is small enough for the VPU)."""
    vals = np.arange(nsyms, dtype=np.int32)
    oh = (codes[:, :, None] == vals[None, None, :]) & mask[:, :, None]
    return jnp.sum(oh.astype(jnp.int32), axis=1)


def _normalize(hist, log):
    """Vectorized FSE normalization at fixed accuracy log: every used
    symbol gets >= 1 slot (no -1 entries), the deficit/excess lands on the
    most frequent symbol.  Returns (norm, ok) — ok=False when the fixup
    would drive the top symbol under 1 (degenerate rows; callers fall
    back to predefined)."""
    tab = 1 << log
    total = jnp.sum(hist, axis=1, keepdims=True)
    used = hist > 0
    # int32 is exact: counts are <= the per-block sequence cap (8192) and
    # tab <= 64, far under 2^31
    scaled = (hist.astype(jnp.int32) * tab //
              jnp.maximum(total, 1)).astype(jnp.int32)
    norm = jnp.where(used, jnp.maximum(scaled, 1), 0)
    d = tab - jnp.sum(norm, axis=1)
    top = jnp.argmax(hist, axis=1)
    rows = jnp.arange(hist.shape[0])
    fixed = norm[rows, top] + d
    ok = fixed >= 1
    norm = norm.at[rows, top].set(jnp.maximum(fixed, 1))
    return norm, ok & (jnp.sum(norm, axis=1) == tab)


def _build_ctable(key, norm, log=None):
    """Vectorized FSE_buildCTable for stream `key` ("ll"|"of"|"ml") at
    accuracy `log` (default: the predefined log); mirrors
    ops/fse.build_encode_table exactly for norms without -1 entries.
    norm: (B, nsyms), sum == table_size per row.  Returns
    (state_table (B, tab), delta_nb_bits (B, nsyms),
    delta_find_state (B, nsyms))."""
    if log is None:
        log = LOGS[key]
    tab = 1 << log
    B, nsyms = norm.shape
    pos = jnp.asarray(_SPREAD_POS[log])               # (tab,)
    cum_in = jnp.cumsum(norm, axis=1)                 # (B, nsyms) inclusive
    cumul = cum_in - norm                             # exclusive
    k = np.arange(tab, dtype=np.int32)
    # symbol of assignment k (assignments are consecutive per symbol)
    sym_k = jnp.sum((k[None, None, :] >= cum_in[:, :, None])
                    .astype(jnp.int32), axis=1)       # (B, tab)
    # state slots: symbol s's occurrences, ordered by table position,
    # fill slots cumul[s].. — one sort by (symbol, position) does it
    order = jnp.argsort(sym_k * tab + pos[None, :], axis=1)
    state_table = tab + jnp.take_along_axis(
        jnp.broadcast_to(pos[None, :], (B, tab)), order, axis=1)
    c = norm
    max_bits = log - _floor_log2(jnp.maximum(c - 1, 1))
    assert isinstance(log, int)
    dnb = jnp.where(
        c == 0, ((log + 1) << 16) - tab,
        jnp.where(c == 1, (log << 16) - tab,
                  (max_bits << 16) - (c << jnp.clip(max_bits, 0, 31))))
    dfs = jnp.where(c == 0, 0,
                    jnp.where(c == 1, cumul - 1, cumul - c))
    return (state_table.astype(jnp.int32), dnb.astype(jnp.int32),
            dfs.astype(jnp.int32))


def plan_seq_tables(ll, ml, offv, n_seq):
    """Choose per-block sequence-table modes and build the tables.

    ll/ml/offv: (B, S) int32 final sequences; n_seq (B,).
    Returns (flags (B,) int32 MODE_* bits, ctabs (B, CTAB_WIDTH) int32
    per-block encode tables — predefined content where a stream is not
    FSE_Compressed — norms (B, NORM_WIDTH) int32 for host serialization,
    rle_syms (B, 3) int32, est_gain_bits (B,) int32).

    The ZN_SEQTAB / ZN_SEQTAB_EST env knobs (A/B tooling) are read HERE,
    outside the jit, and passed as static arguments — toggling them
    mid-process retraces instead of being silently ignored."""
    import os as _os
    return _plan_seq_tables(ll, ml, offv, n_seq,
                            _os.environ.get("ZN_SEQTAB", "auto"),
                            _os.environ.get("ZN_SEQTAB_EST", "frac"))


@partial(jax.jit, static_argnames=("seqtab", "est"))
def _plan_seq_tables(ll, ml, offv, n_seq, seqtab, est):
    from libzseek_tpu.ops.zstd_encode import ll_code_dev, ml_code_dev, \
        _exp_of
    B, S = ll.shape
    idxs = jnp.broadcast_to(np.arange(S, dtype=np.int32)[None, :], (B, S))
    valid = idxs < n_seq[:, None]
    codes = {
        "ll": jnp.where(valid, ll_code_dev(ll), 0),
        "ml": jnp.where(valid, jnp.where(ml >= 3, ml_code_dev(
            jnp.maximum(ml, 3)), 0), 0),
        "of": jnp.where(valid & (offv > 0),
                        _exp_of(jnp.maximum(offv, 1)), 0),
    }
    disabled = seqtab == "off"
    flags = jnp.zeros((B,), jnp.int32)
    norms_out = []
    ctab_parts = []
    rle_syms = []
    gain_total = jnp.zeros((B,), jnp.int32)
    bit_map = {"ll": (MODE_LL_RLE, MODE_LL_FSE),
               "of": (MODE_OF_RLE, MODE_OF_FSE),
               "ml": (MODE_ML_RLE, MODE_ML_FSE)}
    for key, nsyms, log, _nm in _STREAMS:
        hist = _hist_codes(codes[key], nsyms, valid)
        nz = jnp.sum((hist > 0).astype(jnp.int32), axis=1)
        sym = jnp.argmax(hist, axis=1).astype(jnp.int32)
        log_m = CT_MAXLOG[key]
        tab_m = 1 << log_m
        pd16 = jnp.asarray(_PD_BITS16[key])[None, :]
        bits_pd = jnp.sum(hist * pd16, axis=1) >> 4
        last = jnp.max(jnp.where(hist > 0,
                                 np.arange(nsyms, dtype=np.int32)[None, :],
                                 0), axis=1)

        def custom(lg):
            # normalized counts + expected cost (fractional, the same
            # formula as the predefined estimate so the comparison is
            # unbiased) + description bound at accuracy log `lg`
            norm, ok = _normalize(hist, lg)
            if est == "floor":
                cb16 = jnp.where(
                    norm > 0,
                    (lg - _floor_log2(jnp.maximum(norm, 1))) * 16, 0)
            else:
                nf = jnp.maximum(norm.astype(jnp.float32), 1.0)
                cb16 = jnp.where(
                    norm > 0,
                    jnp.round((lg - jnp.log2(nf)) * 16).astype(jnp.int32),
                    0)
            bits = jnp.sum(hist * cb16, axis=1) >> 4
            hdr = (4 + (last + 1) * (lg + 2) + 7) >> 3
            return norm, ok, bits + hdr * 8

        norm_d, ok_d, cost_d = custom(log)
        norm_m, ok_m, cost_m = custom(log_m)
        base_ok = (nz >= 2) & (n_seq >= MIN_SEQ_FSE) & (not disabled)
        # ZN_SEQTAB=nolog9 pins the default-log arm (A/B tooling;
        # same-tree measurements on the source corpus: tables-on beats
        # off by ~8 %, and the max-log arm beats default-log by ~3 %)
        ok_m_gate = seqtab != "nolog9"
        ok_d = ok_d & base_ok & (cost_d + 16 < bits_pd)
        ok_m = ok_m & base_ok & (cost_m + 16 < bits_pd) & ok_m_gate
        use_m = ok_m & (~ok_d | (cost_m < cost_d))
        use_d = ok_d & ~use_m
        rle = (nz == 1) & (n_seq > 0) & (not disabled)
        use_m = use_m & ~rle
        use_d = use_d & ~rle
        fse_ok = use_m | use_d
        rbit, fbit = bit_map[key]
        sh = MODE_LOG_SHIFT[key]
        flags = flags | jnp.where(rle, rbit, 0) | \
            jnp.where(fse_ok, fbit, 0) | \
            jnp.where(use_m, log_m << sh, 0) | \
            jnp.where(use_d, log << sh, 0)
        gain_total = gain_total + \
            jnp.where(use_m, bits_pd - cost_m, 0) + \
            jnp.where(use_d, bits_pd - cost_d, 0)
        st_d, dnb_d, dfs_d = _build_ctable(key, norm_d, log)
        st_m, dnb_m, dfs_m = _build_ctable(key, norm_m, log_m)
        # pad the default-log state table into the max-log segment
        st_d = jnp.pad(st_d, ((0, 0), (0, tab_m - (1 << log))))
        pd = CTAB_PREDEF
        o = _CTO[key + "_st"]
        seg_pd = jnp.asarray(pd[o: o + tab_m])[None, :]
        st = jnp.where(use_m[:, None], st_m,
                       jnp.where(use_d[:, None], st_d, seg_pd))
        o = _CTO[key + "_dnb"]
        dnb_pd = jnp.asarray(pd[o: o + nsyms])[None, :]
        dnb = jnp.where(use_m[:, None], dnb_m,
                        jnp.where(use_d[:, None], dnb_d, dnb_pd))
        o = _CTO[key + "_dfs"]
        dfs_pd = jnp.asarray(pd[o: o + nsyms])[None, :]
        dfs = jnp.where(use_m[:, None], dfs_m,
                        jnp.where(use_d[:, None], dfs_d, dfs_pd))
        ctab_parts += [st, dnb, dfs]
        norms_out.append(jnp.where(use_m[:, None], norm_m, norm_d))
        rle_syms.append(sym)
    ctabs = jnp.concatenate(ctab_parts, axis=1)
    norms = jnp.concatenate(norms_out, axis=1)
    return (flags, ctabs.astype(jnp.int32), norms.astype(jnp.int32),
            jnp.stack(rle_syms, axis=1), gain_total)
