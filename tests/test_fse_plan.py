"""Unit tests for the device-side FSE sequence-table planner
(ops/fse_plan.py): normalization invariants, vectorized
FSE_buildCTable equivalence with the scalar ops/fse builder, and the
RLE / FSE / predefined mode choice on synthetic histograms.

Previously covered only indirectly via end-to-end roundtrips (ADVICE
r4 #4)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from libzseek_tpu.format import zstd_frame as zf
from libzseek_tpu.ops import fse, fse_plan
from libzseek_tpu.ops.fse_plan import (_build_ctable, _normalize, LOGS,
                                       NSYMS, plan_seq_tables)
from libzseek_tpu.ops.pallas_entropy import (MODE_LL_FSE, MODE_LL_RLE,
                                             MODE_ML_FSE, MODE_OF_FSE)


def _random_hists(rng, nsyms, rows):
    """Histograms spanning degenerate shapes: single symbol, two symbols,
    uniform, heavily skewed, sparse tails."""
    hists = []
    hists.append(np.eye(1, nsyms, 3, dtype=np.int64)[0] * 500)   # RLE-ish
    h = np.zeros(nsyms, np.int64)
    h[0], h[nsyms - 1] = 1000, 1                                 # skew+tail
    hists.append(h)
    hists.append(np.full(nsyms, 7, np.int64))                    # uniform
    for _ in range(rows - 3):
        n_used = int(rng.integers(2, nsyms + 1))
        idx = rng.choice(nsyms, n_used, replace=False)
        h = np.zeros(nsyms, np.int64)
        h[idx] = rng.integers(1, 400, n_used)
        hists.append(h)
    return np.stack(hists)


@pytest.mark.parametrize("key", ["ll", "of", "ml"])
def test_normalize_invariants(key):
    rng = np.random.default_rng(7)
    nsyms, log = NSYMS[key], LOGS[key]
    hists = _random_hists(rng, nsyms, 32)
    norm, ok = (np.asarray(a) for a in
                _normalize(jnp.asarray(hists, jnp.int32), log))
    for i in range(len(hists)):
        if not ok[i]:
            continue
        assert norm[i].sum() == 1 << log, f"row {i} sum"
        # every used symbol gets >= 1 slot; unused symbols get none
        assert (norm[i][hists[i] > 0] >= 1).all()
        assert (norm[i][hists[i] == 0] == 0).all()


@pytest.mark.parametrize("key", ["ll", "of", "ml"])
@pytest.mark.parametrize("use_maxlog", [False, True])
def test_build_ctable_matches_scalar(key, use_maxlog):
    """The closed-form vectorized table builder must agree entry-for-entry
    with the scalar spec implementation for norms without -1 entries."""
    rng = np.random.default_rng(11)
    nsyms = NSYMS[key]
    log = fse_plan.CT_MAXLOG[key] if use_maxlog else LOGS[key]
    hists = _random_hists(rng, nsyms, 24)
    norm, ok = (np.asarray(a) for a in
                _normalize(jnp.asarray(hists, jnp.int32), log))
    st, dnb, dfs = (np.asarray(a) for a in
                    _build_ctable(key, jnp.asarray(norm), log))
    checked = 0
    for i in range(len(hists)):
        if not ok[i]:
            continue
        et = fse.build_encode_table(norm[i], log)
        np.testing.assert_array_equal(st[i, : 1 << log], et.state_table,
                                      err_msg=f"row {i} state_table")
        np.testing.assert_array_equal(dnb[i], et.delta_nb_bits,
                                      err_msg=f"row {i} delta_nb_bits")
        # delta_find_state only matters for used symbols (unused rows
        # diverge harmlessly: the encoder never visits them)
        used = norm[i] > 0
        np.testing.assert_array_equal(dfs[i][used],
                                      et.delta_find_state[used],
                                      err_msg=f"row {i} delta_find_state")
        checked += 1
    assert checked >= 20


def test_plan_modes_on_synthetic_sequences():
    """RLE when a stream uses one code; FSE_Compressed when a custom table
    clearly beats predefined; predefined for tiny blocks."""
    S = 512
    B = 3
    ll = np.zeros((B, S), np.int32)
    ml = np.full((B, S), 3, np.int32)
    off = np.ones((B, S), np.int32)
    n_seq = np.array([400, 400, 8], np.int32)
    # row 0: constant everything -> RLE on all three streams
    # row 1: ll heavily skewed across two codes (custom table beats the
    # predefined's flat-ish cost; two codes so RLE cannot apply)
    ll[1] = 12 + 64  # raw ll value landing in a high code bucket
    ll[1, ::8] = 0
    off[1] = (1 << 12)  # offsets needing 12 bits -> code 12
    off[1, ::8] = 1
    # row 2: too few sequences for a custom FSE table (RLE, whose table
    # is a single byte, has no minimum and still applies)
    flags, ctabs, norms, rle_syms, gain = (np.asarray(a) for a in
                                           plan_seq_tables(
        jnp.asarray(ll), jnp.asarray(ml), jnp.asarray(off),
        jnp.asarray(n_seq)))
    assert flags[0] & MODE_LL_RLE
    assert rle_syms[0, 0] == 0          # ll code 0
    assert flags[1] & (MODE_LL_FSE | MODE_LL_RLE)
    assert not (flags[2] & (MODE_LL_FSE | MODE_OF_FSE | MODE_ML_FSE))
    assert gain[1] > 0
    # the ctab rows for non-FSE streams hold the predefined content
    from libzseek_tpu.ops.pallas_entropy import CTAB_PREDEF, _CTO
    o = _CTO["ml_st"]
    if not (flags[2] & (MODE_ML_FSE | MODE_OF_FSE)):
        np.testing.assert_array_equal(
            ctabs[2, o: o + 16], CTAB_PREDEF[o: o + 16])


def test_env_knob_retraces(monkeypatch):
    """ZN_SEQTAB is read outside the jit: toggling it mid-process takes
    effect (ADVICE r4 #3)."""
    S = 256
    ll = np.zeros((2, S), np.int32)
    ml = np.full((2, S), 3, np.int32)
    off = np.ones((2, S), np.int32)
    n_seq = np.array([200, 200], np.int32)
    args = [jnp.asarray(a) for a in (ll, ml, off, n_seq)]
    flags_on = np.asarray(plan_seq_tables(*args)[0])
    monkeypatch.setenv("ZN_SEQTAB", "off")
    flags_off = np.asarray(plan_seq_tables(*args)[0])
    assert flags_on[0] != 0
    assert (flags_off == 0).all()
