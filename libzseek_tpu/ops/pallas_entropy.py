"""Fused SMEM entropy emission — Huffman literal streams + FSE sequences.

The XLA entropy stage pays gather/scatter rates (~100M elem/s) over
(B, 128K) literal planes plus a scatter-based bit packer; at lcap=128K that
is ~0.65 s per 8 MiB batch, with another ~0.3 s spent materializing the
compacted literal plane it consumes.  This kernel replaces all of it with
one sequential scalar pass per block on the TPU core (SMEM allows dynamic
scalar load/store; see ops/pallas_match.py and PERF.md):

  * literal runs are walked straight out of the raw block words via the
    sequence list — no literal plane is ever materialized;
  * Huffman codes are pushed LSB-first into the 4-stream layout in reverse
    symbol order (what the backward-reading decoder expects), with decode
    anchors (format/hints.py) recorded inline;
  * the FSE/tANS 3-state walk over sequences runs in the same kernel with
    the predefined distributions, extras and state flushes bit-exact with
    ops/zstd_encode.fse_encode_sequences (tested against it);
  * raw-literal rows (Huffman unprofitable) get a forward byte copy
    instead, so the host never fetches a literal plane either way.

Reference counterpart: HUF_compress4X + ZSTD_encodeSequences inside
ZSTD_compress2 (/root/reference/src/compress.c:666).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libzseek_tpu.format import zstd_frame as zf
from libzseek_tpu.ops import fse

# mode bits (meta[3])
MODE_HUF = 1      # emit 4-stream Huffman literal section payload
MODE_RAWLIT = 2   # emit the literal bytes verbatim (forward copy)
MODE_SEQ = 4      # emit the FSE sequence stream
MODE_HUF1 = 8     # with MODE_HUF: single-stream layout (small literal
                  # sets; saves the 6-byte jump table like HUF_compress1X)
# sequence-table modes (ops/fse_plan.py decides; the host serializes the
# matching compression-modes byte + table descriptions)
MODE_LL_RLE = 16   # LL stream RLE: no state bits, no flush
MODE_OF_RLE = 32
MODE_ML_RLE = 64
MODE_LL_FSE = 128  # LL stream FSE_Compressed: states from the per-block
MODE_OF_FSE = 256  # ctab pack instead of the predefined constants
MODE_ML_FSE = 512

LIT_ANCHOR_INTERVAL = 512   # literals per stream anchor (pow2)
SEQ_ANCHOR_INTERVAL = 128   # sequences per anchor (pow2)
_LA_LOG = 9
_SA_LOG = 7

# ---- constant table pack (host, once) ----


def _build_tabs() -> tuple[np.ndarray, dict[str, int]]:
    ll_et = fse.build_encode_table(zf.LL_DEFAULT_NORM, zf.LL_DEFAULT_LOG)
    of_et = fse.build_encode_table(zf.OF_DEFAULT_NORM, zf.OF_DEFAULT_LOG)
    ml_et = fse.build_encode_table(zf.ML_DEFAULT_NORM, zf.ML_DEFAULT_LOG)
    ll_code = np.searchsorted(zf._LL_BASE, np.arange(64), side="right") - 1
    ml_code = np.searchsorted(zf._ML_BASE, np.arange(3, 131),
                              side="right") - 1
    parts = [
        ("ll_st", ll_et.state_table), ("ll_dnb", ll_et.delta_nb_bits),
        ("ll_dfs", ll_et.delta_find_state),
        ("of_st", of_et.state_table), ("of_dnb", of_et.delta_nb_bits),
        ("of_dfs", of_et.delta_find_state),
        ("ml_st", ml_et.state_table), ("ml_dnb", ml_et.delta_nb_bits),
        ("ml_dfs", ml_et.delta_find_state),
        ("ll_code", ll_code), ("ml_code", ml_code),
        ("ll_bits", zf.LL_BITS), ("ll_base", zf.LL_BASELINE),
        ("ml_bits", zf.ML_BITS), ("ml_base", zf.ML_BASELINE),
    ]
    offs = {}
    chunks = []
    pos = 0
    for name, arr in parts:
        offs[name] = pos
        a = np.asarray(arr, np.int32)
        chunks.append(a)
        pos += len(a)
    return np.concatenate(chunks).astype(np.int32), offs


_TABS, _OFF = _build_tabs()

# ---- per-block sequence-table pack layout (ops/fse_plan.py fills it) ----
# Segments sized for the FORMAT-MAX accuracy logs (LL 9, OF 8, ML 9) so a
# block may carry either the predefined-log tables (6/5/6, stored in the
# segment's low entries) or full-resolution custom ones; offsets are
# compile-time constants either way.
CT_MAXLOG = {"ll": 9, "of": 8, "ml": 9}


def _ctab_layout():
    offs = {}
    pos = 0
    for key, nsyms, lg, _nm in (
            ("ll", len(zf.LL_DEFAULT_NORM), zf.LL_DEFAULT_LOG,
             zf.LL_DEFAULT_NORM),
            ("of", len(zf.OF_DEFAULT_NORM), zf.OF_DEFAULT_LOG,
             zf.OF_DEFAULT_NORM),
            ("ml", len(zf.ML_DEFAULT_NORM), zf.ML_DEFAULT_LOG,
             zf.ML_DEFAULT_NORM)):
        offs[key + "_st"] = pos
        pos += 1 << CT_MAXLOG[key]
        offs[key + "_dnb"] = pos
        pos += nsyms
        offs[key + "_dfs"] = pos
        pos += nsyms
    return offs, pos


_CTO, CTAB_WIDTH = _ctab_layout()


def _ctab_predef() -> np.ndarray:
    """The predefined tables in the padded per-block layout."""
    out = np.zeros(CTAB_WIDTH, np.int32)
    for key, lg, nm in (("ll", zf.LL_DEFAULT_LOG, zf.LL_DEFAULT_NORM),
                        ("of", zf.OF_DEFAULT_LOG, zf.OF_DEFAULT_NORM),
                        ("ml", zf.ML_DEFAULT_LOG, zf.ML_DEFAULT_NORM)):
        et = fse.build_encode_table(np.asarray(nm), lg)
        o = _CTO[key + "_st"]
        out[o: o + len(et.state_table)] = et.state_table
        o = _CTO[key + "_dnb"]
        out[o: o + len(et.delta_nb_bits)] = et.delta_nb_bits
        o = _CTO[key + "_dfs"]
        out[o: o + len(et.delta_find_state)] = et.delta_find_state
    return out


CTAB_PREDEF = _ctab_predef()

# per-stream accuracy-log fields in the mode word (0 = predefined log)
MODE_LOG_SHIFT = {"ll": 12, "of": 16, "ml": 20}


def _entropy_kernel(words, sll, sml, soff, meta, codes, pcodes, tabs, ctab,
                    lit_o, seq_o, osz, lanch, sanch, run_pos, run_cum,
                    *extra, S: int, LITW: int, SEQW: int, LMAXA: int,
                    SMAXA: int, use_pairs: bool):
    if use_pairs:
        # pair-code mode: words/sll/sml/pcodes arrive as full HBM refs and
        # are DMAed into SINGLE-buffered SMEM scratch — the pipelined
        # window allocator double-buffers every operand, which together
        # with the 256 KiB pair table would blow the 1 MiB SMEM budget
        # (the kernel is compute-bound at ~300 us/block, so losing the
        # copy/compute overlap costs ~nothing)
        (words_s, sll_s, sml_s, pc_s, sem0, sem1, sem2, sem3) = extra
        b = pl.program_id(0)
        cps = [
            pltpu.make_async_copy(words.at[pl.ds(b, 1)], words_s, sem0),
            pltpu.make_async_copy(sll.at[pl.ds(b, 1)], sll_s, sem1),
            pltpu.make_async_copy(sml.at[pl.ds(b, 1)], sml_s, sem2),
            pltpu.make_async_copy(pcodes.at[pl.ds(b, 1)], pc_s, sem3),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        words, sll, sml, pcodes = words_s, sll_s, sml_s, pc_s
    O = _OFF
    blen = meta[0, 0, 0]
    lc = meta[0, 0, 1]
    n = meta[0, 0, 2]
    mode = meta[0, 0, 3]

    def byte(i):
        return (words[0, 0, i >> 2] >> ((i & 3) * 8)) & 0xFF

    NWW = words.shape[2]

    def w32l(i):
        # unaligned LE32 load from the raw block words
        q = i >> 2
        sh = ((i & 3) * 8).astype(jnp.uint32)
        lo = words[0, 0, q].astype(jnp.uint32)
        hi = words[0, 0, jnp.minimum(q + 1, NWW - 1)].astype(jnp.uint32)
        return ((lo >> sh) | jnp.where(
            sh == 0, jnp.uint32(0),
            hi << (jnp.uint32(32) - sh))).astype(jnp.int32)

    for k in range(8):
        osz[0, 0, k] = 0

    def zla(i, _):
        lanch[0, 0, i] = -1
        return 0

    def zsa(i, _):
        sanch[0, 0, i] = -1
        return 0

    jax.lax.fori_loop(0, 4 * LMAXA, zla, 0)
    jax.lax.fori_loop(0, 5 * SMAXA, zsa, 0)

    # --- literal-run table: run j starts at input pos run_pos[j] and its
    # first literal has global literal index run_cum[j]; run n is the tail
    def runs_body(j, st):
        pos, litcum = st
        run_pos[j] = pos
        run_cum[j] = litcum
        return pos + sll[0, 0, j] + sml[0, 0, j], litcum + sll[0, 0, j]

    pos_f, cum_f = jax.lax.fori_loop(
        0, n, runs_body, (jnp.int32(0), jnp.int32(0)))
    run_pos[n] = pos_f
    run_cum[n] = cum_f

    # --- bit pusher over a uint32 word ref; state = (buf, nb, w) ---
    def push(ref, st, v, nbits):
        buf, nb, w = st
        v = v.astype(jnp.uint32)
        total = nb + nbits
        spill = total >= 32
        merged = buf | (v << nb.astype(jnp.uint32))

        @pl.when(spill)
        def _():
            ref[0, 0, w] = merged

        # v >> (32-nb) without an undefined >>32 when nb == 0
        hi = (v >> (jnp.uint32(31) - nb.astype(jnp.uint32))) >> 1
        buf2 = jnp.where(spill, hi, merged)
        return buf2, jnp.where(spill, total - 32, total), w + spill

    def stream_open(ref, byte_base):
        w0 = byte_base >> 2
        nb0 = (byte_base & 3) * 8
        buf0 = jnp.where(
            nb0 > 0,
            ref[0, 0, w0] & ((jnp.uint32(1) << nb0.astype(jnp.uint32))
                             - jnp.uint32(1)),
            jnp.uint32(0))
        return buf0, nb0, w0

    def stream_close(ref, st):
        buf, nb, w = push(ref, st, jnp.uint32(1), jnp.int32(1))  # sentinel

        @pl.when(nb > 0)
        def _():
            ref[0, 0, w] = buf

    # --- Huffman literal payload: 4-stream, or 1-stream (MODE_HUF1) ---
    # Emission is SEQUENTIAL per stream: the push chain pipelines across
    # iterations and the loop is issue-bound (~1.1 ns/op measured), so
    # interleaving the four streams only added masking ops (tried in r4,
    # 19.9 -> 23-43 ms).  The win is fewer ops per literal instead: each
    # run chunk aligns to a word first, so the hot quad loop's 4-literal
    # load is ONE aligned SMEM word instead of an unaligned pair + shift
    # construction.
    @pl.when((mode & MODE_HUF) != 0)
    def _():
        one = (mode & MODE_HUF1) != 0
        s = jnp.where(one, lc, (lc + 3) >> 2)
        byte_base = jnp.int32(0)
        for s4 in range(4):
            if s4 == 0:
                cnt = s
            elif s4 < 3:
                cnt = jnp.where(one, 0, s)
            else:
                cnt = jnp.where(one, 0, lc - 3 * s)
            gbase = s4 * s

            def do_stream(_, cnt=cnt, gbase=gbase, byte_base=byte_base,
                          s4=s4):
                buf0, nb0, w0 = stream_open(lit_o, byte_base)

                def pair(st, pa, pb):
                    # one push of two codes (<= 22 bits)
                    buf, nb, w, sb = st
                    c1 = pa & 15
                    v = (pa >> 4).astype(jnp.uint32) | \
                        ((pb >> 4).astype(jnp.uint32)
                         << c1.astype(jnp.uint32))
                    cb = c1 + (pb & 15)
                    buf, nb, w = push(lit_o, (buf, nb, w), v, cb)
                    return buf, nb, w, sb + cb

                def one_lit(st, i):
                    buf, nb, w, sb = st
                    p = codes[0, 0, byte(i)]
                    buf, nb, w = push(
                        lit_o, (buf, nb, w),
                        (p >> 4).astype(jnp.uint32), p & 15)
                    return buf, nb, w, sb + (p & 15)

                # run-chunked walk (descending global literal index g):
                # resolve the covering run once per chunk, stop chunks at
                # anchor boundaries, and emit the chunk as
                # align-singles + ALIGNED quads + tail singles
                def chunk_body(state):
                    g, r, buf, nb, w, sbits = state
                    r = jax.lax.while_loop(
                        lambda rr: run_cum[rr] > g, lambda rr: rr - 1, r)
                    k = g - gbase
                    na = (k >> _LA_LOG) << _LA_LOG
                    lo = jnp.maximum(run_cum[r], gbase + na)
                    cntc = g - lo + 1
                    ipos_hi = run_pos[r] + (g - run_cum[r])
                    # singles until the quad's low byte is word-aligned
                    ha = jnp.minimum((ipos_hi + 1) & 3, cntc)

                    def s_head(t, st):
                        return one_lit(st, ipos_hi - t)

                    st = jax.lax.fori_loop(0, ha, s_head,
                                           (buf, nb, w, sbits))
                    nqd = (cntc - ha) >> 2
                    q0 = (ipos_hi - ha - 3) >> 2

                    if use_pairs:
                        # premerged 256x256 pair codes: one SMEM load
                        # yields the already-merged (value, nbits) of two
                        # literals, cutting the issue-bound quad body from
                        # ~38 to ~29 ops (PERF.md roadmap #3)
                        def quad_body(t, st):
                            buf, nb, w, sb = st
                            v4 = words[0, 0, q0 - t]
                            t1 = pcodes[0, 0, (v4 >> 16) & 0xFFFF]
                            t0 = pcodes[0, 0, v4 & 0xFFFF]
                            cb1 = t1 & 31
                            buf, nb, w = push(
                                lit_o, (buf, nb, w),
                                (t1 >> 5).astype(jnp.uint32), cb1)
                            cb0 = t0 & 31
                            buf, nb, w = push(
                                lit_o, (buf, nb, w),
                                (t0 >> 5).astype(jnp.uint32), cb0)
                            return buf, nb, w, sb + cb1 + cb0
                    else:
                        def quad_body(t, st):
                            v4 = words[0, 0, q0 - t]
                            p3 = codes[0, 0, (v4 >> 24) & 0xFF]
                            p2 = codes[0, 0, (v4 >> 16) & 0xFF]
                            p1 = codes[0, 0, (v4 >> 8) & 0xFF]
                            p0 = codes[0, 0, v4 & 0xFF]
                            st = pair(st, p3, p2)
                            return pair(st, p1, p0)

                    st = jax.lax.fori_loop(0, nqd, quad_body, st)
                    rem = cntc - ha - 4 * nqd
                    b2 = ipos_hi - ha - 4 * nqd

                    def s_tail(t, st):
                        return one_lit(st, b2 - t)

                    buf, nb, w, sbits = jax.lax.fori_loop(0, rem, s_tail,
                                                          st)
                    k_lo = lo - gbase

                    @pl.when((k_lo > 0) &
                             ((k_lo & (LIT_ANCHOR_INTERVAL - 1)) == 0))
                    def _():
                        lanch[0, 0, s4 * LMAXA + (k_lo >> _LA_LOG) - 1] = \
                            sbits

                    return lo - 1, r, buf, nb, w, sbits

                g0 = gbase + cnt - 1
                _, _, buf, nb, w, sbits = jax.lax.while_loop(
                    lambda st: st[0] >= gbase, chunk_body,
                    (g0, n, buf0, nb0, w0, jnp.int32(0)))
                stream_close(lit_o, (buf, nb, w))
                return (sbits + 1 + 7) >> 3

            if s4 == 0:
                sz = do_stream(None)
            else:
                # 1-stream mode emits no trailing streams (a 4-stream
                # block always emits all four, even empty ones)
                sz = jax.lax.cond(one, lambda _: jnp.int32(0),
                                  do_stream, None)
            osz[0, 0, s4] = sz
            byte_base = byte_base + sz

    # --- raw literal copy (forward order): word-at-a-time.  The old
    # per-byte read-modify-write serialized 4 dependent SMEM RMWs per
    # output word; here the head/tail bytes RMW (run edges share words
    # with neighboring runs) and the interior copies whole words.
    @pl.when((mode & MODE_RAWLIT) != 0)
    def _():
        def run_copy(r, _):
            base_out = run_cum[r]
            base_in = run_pos[r]
            rl = jnp.where(r < n, run_cum[r + 1], lc) - base_out

            def cb(k, _):
                o = base_out + k
                wv = lit_o[0, 0, o >> 2]
                sh = ((o & 3) * 8).astype(jnp.uint32)
                b = byte(base_in + k).astype(jnp.uint32)
                lit_o[0, 0, o >> 2] = (wv & ~(jnp.uint32(0xFF) << sh)) | \
                    (b << sh)
                return 0

            head = jnp.minimum(rl, (-base_out) & 3)
            jax.lax.fori_loop(0, head, cb, 0)
            nw = (rl - head) >> 2
            dw0 = (base_out + head) >> 2

            def cw(k, _):
                lit_o[0, 0, dw0 + k] = w32l(
                    base_in + head + 4 * k).astype(jnp.uint32)
                return 0

            jax.lax.fori_loop(0, nw, cw, 0)
            jax.lax.fori_loop(head + 4 * nw, rl, cb, 0)
            return 0

        jax.lax.fori_loop(0, n + 1, run_copy, 0)
        osz[0, 0, 0] = lc

    # --- FSE sequence stream ---
    @pl.when(((mode & MODE_SEQ) != 0) & (n > 0))
    def _():
        def exp_of(v):
            e = jnp.int32(0)
            for t in (16, 8, 4, 2, 1):
                c = (v >> t) != 0
                e = e + jnp.where(c, t, 0)
                v = jnp.where(c, v >> t, v)
            return e

        # sequence-code tables come from the PER-BLOCK ctab pack (laid
        # out exactly like the predefined constants' first segments); the
        # planner fills predefined content for streams not FSE-coded
        def enc_sym(state, sym, st_off, dnb_off, dfs_off):
            nb = (state + ctab[0, 0, dnb_off + sym]) >> 16
            bits_v = (state & ((1 << nb) - 1)).astype(jnp.uint32)
            new = ctab[0, 0, st_off + (state >> nb) +
                       ctab[0, 0, dfs_off + sym]]
            return new, bits_v, nb

        def init_state(sym, st_off, dnb_off, dfs_off):
            dnb = ctab[0, 0, dnb_off + sym]
            nb = (dnb + (1 << 15)) >> 16
            v = (nb << 16) - dnb
            return ctab[0, 0, st_off + (v >> nb) + ctab[0, 0, dfs_off + sym]]

        rle_ll = (mode & MODE_LL_RLE) != 0
        rle_of = (mode & MODE_OF_RLE) != 0
        rle_ml = (mode & MODE_ML_RLE) != 0
        tl_ll = (mode >> 12) & 15
        tl_ll = jnp.where(tl_ll == 0, zf.LL_DEFAULT_LOG, tl_ll)
        tl_of = (mode >> 16) & 15
        tl_of = jnp.where(tl_of == 0, zf.OF_DEFAULT_LOG, tl_of)
        tl_ml = (mode >> 20) & 15
        tl_ml = jnp.where(tl_ml == 0, zf.ML_DEFAULT_LOG, tl_ml)

        def codes_of(ll_v, ml_v, of_v):
            llc = jnp.where(ll_v > 63, exp_of(ll_v) + 19,
                            tabs[0, 0, O["ll_code"] + jnp.minimum(ll_v, 63)])
            mb = ml_v - 3
            mlc = jnp.where(
                mb > 127, exp_of(jnp.maximum(mb, 1)) + 36,
                tabs[0, 0, O["ml_code"] + jnp.clip(mb, 0, 127)])
            ofc = exp_of(of_v)
            return llc, mlc, ofc

        def seq_body(state):
            t, s_ll, s_of, s_ml, bst = state
            i = n - 1 - t
            ll_v = sll[0, 0, i]
            ml_v = sml[0, 0, i]
            of_v = soff[0, 0, i]
            llc, mlc, ofc = codes_of(ll_v, ml_v, of_v)
            first = t == 0
            n_of, bv_of, nb_of = enc_sym(s_of, ofc, _CTO["of_st"],
                                         _CTO["of_dnb"], _CTO["of_dfs"])
            n_ml, bv_ml, nb_ml = enc_sym(s_ml, mlc, _CTO["ml_st"],
                                         _CTO["ml_dnb"], _CTO["ml_dfs"])
            n_ll, bv_ll, nb_ll = enc_sym(s_ll, llc, _CTO["ll_st"],
                                         _CTO["ll_dnb"], _CTO["ll_dfs"])
            s_of = jnp.where(first,
                             init_state(ofc, _CTO["of_st"], _CTO["of_dnb"],
                                        _CTO["of_dfs"]), n_of)
            s_ml = jnp.where(first,
                             init_state(mlc, _CTO["ml_st"], _CTO["ml_dnb"],
                                        _CTO["ml_dfs"]), n_ml)
            s_ll = jnp.where(first,
                             init_state(llc, _CTO["ll_st"], _CTO["ll_dnb"],
                                        _CTO["ll_dfs"]), n_ll)
            z = jnp.int32(0)
            nb_of = jnp.where(first | rle_of, z, nb_of)
            nb_ml = jnp.where(first | rle_ml, z, nb_ml)
            nb_ll = jnp.where(first | rle_ll, z, nb_ll)
            zu = jnp.uint32(0)
            bv_of = jnp.where(rle_of, zu, bv_of)
            bv_ml = jnp.where(rle_ml, zu, bv_ml)
            bv_ll = jnp.where(rle_ll, zu, bv_ll)
            llb = tabs[0, 0, O["ll_bits"] + llc]
            llv = (ll_v - tabs[0, 0, O["ll_base"] + llc]).astype(jnp.uint32)
            mlb = tabs[0, 0, O["ml_bits"] + mlc]
            mlv = (ml_v - tabs[0, 0, O["ml_base"] + mlc]).astype(jnp.uint32)
            ofvx = (of_v - (1 << ofc)).astype(jnp.uint32)
            # merged pushes (same bits, fewer issue-bound loop ops):
            # of+ml state bits <= 8+9 = 17 and ll state + ll extra
            # <= 9+16 = 25, both under the pusher's 31-bit limit;
            # ml extra (<=16) + offset extra (<=17) can reach 33, so
            # those two stay separate
            bst = push(seq_o, bst,
                       bv_of | (bv_ml << nb_of.astype(jnp.uint32)),
                       nb_of + nb_ml)
            bst = push(seq_o, bst,
                       bv_ll | (llv << nb_ll.astype(jnp.uint32)),
                       nb_ll + llb)
            bst = push(seq_o, bst, mlv, mlb)
            bst = push(seq_o, bst, ofvx, ofc)
            pb = bst[1] + (bst[2] << 5)  # total bits pushed = 32*w + nb

            @pl.when((i > 0) & ((i & (SEQ_ANCHOR_INTERVAL - 1)) == 0))
            def _():
                ka = (i >> _SA_LOG) - 1
                sanch[0, 0, ka] = pb
                sanch[0, 0, SMAXA + ka] = s_ll - (1 << tl_ll)
                sanch[0, 0, 2 * SMAXA + ka] = s_of - (1 << tl_of)
                sanch[0, 0, 3 * SMAXA + ka] = s_ml - (1 << tl_ml)

            return t + 1, s_ll, s_of, s_ml, bst

        bst0 = (jnp.uint32(0), jnp.int32(0), jnp.int32(0))
        t, s_ll, s_of, s_ml, bst = jax.lax.while_loop(
            lambda st: st[0] < n, seq_body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0), bst0))
        zu = jnp.uint32(0)
        bst = push(seq_o, bst,
                   jnp.where(rle_ml, zu,
                             (s_ml & ((1 << tl_ml) - 1)).astype(jnp.uint32)),
                   jnp.where(rle_ml, 0, tl_ml))
        bst = push(seq_o, bst,
                   jnp.where(rle_of, zu,
                             (s_of & ((1 << tl_of) - 1)).astype(jnp.uint32)),
                   jnp.where(rle_of, 0, tl_of))
        bst = push(seq_o, bst,
                   jnp.where(rle_ll, zu,
                             (s_ll & ((1 << tl_ll) - 1)).astype(jnp.uint32)),
                   jnp.where(rle_ll, 0, tl_ll))
        total = bst[1] + (bst[2] << 5) + 1  # + sentinel
        stream_close(seq_o, bst)
        osz[0, 0, 4] = (total + 7) >> 3

        # rep1 anchors: last explicitly-coded offset among sequences < j
        def rep_body(i, last):
            @pl.when((i > 0) & ((i & (SEQ_ANCHOR_INTERVAL - 1)) == 0))
            def _():
                sanch[0, 0, 4 * SMAXA + (i >> _SA_LOG) - 1] = last

            of_v = soff[0, 0, i]
            return jnp.where(of_v > 3, of_v - 3, last)

        jax.lax.fori_loop(0, n, rep_body, jnp.int32(1))


@jax.jit
def build_pair_codes(codes_packed: jnp.ndarray) -> jnp.ndarray:
    """(B, 256) packed (val<<4|len) -> (B, 65536) premerged pair codes,
    packed (pair_val << 5) | pair_len.  Index (a << 8) | b holds the
    merged push for pair(codes[a], codes[b]) — codes[b] occupies the LOW
    bits, matching the kernel's LSB-first push order."""
    ca = codes_packed[:, :, None]          # pa: high byte of the index
    cb = codes_packed[:, None, :]          # pb
    la = ca & 15
    v = (ca >> 4) | ((cb >> 4) << la)
    ln = la + (cb & 15)
    return ((v << 5) | ln).reshape(codes_packed.shape[0], 65536) \
        .astype(jnp.int32)


@partial(jax.jit, static_argnames=("S", "lit_cap", "seq_cap", "interpret"))
def entropy_emit_smem(x: jnp.ndarray, sll: jnp.ndarray, sml: jnp.ndarray,
                      soff: jnp.ndarray, meta: jnp.ndarray,
                      codes: jnp.ndarray, S: int, lit_cap: int, seq_cap: int,
                      ctabs: jnp.ndarray | None = None,
                      interpret: bool = False,
                      pcodes: jnp.ndarray | None = None):
    """Emit final entropy-coded streams per block row.

    x: (B, N) uint8 raw block bytes (N multiple of 4); sll/sml/soff:
    (B, S) int32 post-gate sequences; meta: (B, 8) int32 = (block_len,
    lit_count, n_seq, mode bits, 4 reserved columns); codes: (B, 256)
    int32 packed Huffman codes ((value << 4) | nbits).  Columns 4-7 of
    meta are NOT read by the kernel (emission is sequential per stream;
    each stream's byte base comes from the previously emitted sizes) —
    callers may pass the planner's per-stream size estimates there or
    zeros, it makes no difference.

    Returns (lit_words (B, lit_cap//4) uint32, seq_words (B, seq_cap//4)
    uint32, osz (B, 8) int32 [4 stream sizes, seq_bytes, ...],
    lit_anchors (B, 4, LMAXA) int32, seq_anchor_pack (B, 5, SMAXA) int32
    [bits, ll_state, of_state, ml_state, rep1])."""
    B, N = x.shape
    NW = N // 4
    LITW = lit_cap // 4
    SEQW = seq_cap // 4
    LMAXA = max(1, ((N // 4) + LIT_ANCHOR_INTERVAL - 1)
                // LIT_ANCHOR_INTERVAL)
    SMAXA = max(1, (S + SEQ_ANCHOR_INTERVAL - 1) // SEQ_ANCHOR_INTERVAL)
    words = jax.lax.bitcast_convert_type(x.reshape(B, NW, 4), jnp.int32)
    use_pairs = pcodes is not None
    if not use_pairs:
        pcodes = jnp.zeros((B, 1), jnp.int32)
    kernel = partial(_entropy_kernel, S=S, LITW=LITW, SEQW=SEQW,
                     LMAXA=LMAXA, SMAXA=SMAXA, use_pairs=use_pairs)

    def smem(shape, const=False):
        if const:
            return pl.BlockSpec(memory_space=pltpu.SMEM,
                                block_shape=(1,) + shape[1:],
                                index_map=lambda b: (0,) * len(shape))
        return pl.BlockSpec(memory_space=pltpu.SMEM,
                            block_shape=(1,) + shape[1:],
                            index_map=lambda b: (b,) + (0,) *
                            (len(shape) - 1))

    tabs = jnp.asarray(_TABS)[None, None, :]
    # per-block sequence-code tables (ops/fse_plan.py); default =
    # predefined content broadcast per row
    if ctabs is None:
        ctabs = jnp.broadcast_to(jnp.asarray(CTAB_PREDEF)[None, :],
                                 (B, CTAB_WIDTH))
    if use_pairs:
        anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
        big_specs = [anyspec, anyspec, anyspec]
        pc_spec = anyspec
        extra_scratch = [pltpu.SMEM((1, 1, NW), jnp.int32),
                         pltpu.SMEM((1, 1, S), jnp.int32),
                         pltpu.SMEM((1, 1, S), jnp.int32),
                         pltpu.SMEM((1, 1, 65536), jnp.int32),
                         pltpu.SemaphoreType.DMA,
                         pltpu.SemaphoreType.DMA,
                         pltpu.SemaphoreType.DMA,
                         pltpu.SemaphoreType.DMA]
    else:
        big_specs = [smem((B, 1, NW)), smem((B, 1, S)), smem((B, 1, S))]
        pc_spec = smem((B, 1, pcodes.shape[1]))
        extra_scratch = []
    lit_w, seq_w, osz, lanch, sanch = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=big_specs +
                 [smem((B, 1, S)), smem((B, 1, 8)), smem((B, 1, 256)),
                  pc_spec,
                  smem((1, 1, _TABS.shape[0]), const=True),
                  smem((B, 1, CTAB_WIDTH))],
        out_specs=[smem((B, 1, LITW)), smem((B, 1, SEQW)), smem((B, 1, 8)),
                   smem((B, 1, 4 * LMAXA)), smem((B, 1, 5 * SMAXA))],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, LITW), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, SEQW), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 4 * LMAXA), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 5 * SMAXA), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((S + 1,), jnp.int32),
                        pltpu.SMEM((S + 1,), jnp.int32)] + extra_scratch,
        interpret=interpret,
    )(words.reshape(B, 1, NW), sll.reshape(B, 1, S), sml.reshape(B, 1, S),
      soff.reshape(B, 1, S), meta.reshape(B, 1, 8),
      codes.reshape(B, 1, 256),
      pcodes.reshape(B, 1, pcodes.shape[1]), tabs,
      ctabs.astype(jnp.int32).reshape(B, 1, CTAB_WIDTH))
    return (lit_w[:, 0], seq_w[:, 0], osz[:, 0],
            lanch[:, 0].reshape(B, 4, LMAXA),
            sanch[:, 0].reshape(B, 5, SMAXA))
