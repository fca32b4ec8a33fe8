"""Vectorized Huffman literal emission — the VPU/MXU formulation of the
4-stream literal payload that ops/pallas_entropy.py emits with a scalar
SMEM loop.

The scalar loop is issue-bound at ~1.1 ns/op (PERF.md); per 8 MiB batch
the literal half of the fused kernel costs ~13 ms, which caps the whole
encode chain far below the single-chip baseline.  This module computes
the SAME bitstreams with dense vector work:

  * per-byte packed codes via a nibble one-hot MXU lookup (no gathers);
  * per-byte bit offsets via suffix sums (streams are emitted in reverse
    symbol order, so a literal's offset is the total code length of the
    literals AFTER it in its stream);
  * bit placement as a hierarchy: per-byte lo/hi word spreads -> per-quad
    4-word windows (dense select-adds) -> per-1024-byte-super windows via
    a one-hot matmul (MXU) inside a Pallas kernel, skew-summed and placed
    into the output with dynamic `pltpu.roll` + dynamic-sublane adds.

Every contribution to a given output word occupies disjoint bit ranges,
so sums equal ORs and 16-bit halves stay carry-free in f32 matmuls — the
invariant the whole formulation rests on.

Stream-boundary bytes (a quad or super whose literals split across two
of the four streams) are zeroed in the vector path and re-added as a
handful of sparse scatter-adds on the host-side XLA pass, as are the
4 per-stream sentinel bits.

Reference counterpart: HUF_compress4X inside ZSTD_compress2
(/root/reference/src/compress.c:666).  Bit-exactness vs the scalar
kernel is tested in tests/test_vector_entropy.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BLOCK = 131072                  # fixed block size the kernel is tiled for
ROWS_P = 1024                     # col-major plane rows (bytes)
COLS_P = 128
QROWS = 256                       # quad plane rows; super = one quad column
NSUP = 128                        # supers per block (1024 bytes each)
SUP_BYTES = 1024
WIN = 384                         # super window words (<= 352 + 4 slack)
OROWS = 264                       # output rows of 128 words (33792 words)
E_ENTRIES = 132                   # 128 supers + up to 3 boundary splits + pad
BIGPOS = 1 << 22                  # "no literal here" position sentinel
VEC_MIN_LC = 4096                 # below this the scalar kernel is fine
LIT_ANCHOR_INTERVAL = 512


# ---------------- Pallas kernel: windows + placement ----------------


def _place_kernel(val, pos, ents, out, vt, wqt, acc):
    """Per block: quad windows from per-byte spreads, then one placement
    loop over (super, lane-range) entries: one-hot matmul window build,
    skew-sum, dynamic roll + dynamic-sublane add into the payload."""
    v_u = val[0].astype(jnp.uint32)
    p_i = pos[0]
    sh = (p_i & 31).astype(jnp.uint32)
    lo = (v_u << sh).astype(jnp.uint32)
    hi = ((v_u >> (jnp.uint32(31) - sh)) >> 1).astype(jnp.uint32)
    w = p_i >> 5

    w4 = w.reshape(QROWS, 4, COLS_P)
    # int32 views: Mosaic lacks unsigned reductions; sums of disjoint-bit
    # values are bit-pattern-exact under two's-complement wraparound
    lo4 = lo.astype(jnp.int32).reshape(QROWS, 4, COLS_P)
    hi4 = hi.astype(jnp.int32).reshape(QROWS, 4, COLS_P)
    wq = jnp.min(w4, axis=1)
    d = w4 - wq[:, None, :]
    for j in range(4):
        vj = (jnp.sum(jnp.where(d == j, lo4, 0), axis=1)
              + jnp.sum(jnp.where(d == j - 1, hi4, 0), axis=1))
        vt[j] = (vj & 0xFFFF).astype(jnp.float32).T
        vt[4 + j] = jax.lax.shift_right_logical(vj, 16).astype(
            jnp.float32).T
    wqt[:, :] = wq.T

    acc[:] = jnp.zeros((2, OROWS, COLS_P), jnp.float32)
    lane256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    iota_win = jax.lax.broadcasted_iota(jnp.int32, (WIN, 256), 0)

    def body(e, _):
        col = ents[0, 0, 4 * e]

        @pl.when(col >= 0)
        def _():
            llo = ents[0, 0, 4 * e + 1]
            lhi = ents[0, 0, 4 * e + 2]
            ws = ents[0, 0, 4 * e + 3]
            lm = (lane256 >= llo) & (lane256 < lhi)
            dq = jnp.where(lm, wqt[pl.ds(col, 1), :], BIGPOS)
            dd = jnp.clip(dq - ws, 0, WIN - 5)
            m = (iota_win == dd).astype(jnp.float32)
            vfull = vt[:, col, :]
            v = jnp.where(lm, vfull, 0.0)
            p = jax.lax.dot_general(v, m, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            accl = jnp.zeros((1, WIN), jnp.float32)
            acch = jnp.zeros((1, WIN), jnp.float32)
            for j in range(4):
                accl = accl + pltpu.roll(p[j: j + 1, :], shift=j, axis=1)
                acch = acch + pltpu.roll(p[4 + j: 5 + j, :], shift=j, axis=1)
            c = ws % 128
            r0 = ws // 128
            for t in range(2):
                a = accl if t == 0 else acch
                for pc in range(WIN // 128):
                    piece = a[:, 128 * pc: 128 * (pc + 1)]
                    rolled = pltpu.roll(piece, shift=c, axis=1)
                    lowfirst = jnp.where(lane128 < c, 0.0, rolled)
                    hipart = jnp.where(lane128 < c, rolled, 0.0)
                    cur = acc[t, pl.ds(r0 + pc, 2), :]
                    acc[t, pl.ds(r0 + pc, 2), :] = cur + jnp.concatenate(
                        [lowfirst, hipart], axis=0)

        return 0

    jax.lax.fori_loop(0, E_ENTRIES, body, 0)
    out[0] = (acc[0].astype(jnp.int32)
              | (acc[1].astype(jnp.int32) << 16))


def _place(valT, posT, entries, interpret: bool):
    B = valT.shape[0]
    return pl.pallas_call(
        _place_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ROWS_P, COLS_P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS_P, COLS_P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * E_ENTRIES), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, OROWS, COLS_P), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OROWS, COLS_P), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, COLS_P, QROWS), jnp.float32),
                        pltpu.VMEM((COLS_P, QROWS), jnp.int32),
                        pltpu.VMEM((2, OROWS, COLS_P), jnp.float32)],
        interpret=interpret,
    )(valT, posT, entries)


def _place_emulate(valT, posT, entries):
    """NumPy reference of the placement kernel (host, tests/CPU): same
    contract, scalar bit pushes."""
    valT = np.asarray(valT)
    posT = np.asarray(posT)
    entries = np.asarray(entries)
    B = valT.shape[0]
    out = np.zeros((B, OROWS, COLS_P), np.uint32)
    for b in range(B):
        flat = out[b].reshape(-1)
        val = valT[b].astype(np.uint32)    # (1024, 128) col-major
        pos = posT[b]
        for e in range(E_ENTRIES):
            col, llo, lhi, ws = entries[b, 0, 4 * e: 4 * e + 4]
            if col < 0:
                continue
            # lanes llo..lhi of super `col` = quads, i.e. bytes
            for lane in range(llo, lhi):
                for k in range(4):
                    i = 4 * (lane + 256 * col) + k     # global byte index
                    r, c = i % ROWS_P, i // ROWS_P
                    v = int(val[r, c])
                    if v == 0:
                        continue
                    p = int(pos[r, c])
                    wd, s = p >> 5, p & 31
                    flat[wd] |= (v << s) & 0xFFFFFFFF
                    if s:
                        flat[wd + 1] |= v >> (32 - s)
    return jnp.asarray(out.view(np.int32))


# ---------------- XLA prep / post ----------------


def _lookup_codes(x, codes_packed):
    """p[i] = codes_packed[b, x[i]] via nibble one-hot + MXU matmul (f32
    exact: entries < 2^16).  No gathers."""
    B, N = x.shape
    hi = (x >> 4).astype(jnp.int32)
    lo = (x & 15).astype(jnp.int32)
    t2 = codes_packed.reshape(B, 16, 16).astype(jnp.float32)
    hi_oh = (hi[:, :, None] == np.arange(16, dtype=np.int32)).astype(
        jnp.float32)
    # HIGHEST precision: TPU f32 matmuls otherwise run bf16-ish MXU
    # passes and corrupt the 15-bit table entries
    a = jnp.einsum("bnh,bhl->bnl", hi_oh, t2,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    lo_oh = lo[:, :, None] == np.arange(16, dtype=np.int32)
    return jnp.sum(jnp.where(lo_oh, a, 0.0), axis=2).astype(jnp.int32)


@partial(jax.jit, static_argnames=("lit_cap", "upto"))
def _vector_prep(x, lit_mask_words, codes_packed, lens, vec_row,
                 lit_cap: int, upto: str = "all"):
    """Everything before the kernel.  Returns the kernel inputs plus the
    host-side fix-up data and the per-stream sizes/anchors.

    `upto` ("pos"/"entries"/"transpose"/"fix") early-returns a dummy
    9-tuple whose first element forces that stage prefix — stage-cost
    attribution for the profiling tools (XLA DCEs untouched outputs);
    production always uses "all"."""
    B, N = x.shape
    assert N == N_BLOCK, N
    pos_idx = np.arange(N, dtype=np.int32)[None, :]
    in_range = pos_idx < lens[:, None]
    bits = (lit_mask_words[:, :, None]
            >> np.arange(32, dtype=np.int32)[None, None, :]) & 1
    mask = (bits != 0).reshape(B, N) & in_range & vec_row[:, None]

    p = _lookup_codes(x, codes_packed)
    ln = jnp.where(mask, p & 15, 0)
    val = jnp.where(mask, p >> 4, 0)

    mi = mask.astype(jnp.int32)
    rank = jnp.cumsum(mi, axis=1) - mi          # exclusive: literal index
    lc = jnp.sum(mi, axis=1)
    inc = jnp.cumsum(ln, axis=1)
    tot = inc[:, -1:]
    suf = tot - inc                              # bits strictly after i

    sq = jnp.maximum((lc + 3) >> 2, 1)
    sid = jnp.minimum(rank // sq[:, None], 3)

    # per-stream bit totals and the suffix SS[s] = bits in streams >= s
    bps = jnp.stack([jnp.sum(jnp.where(mask & (sid == s), ln, 0), axis=1)
                     for s in range(4)], axis=1)            # (B, 4)
    ss = jnp.cumsum(bps[:, ::-1], axis=1)[:, ::-1]          # SS[s]
    ss_next = jnp.concatenate([ss[:, 1:], jnp.zeros((B, 1), jnp.int32)],
                              axis=1)
    sz = (bps + 8) >> 3                                     # incl. sentinel
    byte_base = jnp.cumsum(sz, axis=1) - sz

    # 4-way selects, NOT take_along_axis: a (B, N) gather runs at the
    # ~100M elem/s scatter rate and would cost ~80 ms here
    ssn_b = sum(jnp.where(sid == s, ss_next[:, s: s + 1], 0)
                for s in range(4))
    base_b = sum(jnp.where(sid == s, byte_base[:, s: s + 1], 0)
                 for s in range(4))
    pos = jnp.where(mask, suf - ssn_b + 8 * base_b, BIGPOS)
    if upto == "pos":
        return (pos[:, :1],) * 9

    # stream boundaries: byte of the literal with rank s*sq (s=1..3)
    bpos = []
    for s in range(1, 4):
        tgt = s * sq
        hit = mask & (rank == tgt[:, None])
        bp = jnp.min(jnp.where(hit, pos_idx, N), axis=1)    # N = none
        bpos.append(jnp.where(tgt < lc, bp, N))
    bpos = jnp.stack(bpos, axis=1)                          # (B, 3)

    # zero the cross-stream bytes of boundary-straddling quads; they are
    # re-added sparsely after the kernel
    strad_m = jnp.zeros((B, N), bool)
    for s in range(3):
        b_s = bpos[:, s: s + 1]
        zm = ((pos_idx >> 2) == (b_s >> 2)) & (pos_idx < b_s)
        strad_m = strad_m | zm
    val0 = jnp.where(strad_m, 0, val)
    # the kernel derives each quad's base word from the MIN position in
    # the quad; a zeroed byte must not drag the base into the previous
    # stream's region, so the kernel-side position plane treats it as
    # absent (its true pos survives in `pos` for the sparse fix-up)
    pos_k = jnp.where(strad_m, BIGPOS, pos)

    # entry list: (col, lane_lo, lane_hi, ws) per super + boundary splits
    cols = np.arange(NSUP, dtype=np.int32)[None, :].repeat(B, 0)
    llo = jnp.zeros((B, NSUP), jnp.int32)
    lhi = jnp.full((B, NSUP), QROWS, jnp.int32)
    # boundary super/lane
    rowsb = jnp.arange(B)
    extra = jnp.full((B, E_ENTRIES - NSUP, 4), -1, jnp.int32)
    for s in range(3):
        b_s = bpos[:, s]
        valid = b_s < N
        sb = jnp.clip(b_s // SUP_BYTES, 0, NSUP - 1)
        lqb = (b_s // 4) % QROWS
        # entry A (modify): lanes [0, lqb); entry B (append): [lqb, 256)
        lhi = lhi.at[rowsb, sb].set(
            jnp.where(valid, lqb, lhi[rowsb, sb]))
        extra = extra.at[:, s, 0].set(jnp.where(valid, sb, -1))
        extra = extra.at[:, s, 1].set(jnp.where(valid, lqb, 0))
        extra = extra.at[:, s, 2].set(jnp.where(valid, QROWS, 0))

    # per-entry base word ws = min word over the entry's byte range
    wplane = jnp.where(mask & ~strad_m, pos >> 5, BIGPOS >> 5)
    wsup = wplane.reshape(B, NSUP, SUP_BYTES)
    qmin = jnp.min(wsup.reshape(B, NSUP, QROWS, 4), axis=3)  # per quad
    lane_q = np.arange(QROWS, dtype=np.int32)[None, None, :]

    def range_min(lo_l, hi_l):
        sel = (lane_q >= lo_l[:, :, None]) & (lane_q < hi_l[:, :, None])
        return jnp.min(jnp.where(sel, qmin, BIGPOS >> 5), axis=2)

    ws_main = range_min(llo, lhi)
    live_main = ws_main < (OROWS - 4) * 128 - WIN
    main = jnp.stack([jnp.where(live_main, cols, -1), llo, lhi,
                      jnp.where(live_main, ws_main, 0)], axis=2)
    ex_lo = extra[:, :, 1]
    ex_hi = extra[:, :, 2]
    ex_col = extra[:, :, 0]
    ws_ex = jnp.stack(
        [jnp.where(ex_col[:, s] >= 0,
                   jnp.min(jnp.where(
                       (lane_q[0] >= ex_lo[:, s: s + 1])
                       & (lane_q[0] < ex_hi[:, s: s + 1]),
                       qmin[rowsb, jnp.clip(ex_col[:, s], 0, NSUP - 1)],
                       BIGPOS >> 5), axis=1),
                   0) for s in range(E_ENTRIES - NSUP)], axis=1)
    live_ex = (ex_col >= 0) & (ws_ex < (OROWS - 4) * 128 - WIN)
    extra = jnp.stack([jnp.where(live_ex, ex_col, -1), ex_lo, ex_hi,
                       jnp.where(live_ex, ws_ex, 0)], axis=2)
    entries = jnp.concatenate([main, extra], axis=1).reshape(
        B, 1, 4 * E_ENTRIES).astype(jnp.int32)
    if upto == "entries":
        return (entries[:, :, :1] + pos[:, :1],) * 9

    # transposed (col-major) planes for the kernel
    valT = val0.reshape(B, COLS_P, ROWS_P).transpose(0, 2, 1)
    posT = pos_k.reshape(B, COLS_P, ROWS_P).transpose(0, 2, 1)
    if upto == "transpose":
        return (valT[:, :1, :1] + posT[:, :1, :1]
                + entries[:, :, :1],) * 9

    # ---- sparse fix-ups (host adds after the kernel) ----
    # sentinel bit per stream + the zeroed straddle bytes
    sent_pos = 8 * byte_base + bps                          # (B, 4)
    sent_val = jnp.ones((B, 4), jnp.int32)
    sp = []
    sv = []
    for s in range(3):
        b_s = bpos[:, s]
        for k in range(3):                                  # bytes b-3..b-1
            bi = b_s - 3 + k
            ok = (bi >= 0) & (bi < N) & (b_s < N) & \
                ((bi >> 2) == (b_s >> 2))
            bi_c = jnp.clip(bi, 0, N - 1)
            vv = jnp.where(ok, val[rowsb, bi_c], 0)
            pp = jnp.where(ok, pos[rowsb, bi_c], 0)
            sp.append(pp)
            sv.append(vv)
    fix_pos = jnp.concatenate([sent_pos,
                               jnp.stack(sp, axis=1)], axis=1)
    fix_val = jnp.concatenate([sent_val,
                               jnp.stack(sv, axis=1)], axis=1)
    if upto == "fix":
        return (valT[:, :1, :1] + posT[:, :1, :1] + entries[:, :, :1]
                + fix_pos[:, :1] + fix_val[:, :1],) * 9

    # ---- anchors: per-512-byte-chunk partial bit sums ----
    # A 512-byte chunk can hold at most 3 distinct (stream, bucket) keys:
    # its starting key k0, k0+1 (one 512-literal bucket crossing —
    # crossings are >= 512 literals, hence >= 512 bytes, apart), and a
    # stream change to k1 = s*64 (the vector gate guarantees
    # sq >= 4*SUP_BYTES literals, so two stream changes — or a bucket
    # crossing after a stream change — cannot fit).  Exact 3-key
    # partials:
    srank = rank - sid * sq[:, None]
    key = jnp.where(mask, sid * 64 + jnp.minimum(srank >> 9, 63), 9999)
    CH = N // 512
    keych = key.reshape(B, CH, 512)
    lnch = ln.reshape(B, CH, 512)
    k0 = jnp.min(keych, axis=2)
    ktot = jnp.sum(lnch, axis=2)
    p0 = jnp.sum(jnp.where(keych == k0[:, :, None], lnch, 0), axis=2)
    k1 = jnp.max(jnp.where(keych < 9999, keych, -1), axis=2)
    p2 = jnp.where(k1 > k0,
                   jnp.sum(jnp.where(keych == k1[:, :, None], lnch, 0),
                           axis=2), 0)
    p1 = ktot - p0 - p2                                     # key k0+1
    # combine: T[b, key] over 256 keys
    keys = np.arange(256, dtype=np.int32)[None, None, :]
    T = (jnp.sum(jnp.where(k0[:, :, None] == keys, p0[:, :, None], 0),
                 axis=1)
         + jnp.sum(jnp.where((k0 + 1)[:, :, None] == keys,
                             p1[:, :, None], 0), axis=1)
         + jnp.sum(jnp.where((k1[:, :, None] == keys)
                             & (k1 > k0)[:, :, None],
                             p2[:, :, None], 0), axis=1))
    T4 = T.reshape(B, 4, 64)
    # anchor value at ka: bits with srank >= 512*(ka+1) (strictly after
    # bucket ka) = suffix sum over buckets > ka
    sufT = jnp.cumsum(T4[:, :, ::-1], axis=2)[:, :, ::-1]
    anch = jnp.concatenate([sufT[:, :, 1:],
                            jnp.zeros((B, 4, 1), jnp.int32)], axis=2)
    # valid slots: scalar kernel writes slot ka iff 512*(ka+1) < stream
    # literal count; others stay -1
    cnt0 = jnp.minimum(sq, jnp.maximum(lc, 0))
    cnts = jnp.stack([cnt0, jnp.minimum(sq, jnp.maximum(lc - sq, 0)),
                      jnp.minimum(sq, jnp.maximum(lc - 2 * sq, 0)),
                      jnp.maximum(lc - 3 * sq, 0)], axis=1)
    ka_i = np.arange(64, dtype=np.int32)[None, None, :]
    anch = jnp.where(512 * (ka_i + 1) < cnts[:, :, None], anch, -1)

    return (valT, posT, entries, sz, byte_base, fix_pos, fix_val, anch,
            lc)


@partial(jax.jit, static_argnames=("lit_cap",))
def _vector_post(words, fix_pos, fix_val, lit_cap: int):
    """Flatten kernel output to (B, LITW) uint32 and add the sparse
    contributions (sentinels + straddle bytes)."""
    B = words.shape[0]
    LITW = lit_cap // 4
    flat = words.reshape(B, OROWS * COLS_P)[:, :LITW]
    wl = fix_pos >> 5
    s = (fix_pos & 31).astype(jnp.uint32)
    v = fix_val.astype(jnp.uint32)
    lo = (v << s).astype(jnp.int32)
    hi = ((v >> (jnp.uint32(31) - s)) >> 1).astype(jnp.int32)
    rows = jnp.arange(B)[:, None]
    # ONE flat 1-D scatter-add (a (B, K) 2-D scatter lowered ~2 ms here)
    idx = (rows * LITW + jnp.clip(wl, 0, LITW - 2)).reshape(-1)
    upd_lo = jnp.where(fix_val > 0, lo, 0).reshape(-1)
    upd_hi = jnp.where(fix_val > 0, hi, 0).reshape(-1)
    flat = flat.reshape(-1)
    flat = flat.at[jnp.concatenate([idx, idx + 1])].add(
        jnp.concatenate([upd_lo, upd_hi]))
    return flat.reshape(B, LITW).astype(jnp.uint32)


def vector_literals(x, lit_mask_words, codes_packed, lens, vec_row,
                    lit_cap: int, interpret: bool = False,
                    emulate: bool = False):
    """Emit the 4-stream Huffman literal payload for the rows marked in
    vec_row (bool (B,)).  Other rows produce zeros.

    x (B, N_BLOCK) uint8; lit_mask_words (B, N//32) int32 parse coverage
    bitmask (bit i of word w = byte 32w+i, 1 = literal); codes_packed
    (B, 256) int32 ((value << 4) | nbits, nbits <= 11); lens (B,) int32.

    Returns (lit_words (B, lit_cap//4) uint32, sizes4 (B, 4) int32,
    lanch (B, 4, 64) int32) matching ops/pallas_entropy.entropy_emit_smem
    bit-for-bit for MODE_HUF 4-stream rows."""
    (valT, posT, entries, sz, byte_base, fix_pos, fix_val, anch,
     lc) = _vector_prep(x, lit_mask_words, codes_packed, lens,
                        vec_row, lit_cap)
    if emulate:
        words = _place_emulate(valT, posT, entries)
    else:
        words = _place(valT, posT, entries, interpret)
    flat = _vector_post(words, fix_pos, fix_val, lit_cap)
    return flat, sz, anch
