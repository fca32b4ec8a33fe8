"""Honest on-device stage timing for the zstd encode chain.

Wraps K iterations of each stage prefix in ONE jitted lax.scan, so the
whole measurement is a single dispatch and tunnel latency/queue noise
cannot contaminate it (dependent-iteration host loops still pay ~40 ms
of per-rep dispatch noise through the tunnel; see PERF.md).  The scan
carry feeds one bit back into the input bytes so XLA cannot fold the
chain away.

Stages are cumulative prefixes of ZstdCodec._dispatch_parse +
_dispatch_chain: xor -> h16 -> parse kernel -> post -> plan ->
entropy kernel -> compact.  CORPUS=text|mixed PB=blocks K=iters.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libzseek_tpu.utils.platform import apply_platform

apply_platform()

import jax
import jax.numpy as jnp
import numpy as np

from libzseek_tpu.ops.zstd_encode import (GATE_FIXED_BITS, _linked_post,
                                          block_entropy_h16, compact_payload)
from libzseek_tpu.runtime.zstd_codec import _ceil_to
from libzseek_tpu.ops.pallas_match import zstd_parse_linked_smem
from libzseek_tpu.testing.corpus import mixed_corpus, text_corpus

B = int(os.environ.get("PB", "64"))
N = 131072
K = int(os.environ.get("K", "8"))
CAP = 8192

rng = np.random.default_rng(3)
kind = os.environ.get("CORPUS", "mixed")
gen = text_corpus if kind == "text" else mixed_corpus
data = gen(rng, (B + 1) * N)
X2 = jnp.asarray(np.frombuffer(data.tobytes(), np.uint8).reshape(B + 1, N))
lens_h = np.full((B,), N, np.int32)
lens = jnp.asarray(lens_h)
min_abs = jnp.asarray(
    np.concatenate([[N], np.arange(1, B, dtype=np.int32) * N]))
# production skips the parse for LDM-covered rows whose successor is also
# covered (runtime/zstd_codec.py); mirror it so the stage split is honest
from libzseek_tpu import native as _native

lens_parse_h = lens_h
_ldm_stats = None
_blocks = [np.frombuffer(data.tobytes(), np.uint8)[N + i * N: N + (i + 1) * N]
           for i in range(B)]
_d = _native.ldm_scan(
    np.asarray(np.frombuffer(data.tobytes(), np.uint8)[N:]), B, N,
    np.zeros(B, np.int64), lens_h, 1 << 17)
if _d is not None and (_d[:, 0] > 0).any():
    _cov = _d[:, 0] > 0
    _skip = _cov.copy()
    _skip[:-1] = _cov[:-1] & _cov[1:]
    lens_parse_h = np.where(_skip, 0, lens_h).astype(np.int32)
    print(f"ldm: {int(_cov.sum())} covered, {int(_skip.sum())} parse-skipped")
    from libzseek_tpu.ops.zstd_encode import (apply_ldm_override,
                                              ldm_literal_stats)
    _ldm_stats = ldm_literal_stats(_d, _blocks, B, N, need_plane=False)
lens_parse = jnp.asarray(lens_parse_h)


def chain_to(which, dep):
    # The XOR exists only to carry the scan dependency (defeats caching
    # across iterations); it materializes an 8.4 MB uint8 copy (~2.8 ms)
    # that production never performs — the final summary line reports
    # the chain with this harness overhead subtracted.
    x2 = X2 ^ dep.astype(jnp.uint8)
    x = jax.lax.slice_in_dim(x2, 1, B + 1, axis=0)
    if which == "xor":
        return x[0, 0].astype(jnp.int32)
    h16, hist = block_entropy_h16(x, lens)
    if which == "h16":
        return h16[0]
    ll, ml, offv, n_seq, cover, lmask = zstd_parse_linked_smem(
        x2, lens_parse, min_abs, h16, gate_bits=GATE_FIXED_BITS)
    if which == "parse":
        return n_seq[0]
    seqs = _linked_post(x, lens, ll, ml, offv, n_seq, cover, hist,
                        cap=CAP, lit_mask=lmask)
    if _ldm_stats is not None:
        seqs = apply_ldm_override(seqs, _ldm_stats[0], lens_h,
                                  _ldm_stats[1])
    if which == "post":
        return seqs["hist"][0, 0] + seqs["n_seq"][0]
    from libzseek_tpu.ops import huffman_plan as hp
    from libzseek_tpu.ops import pallas_entropy as pe
    mode, mode_bits, codes_packed, weights_packed, _rle, sizes4 = \
        hp.plan_blocks(
            seqs["hist"], seqs["lit_count"], seqs["n_seq"], seqs["const"],
            lens, mode_huf=pe.MODE_HUF, mode_huf1=pe.MODE_HUF1,
            mode_rawlit=pe.MODE_RAWLIT, mode_seq=pe.MODE_SEQ,
            hist_q=seqs["hist_q"])
    if which == "plan":
        return mode[0] + codes_packed[0, 0]
    from libzseek_tpu.ops import fse_plan as fpl
    sflags, ctabs, norms, rle_syms, _gain = fpl.plan_seq_tables(
        seqs["ll"], seqs["ml"], seqs["offv"], seqs["n_seq"])
    mode_bits = mode_bits | jnp.where(
        (mode_bits & pe.MODE_SEQ) != 0, sflags, 0)
    if which == "fseplan":
        return sflags[0] + norms[0, 0]
    from libzseek_tpu.ops import vector_entropy as ve
    # default ON: production's adaptive hint starts True (zstd_codec)
    use_vec = os.environ.get("ZN_VECLIT", "on") != "off" \
        and "lit_mask" in seqs
    if use_vec:
        vec_mask = (((mode_bits & pe.MODE_HUF) != 0)
                    & ((mode_bits & pe.MODE_HUF1) == 0)
                    & (seqs["lit_count"] >= ve.VEC_MIN_LC))
        kmode = jnp.where(vec_mask, mode_bits & ~pe.MODE_HUF, mode_bits)
    else:
        vec_mask = None
        kmode = mode_bits
    meta = jnp.concatenate(
        [jnp.stack([lens, seqs["lit_count"].astype(jnp.int32),
                    seqs["n_seq"].astype(jnp.int32), kmode], axis=1),
         sizes4.astype(jnp.int32)], axis=1)
    lit_cap = _ceil_to(N + 64, 128)
    seq_cap = _ceil_to(9 * CAP + 64, 128)
    pc = None if os.environ.get("ZN_PAIRS", "on") == "off" \
        else pe.build_pair_codes(codes_packed)
    lit_w, seq_w, osz, lanch, sanch = pe.entropy_emit_smem(
        x, seqs["ll"], seqs["ml"], seqs["offv"], meta,
        codes_packed, CAP, lit_cap, seq_cap, ctabs=ctabs, pcodes=pc)
    if vec_mask is not None:
        vflat, vsz, vanch = ve.vector_literals(
            x, seqs["lit_mask"], codes_packed, lens, vec_mask, lit_cap)
        lit_w = jnp.where(vec_mask[:, None], vflat, lit_w)
        osz = jnp.concatenate(
            [jnp.where(vec_mask[:, None], vsz, osz[:, :4]), osz[:, 4:]],
            axis=1)
        lanch = jnp.where(vec_mask[:, None, None], vanch, lanch)
    if which == "entropy":
        return osz[0, 0] + osz[0, 4] + lanch[0, 0, 0]
    lit_bytes_dev = jnp.sum(osz[:, :4], axis=1)
    flat, base_w, lw_w = compact_payload(
        lit_w, lit_bytes_dev, seq_w, osz[:, 4], 1 << 20)
    return (flat[0] & 1).astype(jnp.int32) + base_w[B - 1]


def scan_fn(which):
    @jax.jit
    def run(d0):
        def step(c, _):
            return chain_to(which, c) & 1, None
        c, _ = jax.lax.scan(step, d0, None, length=K)
        return c
    return run


prev = 0.0
xor_ms = 0.0
print(f"corpus={kind} B={B} K={K}  (cumulative prefixes; Δ = stage cost)")
for which in ("xor", "h16", "parse", "post", "plan", "fseplan", "entropy",
              "compact"):
    fn = scan_fn(which)
    _ = np.asarray(fn(jnp.int32(0)))
    best = 1e9
    for arg in (0, 1):
        t0 = time.time()
        _ = np.asarray(fn(jnp.int32(arg)))
        best = min(best, time.time() - t0)
    ms = best / K * 1000
    if which == "xor":
        xor_ms = ms
    print(f"{which:>8}: {ms:8.1f} ms/iter   Δ {ms - prev:7.1f} ms   "
          f"({B * N / (best / K) / 2**20:7.1f} MiB/s cumulative)")
    prev = ms
adj = prev - xor_ms
print(f"production chain (minus the {xor_ms:.1f} ms dep-injection copy "
      f"the harness adds): {adj:.1f} ms = "
      f"{B * N / (adj / 1000) / 2**20:.1f} MiB/s")
