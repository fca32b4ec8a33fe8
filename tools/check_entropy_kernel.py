"""Interpret-mode validation of ops/pallas_entropy vs the XLA entropy
kernels: same sequences + tables must yield bit-identical streams, sizes
and decode anchors."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax.numpy as jnp
import numpy as np

from libzseek_tpu.ops import huffman
from libzseek_tpu.ops.pallas_entropy import (MODE_HUF, MODE_RAWLIT, MODE_SEQ,
                                             entropy_emit_smem)
from libzseek_tpu.ops.zstd_encode import (fse_encode_sequences,
                                          huffman_encode_literals,
                                          zstd_sequences)

N = 4096
rng = np.random.default_rng(0)

rows = []
# text-like: biased bytes with some repeats
t = rng.choice(np.frombuffer(b"the quick brown fox jumps over it ", np.uint8),
               N).astype(np.uint8)
t[1000:1200] = t[200:400]
t[2000:2300] = t[500:800]
rows.append(t)
# repetitive
r = np.tile(np.arange(37, dtype=np.uint8), N // 37 + 1)[:N].copy()
r[3000:3050] = rng.integers(0, 256, 50)
rows.append(r)
# mostly random (raw-literals mode) with a couple of matches
z = rng.integers(0, 256, N).astype(np.uint8)
z[2048:2148] = z[0:100]
rows.append(z)

X = np.stack(rows)
B = X.shape[0]
lens = np.full((B,), N, np.int32)

seqs = zstd_sequences(jnp.asarray(X), jnp.asarray(lens))
ll = np.asarray(seqs["ll"])
ml = np.asarray(seqs["ml"])
offv = np.asarray(seqs["offv"])
n_seq = np.asarray(seqs["n_seq"])
lit_count = np.asarray(seqs["lit_count"])
hist = np.asarray(seqs["hist"])
lits_plane = np.asarray(seqs["literals"])
print("n_seq", n_seq, "lit_count", lit_count)

code_vals = np.zeros((B, 256), np.int32)
code_bits = np.zeros((B, 256), np.int32)
modes = np.zeros((B,), np.int32)
for i in range(B):
    if i < 2:
        ct = huffman.build_ctable(hist[i])
        code_vals[i] = ct.codes
        code_bits[i] = ct.lengths
        modes[i] = MODE_HUF | MODE_SEQ
    else:
        modes[i] = MODE_RAWLIT | MODE_SEQ

lc_huf = np.where(modes & MODE_HUF, lit_count, 0).astype(np.int32)

LIT_CAP = N + 128
hx = huffman_encode_literals(
    jnp.asarray(lits_plane), jnp.asarray(lc_huf),
    jnp.asarray(code_vals), jnp.asarray(code_bits), LIT_CAP,
    anchor_interval=512)
x_stream, x_sizes, x_anch = (np.asarray(hx[0]), np.asarray(hx[1]),
                             np.asarray(hx[2]))

S = int(ll.shape[1])
SEQ_CAP = 11 * S // 8 + 128
SEQ_CAP += (-SEQ_CAP) % 4
fx = fse_encode_sequences(jnp.asarray(ll), jnp.asarray(ml),
                          jnp.asarray(offv), jnp.asarray(n_seq), SEQ_CAP,
                          smax=S, anchor_interval=128)
xs_stream, xs_sizes = np.asarray(fx[0]), np.asarray(fx[1])
xa_bits, xa_states, xa_rep1 = [np.asarray(a) for a in fx[2]]

meta = np.concatenate(
    [np.stack([lens, lit_count, n_seq, modes], axis=1),
     np.zeros((B, 4), np.int32)], axis=1).astype(np.int32)
codes_packed = ((code_vals << 4) | code_bits).astype(np.int32)
k_lit, k_seq, k_osz, k_lanch, k_sanch = entropy_emit_smem(
    jnp.asarray(X), jnp.asarray(ll), jnp.asarray(ml), jnp.asarray(offv),
    jnp.asarray(meta), jnp.asarray(codes_packed), S, LIT_CAP, SEQ_CAP,
    interpret=True)
k_lit = np.asarray(k_lit).view(np.uint8).reshape(B, -1)
k_seq = np.asarray(k_seq).view(np.uint8).reshape(B, -1)
k_osz = np.asarray(k_osz)
k_lanch = np.asarray(k_lanch)
k_sanch = np.asarray(k_sanch)

ok = True
for i in range(B):
    if modes[i] & MODE_HUF:
        xs4 = x_sizes[i]
        ks4 = k_osz[i, :4]
        if not np.array_equal(xs4, ks4):
            print(f"row {i}: stream sizes differ XLA {xs4} kernel {ks4}")
            ok = False
        tot = int(xs4.sum())
        if not np.array_equal(x_stream[i, :tot], k_lit[i, :tot]):
            d = np.nonzero(x_stream[i, :tot] != k_lit[i, :tot])[0]
            print(f"row {i}: lit stream bytes differ at {d[:8]} of {tot}")
            ok = False
        # anchors: compare the valid prefix per stream
        s123 = (int(lit_count[i]) + 3) >> 2
        cnts = [s123, s123, s123, int(lit_count[i]) - 3 * s123]
        for s4 in range(4):
            na = max(0, -(-cnts[s4] // 512) - 1)
            if not np.array_equal(x_anch[i, s4, :na], k_lanch[i, s4, :na]):
                print(f"row {i} stream {s4}: lit anchors differ "
                      f"{x_anch[i, s4, :na]} vs {k_lanch[i, s4, :na]}")
                ok = False
    if modes[i] & MODE_RAWLIT:
        lc = int(lit_count[i])
        if not np.array_equal(lits_plane[i, :lc], k_lit[i, :lc]):
            print(f"row {i}: raw literals differ")
            ok = False
        if k_osz[i, 0] != lc:
            print(f"row {i}: raw lit size {k_osz[i, 0]} != {lc}")
            ok = False
    ns = int(n_seq[i])
    if ns > 0:
        if xs_sizes[i] != k_osz[i, 4]:
            print(f"row {i}: seq bytes {xs_sizes[i]} vs {k_osz[i, 4]}")
            ok = False
        tot = int(xs_sizes[i])
        if not np.array_equal(xs_stream[i, :tot], k_seq[i, :tot]):
            d = np.nonzero(xs_stream[i, :tot] != k_seq[i, :tot])[0]
            print(f"row {i}: seq stream differs at {d[:8]} of {tot}")
            ok = False
        na = max(0, -(-ns // 128) - 1)
        if not np.array_equal(xa_bits[i, :na], k_sanch[i, 0, :na]):
            print(f"row {i}: seq anchor bits {xa_bits[i, :na]} vs "
                  f"{k_sanch[i, 0, :na]}")
            ok = False
        for k3 in range(3):
            if not np.array_equal(xa_states[i, :na, k3],
                                  k_sanch[i, 1 + k3, :na]):
                print(f"row {i}: seq anchor states[{k3}] differ "
                      f"{xa_states[i, :na, k3]} vs {k_sanch[i, 1 + k3, :na]}")
                ok = False
        if not np.array_equal(xa_rep1[i, :na], k_sanch[i, 4, :na]):
            print(f"row {i}: rep1 {xa_rep1[i, :na]} vs {k_sanch[i, 4, :na]}")
            ok = False

print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
