"""zstd frame codec: host orchestration + container assembly around the
device pipelines (ops/zstd_encode.py, ops/zstd_decode.py).

Encode flow per batch of frames (rows = independent 128 KiB blocks):
  device: LZ77 parse -> sequences + literals + histograms
  host:   Huffman table build per block (tiny), mode decisions
  device: Huffman 4-stream literal encode; FSE sequence encode (predefined
          distributions)
  host:   section headers + block headers + frame header assembly, with
          raw-literals / raw-block fallbacks so output never expands beyond
          the format's bound.

Output frames are standard zstd frames (single-segment, content size
present), verified against stock libzstd in the test-suite.  Equivalent
reference path: ZSTD_compress2 inside compress_frame_zstd
(/root/reference/src/compress.c:653-702).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from libzseek_tpu import native
from libzseek_tpu.errors import FormatError
from libzseek_tpu.format import hints
from libzseek_tpu.format import zstd_frame as zf
from libzseek_tpu.ops import huffman
from libzseek_tpu.ops.zstd_encode import (compact_payload,
                                          fse_encode_sequences,
                                          huffman_encode_literals,
                                          zstd_sequences)

import os as _os

# Block size: the format's 128 KiB maximum by default.  Smaller blocks
# double the per-byte sequence budget (the parse cap is 8192 sequences
# per block — the binding constraint on dense structured text, where
# stock needs ~12K sequences per 128 KiB for full match coverage) at the
# price of more table/header overhead per byte.
BLOCK = min(int(_os.environ.get("ZN_BLOCK", zf.BLOCK_MAX)), zf.BLOCK_MAX)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _lit_section_raw(lits: bytes) -> bytes:
    n = len(lits)
    if n < 32:
        head = bytes([(n << 3) | zf.LIT_RAW])
    elif n < 4096:
        head = bytes([((n & 0xF) << 4) | (0b01 << 2) | zf.LIT_RAW, n >> 4])
    else:
        head = bytes([((n & 0xF) << 4) | (0b11 << 2) | zf.LIT_RAW,
                      (n >> 4) & 0xFF, n >> 12])
    return head + lits


def _lit_section_rle(byte: int, n: int) -> bytes:
    if n < 32:
        head = bytes([(n << 3) | zf.LIT_RLE])
    elif n < 4096:
        head = bytes([((n & 0xF) << 4) | (0b01 << 2) | zf.LIT_RLE, n >> 4])
    else:
        head = bytes([((n & 0xF) << 4) | (0b11 << 2) | zf.LIT_RLE,
                      (n >> 4) & 0xFF, n >> 12])
    return head + bytes([byte])


def _lit_section_huff1(regen: int, comp: int, payload: bytes) -> bytes:
    """Single-stream compressed literals header (Size_Format 00, 3 bytes;
    the HUF_compress1X layout libzstd uses for literal sets < 256 bytes —
    no 6-byte jump table)."""
    v = zf.LIT_COMPRESSED | (0b00 << 2) | (regen << 4) | (comp << 14)
    return v.to_bytes(3, "little") + payload


def _lit_section_huff(regen: int, comp: int, payload: bytes) -> bytes:
    """4-stream compressed literals header (Size_Format 01/10/11)."""
    if regen <= 1023 and comp <= 1023:
        v = zf.LIT_COMPRESSED | (0b01 << 2) | (regen << 4) | (comp << 14)
        return v.to_bytes(3, "little") + payload
    if regen <= 16383 and comp <= 16383:
        v = zf.LIT_COMPRESSED | (0b10 << 2) | (regen << 4) | (comp << 18)
        return v.to_bytes(4, "little") + payload
    v = zf.LIT_COMPRESSED | (0b11 << 2) | (regen << 4) | (comp << 22)
    return v.to_bytes(5, "little") + payload


def _nbseq_header(n: int) -> bytes:
    if n < 128:
        return bytes([n])
    if n < 0x7F00:
        return bytes([(n >> 8) + 128, n & 0xFF])
    return bytes([255]) + (n - 0x7F00).to_bytes(2, "little")


LIT_ANCHOR_INTERVAL = 512
SEQ_ANCHOR_INTERVAL = 128
SMEM_SEQ_MAX = 4096   # beyond this sequence count per block: XLA fallback
SMEM_SEQ_MIN = 512    # lower bound on the kernel's sequence bucket


class ZstdCodec:
    """zstd seekable-frame codec (TPU encode pipeline; decode in
    ops/zstd_decode.py).  When collect_hints is on (default), compression
    also produces per-block decode anchors (format/hints.py) that the
    Writer publishes in a skippable sidecar frame, enabling the anchored
    parallel decode paths."""

    name = "zstd"
    supports_hints = True
    supports_device_frames = True

    def __init__(self, level: int = 3, max_batch_blocks: int = 64,
                 collect_hints: bool = True, parser: str = "auto",
                 entropy: str = "auto", workers: int | None = None):
        self.level = level
        # N workers ≙ N chips (SURVEY.md §2 parallelism inventory): batches
        # round-robin over the first `workers` devices — frames are
        # independent compression units, so scale-out needs no collectives;
        # the ordered fetch in the finish step is the reference's
        # drain-in-order analog (/root/reference/src/compress.c:294-333)
        self._devices = None
        self._rr = 0
        if workers and workers > 1:
            devs = jax.devices()
            if len(devs) > 1:
                self._devices = devs[: min(workers, len(devs))]
        # level knob maps to candidate granularity / extension length,
        # the analog of zstd's level-indexed search parameters
        self.seg_size = 8 if level <= 1 else 4
        self.max_len = 32 if level <= 1 else 48
        self.max_batch_blocks = max_batch_blocks
        self.collect_hints = collect_hints
        # block size: levels >= 4 default to 64 KiB blocks — halving the
        # block doubles the per-byte sequence budget (the 8192-per-block
        # parse cap is THE match-coverage bound on dense structured text;
        # see PERF.md r5) for ~1% table-overhead cost.  ZN_BLOCK overrides
        # both arms.
        if _os.environ.get("ZN_BLOCK"):
            self.block = BLOCK
        else:
            self.block = 65536 if level >= 4 else BLOCK
        # LZ77 parser: the SMEM hash-probe Pallas kernel (zstd-fast's own
        # algorithm on the TPU core) on real TPUs, the sort-based exact
        # pipeline elsewhere (CPU tests, interpret mode)
        self.parser = parser
        # entropy stage: "auto" = fused SMEM kernel when the parse ran
        # without a literal plane (TPU), XLA kernels otherwise; "smem" /
        # "xla" force a path (smem on CPU runs in interpret mode, tests)
        self.entropy = entropy
        # adaptive payload-fetch cap for the device-resident chain:
        # sized from recent batches' realized compressed sizes
        from collections import deque
        self._cap_hint: int | None = None
        self._needs = deque([1], maxlen=8)
        # adaptive vector-literal routing (ops/vector_entropy.py): on
        # literal-heavy batches the dense VPU/MXU emitter beats the
        # scalar SMEM loop ~4x (text: 78 -> ~16 ms per 8 MiB, mixed:
        # ~17 -> ~13); the density of the PREVIOUS batch decides the next
        # dispatch (no mid-dispatch device->host sync).  Starts True —
        # literal-heavy is the common case — and flips off on
        # highly-compressible batches
        self._vec_hint = True

    def _parser_kind(self) -> str:
        """"linked" (persistent-table gated SMEM kernel, the TPU default),
        "hash" (per-block SMEM kernel), or "sort" (exact XLA pipeline, the
        CPU/test default)."""
        if self.parser in ("linked", "hash", "sort"):
            return self.parser
        try:
            return "linked" if jax.devices()[0].platform != "cpu" \
                else "sort"
        except Exception:
            return "sort"

    # --- compress ---

    def compress_frames(self, frames: list[bytes | memoryview],
                        return_hints: bool = False):
        stream = self.begin_stream(return_hints=True)
        groups = stream.submit(frames) + stream.finish()
        out, out_hints = [], []
        for fr_out, fh in groups:
            out.extend(fr_out)
            out_hints.extend(fh)
        return (out, out_hints) if return_hints else out

    def begin_stream(self, return_hints: bool = False, depth: int = 4):
        """Open a streaming compression session: `submit(frames)` dispatches
        a frame group into the device pipeline and returns any OLDER groups
        that completed, `finish()` drains the rest.  Groups complete in
        submission order, so callers can write results straight to a sink.
        This keeps the upload/parse of group k+2 in flight while group k+1
        is on the device and group k is being assembled on the host — the
        single-batch pipeline inside compress_frames cannot overlap across
        Writer flushes."""
        return _ZstdStream(self, return_hints, depth)

    def _frame_spans(self, frames):
        spans = []
        for fi, fr in enumerate(frames):
            n = len(fr)
            if n == 0:
                continue
            for s in range(0, n, self.block):
                spans.append((fi, s, min(self.block, n - s)))
        return spans

    def _assemble_frames(self, frames, spans, block_payloads, block_hints):
        out = []
        out_hints = []
        cursor = 0
        for fi, fr in enumerate(frames):
            n = len(fr)
            head = zf.build_frame_header(n, single_segment=True)
            body = bytearray(head)
            fhints = []
            nblocks = math.ceil(n / self.block)
            if n == 0:
                body += zf.build_block_header(zf.BLOCK_RAW, 0, last=True)
                fhints.append(None)
            for b in range(nblocks):
                fi2, s, sz = spans[cursor]
                assert fi2 == fi
                payload = block_payloads[cursor]
                bh = block_hints[cursor]
                cursor += 1
                last = b == nblocks - 1
                if isinstance(payload, tuple):   # ("rle", byte)
                    body += zf.build_block_header(zf.BLOCK_RLE, sz, last)
                    body += bytes([payload[1]])
                    fhints.append(None)
                elif payload is None or len(payload) >= sz:
                    body += zf.build_block_header(zf.BLOCK_RAW, sz, last)
                    body += bytes(fr[s: s + sz])
                    fhints.append(None)
                else:
                    body += zf.build_block_header(
                        zf.BLOCK_COMPRESSED, len(payload), last)
                    body += payload
                    fhints.append(bh)
            out.append(bytes(body))
            out_hints.append(fhints)
        return out, out_hints

    def _compress_blocks(self, blocks: list[np.ndarray]):
        """Compress raw blocks -> (compressed-block payloads (None = store
        raw), per-block decode hints (None when disabled/not applicable))."""
        return self._finish_blocks(self._dispatch_parse(blocks))

    def _dispatch_parse(self, blocks: list[np.ndarray],
                        first_flags: list[bool] | None = None):
        """Stage 1 (async): upload the batch and dispatch the LZ77 parse.
        The batch is padded to a power-of-two row count so every archive
        size reuses a handful of compiled shapes (first compiles cost tens
        of seconds through a tunneled TPU).

        first_flags[i] marks block i as the first block of its frame; the
        linked parser lets later blocks match back into the preceding row
        (zstd's window), so frame starts — and batch starts, whose context
        lives in the previous batch — must be fenced off."""
        B = len(blocks)
        Bp = max(8, 1 << max(0, (B - 1).bit_length()))
        N = self.block
        parser = self._parser_kind()
        import os as _os
        import sys as _sys
        import time as _time
        _t0 = _time.time()
        if parser == "linked":
            X = np.zeros((Bp + 1, N), np.uint8)
            lens = np.zeros((Bp,), np.int32)
            min_abs = np.zeros((Bp,), np.int32)
            frame_base = np.full((Bp,), -1, np.int64)
            fb = 0
            for i, blk in enumerate(blocks):
                X[i + 1, : len(blk)] = blk
                lens[i] = len(blk)
                first = (first_flags is None or first_flags[i] or i == 0
                         or len(blocks[i - 1]) < N)
                min_abs[i] = (i + 1) * N if first else i * N
                if first:
                    fb = i * N
                frame_base[i] = fb
            for i in range(B, Bp):
                min_abs[i] = (i + 1) * N
            from libzseek_tpu.ops.zstd_encode import (apply_ldm_override,
                                                      ldm_literal_stats,
                                                      zstd_sequences_linked)
            # long-distance pre-pass (host, native): whole-block matches
            # beyond the linked parse's 256 KiB window become single
            # long-match sequences and skip the device parse
            # NOTE: covered blocks still run the (cheap, long-match-
            # dominated) parse so the persistent hash table stays warm for
            # the blocks that follow; only their output is replaced
            ldm = None
            lens_parse = None
            if _os.environ.get("ZN_LDM", "auto") != "off":
                from libzseek_tpu import native as _native
                d = _native.ldm_scan(X[1: B + 1].reshape(-1), B, N,
                                     frame_base[:B], lens[:B], 1 << 17)
                if d is not None and (d[:, 0] > 0).any():
                    ldm = ldm_literal_stats(d, blocks, Bp, N,
                                            need_plane=False)
                    # covered rows' parse output is replaced wholesale by
                    # the override, so their device parse is pure cost
                    # (long-match blocks pay a ~block-length scalar extend
                    # on the core).  Skip it — except for the LAST covered
                    # row of each run, which still parses so the
                    # persistent hash table stays warm for the next
                    # uncovered block.
                    cov = d[:, 0] > 0
                    skip = cov.copy()
                    skip[:-1] = cov[:-1] & cov[1:]
                    if skip.any():
                        lens_parse = lens.copy()
                        lens_parse[:B][skip] = 0
            if self._devices is not None:
                # commit the batch to its worker chip; every downstream op
                # (and all small uncommitted operands) follows the data
                dev = self._devices[self._rr % len(self._devices)]
                self._rr += 1
                X2d = jax.device_put(X, dev)
            else:
                X2d = jnp.asarray(X)
            interp = jax.devices()[0].platform == "cpu"
            seqs = zstd_sequences_linked(X2d, jnp.asarray(lens),
                                         jnp.asarray(min_abs),
                                         level=self.level,
                                         parse_lengths=lens_parse,
                                         interpret=interp)
            if ldm is not None:
                seqs = apply_ldm_override(seqs, ldm[0], lens, ldm[1])
            Xd = jax.lax.slice_in_dim(X2d, 1, Bp + 1, axis=0)
            if self.entropy in ("auto", "smem"):
                staged = self._dispatch_chain(seqs, lens[:B], Xd, lens,
                                              interp)
                if _os.environ.get("ZN_PROFILE"):
                    print(f"[ZN_PROFILE dispatch] {_time.time() - _t0:.3f}s",
                          file=_sys.stderr)
                return staged
            packed = self._pack_small(seqs)
            if _os.environ.get("ZN_PROFILE"):
                print(f"[ZN_PROFILE dispatch] {_time.time() - _t0:.3f}s",
                      file=_sys.stderr)
            return seqs, lens[:B], Xd, lens, packed
        X = np.zeros((Bp, N), np.uint8)
        lens = np.zeros((Bp,), np.int32)
        frame_base = np.full((Bp,), -1, np.int64)
        fb = 0
        for i, blk in enumerate(blocks):
            X[i, : len(blk)] = blk
            lens[i] = len(blk)
            first = (first_flags is None or first_flags[i] or i == 0
                     or len(blocks[i - 1]) < N)
            if first:
                fb = i * N
            frame_base[i] = fb
        ldm = None
        if _os.environ.get("ZN_LDM", "auto") != "off":
            from libzseek_tpu import native as _native
            from libzseek_tpu.ops.zstd_encode import ldm_literal_stats
            d = _native.ldm_scan(X[:B].reshape(-1), B, N,
                                 frame_base[:B], lens[:B], 1 << 17)
            if d is not None and (d[:, 0] > 0).any():
                ldm = ldm_literal_stats(d, blocks, Bp, N, need_plane=True)
        Xd = jnp.asarray(X)
        if parser == "hash":
            if self.entropy in ("auto", "smem"):
                from libzseek_tpu.ops.zstd_encode import \
                    zstd_sequences_fast_nolit
                seqs = zstd_sequences_fast_nolit(Xd, jnp.asarray(lens))
            else:
                from libzseek_tpu.ops.zstd_encode import zstd_sequences_fast
                seqs = zstd_sequences_fast(Xd, jnp.asarray(lens))
        else:
            seqs = zstd_sequences(Xd, jnp.asarray(lens),
                                  seg_size=self.seg_size,
                                  max_len=self.max_len)
        if ldm is not None:
            from libzseek_tpu.ops.zstd_encode import apply_ldm_override
            seqs = apply_ldm_override(seqs, ldm[0], lens, ldm[1], ldm[2])
        packed = self._pack_small(seqs)
        if _os.environ.get("ZN_PROFILE"):
            print(f"[ZN_PROFILE dispatch] {_time.time() - _t0:.3f}s",
                  file=_sys.stderr)
        return seqs, lens[:B], Xd, lens, packed

    # --- fully device-resident chain (linked parser + SMEM entropy) ---
    #
    # parse -> Huffman plan (ops/huffman_plan.py) -> entropy kernel ->
    # payload compaction are all dispatched back-to-back at submit time and
    # both device->host transfers start asynchronously right away, so the
    # finish step only unpacks and assembles.  This keeps the device FIFO
    # free of host round trips (the old flow fetched histograms and built
    # tables on host between parse and entropy, letting later batches'
    # parses jump the queue ahead of this batch's entropy stage).

    @staticmethod
    def _bucket_words(n: int) -> int:
        """Round a word count up to 2 mantissa bits (<= 25 % overshoot) so
        the adaptive payload cap reuses a handful of compiled shapes."""
        n = max(int(n), 1 << 14)
        e = max(0, n.bit_length() - 3)
        return ((n + (1 << e) - 1) >> e) << e

    def _cap_words_for(self, batch_words: int) -> int:
        hint = self._cap_hint
        if hint is None:
            # first batch: assume ratio <= 0.5 + slack; the overflow
            # refetch path covers harder data
            return self._bucket_words(batch_words // 2 + (1 << 14))
        return hint

    def _dispatch_chain(self, seqs, lens, x_dev, lens_pad, interp):
        from libzseek_tpu.ops import huffman_plan as hp
        from libzseek_tpu.ops import pallas_entropy as pe
        Bp = seqs["n_seq"].shape[0]
        N = self.block
        S = seqs["ll"].shape[1]       # entropy kernel spans the parse cap
        lit_cap = _ceil_to(N + 64, 128)
        seq_cap = _ceil_to(9 * S + 64, 128)
        lens_dev = jnp.asarray(lens_pad.astype(np.int32))
        mode, mode_bits, codes_packed, weights_packed, _rle, sizes4 = \
            hp.plan_blocks(
                seqs["hist"], seqs["lit_count"], seqs["n_seq"],
                seqs["const"], lens_dev, mode_huf=pe.MODE_HUF,
                mode_huf1=pe.MODE_HUF1, mode_rawlit=pe.MODE_RAWLIT,
                mode_seq=pe.MODE_SEQ, hist_q=seqs["hist_q"])
        # per-block sequence-table choice (RLE / FSE_Compressed /
        # predefined per stream type, ops/fse_plan.py); the flags ride in
        # the kernel's mode word and the norms are fetched for the host's
        # table-description serialization
        from libzseek_tpu.ops import fse_plan as fpl
        sflags, ctabs, norms, rle_syms, _gain = fpl.plan_seq_tables(
            seqs["ll"], seqs["ml"], seqs["offv"], seqs["n_seq"])
        mode_bits = mode_bits | jnp.where(
            (mode_bits & pe.MODE_SEQ) != 0, sflags, 0)
        import os as _os3
        from libzseek_tpu.ops import vector_entropy as ve
        vec_env = _os3.environ.get("ZN_VECLIT", "auto")
        use_vec = (vec_env == "on"
                   or (vec_env == "auto" and self._vec_hint)) \
            and "lit_mask" in seqs and N == ve.N_BLOCK
        if use_vec:
            vec_mask = (((mode_bits & pe.MODE_HUF) != 0)
                        & ((mode_bits & pe.MODE_HUF1) == 0)
                        & (seqs["lit_count"] >= ve.VEC_MIN_LC))
            kmode = jnp.where(vec_mask, mode_bits & ~pe.MODE_HUF,
                              mode_bits)
        else:
            vec_mask = None
            kmode = mode_bits
        meta = jnp.concatenate(
            [jnp.stack([lens_dev, seqs["lit_count"].astype(jnp.int32),
                        seqs["n_seq"].astype(jnp.int32), kmode],
                       axis=1), sizes4.astype(jnp.int32)], axis=1)
        # premerged pair-code table (256 KiB SMEM per block) halves the
        # lookup+merge work in the issue-bound literal quad loop
        import os as _os2
        pcodes = None
        if _os2.environ.get("ZN_PAIRS", "on") != "off":
            pcodes = pe.build_pair_codes(codes_packed)
        lit_w, seq_w, osz, lanch, sanch = pe.entropy_emit_smem(
            x_dev, seqs["ll"], seqs["ml"], seqs["offv"], meta,
            codes_packed, S, lit_cap, seq_cap, ctabs=ctabs,
            interpret=interp, pcodes=pcodes)
        if vec_mask is not None:
            vflat, vsz, vanch = ve.vector_literals(
                x_dev, seqs["lit_mask"], codes_packed, lens_dev,
                vec_mask, lit_cap, interpret=interp)
            lit_w = jnp.where(vec_mask[:, None], vflat, lit_w)
            osz = jnp.concatenate(
                [jnp.where(vec_mask[:, None], vsz, osz[:, :4]),
                 osz[:, 4:]], axis=1)
            lanch = jnp.where(vec_mask[:, None, None], vanch, lanch)
        lit_bytes_dev = jnp.sum(osz[:, :4], axis=1)
        seq_bytes_dev = osz[:, 4]
        cap_words = self._cap_words_for(Bp * N // 4)
        flat, base_w, lw_w = compact_payload(
            lit_w, lit_bytes_dev, seq_w, seq_bytes_dev, cap_words)
        # blocks whose rewritten offsets use repcodes 2/3 must NOT publish
        # sequence anchors: the hint format reconstructs rep1 only
        rep23 = jnp.sum(((seqs["offv"] == 2) | (seqs["offv"] == 3))
                        .astype(jnp.int32), axis=1)
        parts = [seqs["lit_count"], seqs["n_seq"], seqs["const"], mode,
                 _rle, weights_packed.reshape(-1), base_w, lw_w,
                 osz.reshape(-1), sflags, norms.reshape(-1),
                 rle_syms.reshape(-1), rep23]
        shapes = {"lanch": lanch.shape, "sanch": sanch.shape}
        if self.collect_hints:
            parts += [lanch.reshape(-1), sanch.reshape(-1)]
        small = jnp.concatenate([p.astype(jnp.int32) for p in parts])
        for a in (small, flat):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        return {"kind": "chain", "B": len(lens), "Bp": Bp, "lens": lens,
                "small": small, "flat": flat, "cap_words": cap_words,
                "streams": (lit_w, lit_bytes_dev, seq_w, seq_bytes_dev),
                "shapes": shapes}

    def _finish_chain(self, staged):
        import os
        import time as _time
        prof = os.environ.get("ZN_PROFILE")
        marks = [("t0", _time.time())]

        def mark(name):
            if prof:
                marks.append((name, _time.time()))

        from libzseek_tpu.ops import huffman_plan as hp
        B, Bp, lens = staged["B"], staged["Bp"], staged["lens"]
        small = np.asarray(staged["small"])
        mark("small_fetch")
        pos = 0

        def take(n, shape=None):
            nonlocal pos
            out = small[pos: pos + n]
            pos += n
            return out.reshape(shape) if shape else out

        lit_count = take(Bp)
        n_seq = take(Bp)
        const = take(Bp)
        mode = take(Bp)
        rle_byte = take(Bp)
        weights_packed = take(Bp * 32, (Bp, 32))
        base_w = take(Bp)
        lw_w = take(Bp)
        osz = take(Bp * 8, (Bp, 8))
        from libzseek_tpu.ops import fse_plan as fpl
        sflags = take(Bp)
        norms = take(Bp * fpl.NORM_WIDTH, (Bp, fpl.NORM_WIDTH))
        rle_syms = take(Bp * 3, (Bp, 3))
        rep23 = take(Bp)
        if self.collect_hints:
            ls = staged["shapes"]["lanch"]
            ss = staged["shapes"]["sanch"]
            lanch = take(int(np.prod(ls))).reshape(Bp, 4, -1)
            sa = take(int(np.prod(ss))).reshape(Bp, 5, -1)
            lit_anchors = lanch
            sa_bits = sa[:, 0]
            sa_states = np.stack([sa[:, 1], sa[:, 2], sa[:, 3]], axis=2)
            sa_rep1 = sa[:, 4]
        else:
            lit_anchors = sa_bits = sa_states = sa_rep1 = None
        sizes4 = osz[:, :4]
        seq_sizes = osz[:, 4]
        need = int(base_w[Bp - 1] + lw_w[Bp - 1]
                   + (int(seq_sizes[Bp - 1]) + 3) // 4)
        cap_words = staged["cap_words"]
        if need > cap_words:
            # adaptive cap undershot (regime shift): recompact at the
            # exact bucket and refetch — rare, costs one extra round trip
            lit_w, lit_b, seq_w, seq_b = staged["streams"]
            cap_words = self._bucket_words(need)
            flat_dev, base_d, lw_d = compact_payload(
                lit_w, lit_b, seq_w, seq_b, cap_words)
            flat_bytes = np.asarray(flat_dev).view(np.uint8)
            base_w = np.asarray(base_d)
            lw_w = np.asarray(lw_d)
        else:
            flat_bytes = np.asarray(staged["flat"]).view(np.uint8)
        mark("payload_fetch")
        self._needs.append(need)
        self._cap_hint = self._bucket_words(int(max(self._needs) * 1.4))
        # vector-literal routing hint for the NEXT batch: total literal
        # bytes of eligible 4-stream-Huffman rows vs the break-even point
        # (vector path ~18 ms fixed per 8 MiB batch; scalar emission
        # ~9.4 ns/literal -> ~2M literals)
        from libzseek_tpu.ops import vector_entropy as _ve
        elig = (mode[:B] == hp.M_HUF) & (lit_count[:B] >= _ve.VEC_MIN_LC)
        vmin = int(os.environ.get("ZN_VECLIT_MIN", "2000000"))
        self._vec_hint = int(lit_count[:B][elig].sum()) >= vmin

        from libzseek_tpu import native
        weights = hp.unpack_weights(weights_packed[:B])
        trees_all = native.huf_tree_batch(weights)
        mark("trees")
        mode_names = {hp.M_SKIP: "skip", hp.M_RLEBLOCK: "rleblock",
                      hp.M_NONE: "none", hp.M_RLE: "rle", hp.M_RAW: "raw",
                      hp.M_HUF: "huf", hp.M_HUF1: "huf1"}
        modes: list[str] = []
        trees: list[bytes | None] = []
        lit_rows: dict[int, np.ndarray] = {}
        for i in range(B):
            m = mode_names[int(mode[i])]
            t = None
            if m in ("huf", "huf1"):
                t = trees_all[i]
                if t is None:
                    m = "skip"  # unserializable tree: store the block raw
            elif m == "raw" and int(lit_count[i]) > 0:
                lo = 4 * int(base_w[i])
                lit_rows[i] = flat_bytes[lo: lo + int(lit_count[i])]
            modes.append(m)
            trees.append(t)
        ent = dict(sizes4=sizes4, seq_sizes=seq_sizes,
                   flat_bytes=flat_bytes, base_w=base_w, lw_w=lw_w,
                   lit_anchors=lit_anchors, sa_bits=sa_bits,
                   sa_states=sa_states, sa_rep1=sa_rep1,
                   lit_rows=lit_rows, modes=modes, rep23=rep23,
                   sflags=sflags, norms=norms, rle_syms=rle_syms)
        out = self._assemble(B, lens, lit_count[:B], n_seq[:B], None,
                             modes, trees, ent, const=const[:B],
                             rle=rle_byte)
        mark("assemble")
        if prof:
            import sys
            line = " | ".join(f"{n} {t1 - t0:.3f}s" for (_, t0), (n, t1)
                              in zip(marks, marks[1:]))
            print(f"[ZN_PROFILE chain] {line}", file=sys.stderr)
        return out

    @staticmethod
    def _pack_small(seqs):
        """Bundle the small parse outputs into one device array and start
        its device->host transfer immediately (every transfer pays a round
        trip through a tunneled TPU; starting it at dispatch time overlaps
        it with the uploads/parses of later batches)."""
        packed = jnp.concatenate([
            seqs["hist"].reshape(-1), seqs["lit_count"], seqs["n_seq"],
            seqs["const"]])
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        return packed

    def _finish_blocks(self, staged):
        """Stage 2: fetch parse results, build tables, run the entropy
        stage (fused SMEM kernel on TPU, XLA kernels elsewhere), assemble
        block payloads + hints."""
        if isinstance(staged, dict) and staged.get("kind") == "chain":
            return self._finish_chain(staged)
        import os
        import time as _time
        prof = os.environ.get("ZN_PROFILE")
        marks = [("t0", _time.time())]

        def mark(name, fence=None):
            if prof:
                # ZN_PROFILE=2: no fences — time only the real blocking
                # waits, so the split matches production behavior
                if fence is not None and prof != "2":
                    jax.tree_util.tree_map(
                        lambda a: a.block_until_ready()
                        if hasattr(a, "block_until_ready") else a, fence)
                marks.append((name, _time.time()))

        seqs, lens, x_dev, lens_pad, packed_dev = staged
        B = lens.shape[0]           # real blocks; device arrays are padded
        Bp = seqs["n_seq"].shape[0]
        # the packed small-array transfer was started at dispatch time
        # (_pack_small); this wait usually returns immediately in steady
        # state
        packed = np.asarray(packed_dev)
        mark('packed_fetch')
        hist = packed[: Bp * 256].reshape(Bp, 256)[:B]
        lit_count = packed[Bp * 256: Bp * 256 + Bp][:B]
        n_seq = packed[Bp * 256 + Bp: Bp * 256 + 2 * Bp][:B]
        const = packed[Bp * 256 + 2 * Bp:][:B]
        nmax = int(n_seq.max()) if B else 0
        smax = max(16, 1 << max(0, (nmax - 1)).bit_length())
        smax = min(smax, seqs["ll"].shape[1])
        want_smem = self.entropy == "smem" or (
            self.entropy == "auto" and "literals" not in seqs)
        use_smem = want_smem and smax <= SMEM_SEQ_MAX
        if "literals" not in seqs and not use_smem:
            from libzseek_tpu.ops.zstd_encode import extract_literals
            seqs = dict(seqs)
            seqs["literals"] = extract_literals(
                x_dev, jnp.asarray(lens_pad), seqs["ll"], seqs["ml"],
                seqs["n_seq"])
        modes, trees, ests, code_vals, code_bits = self._decide_modes(
            hist, lit_count, n_seq, lens, Bp, exact=not use_smem,
            const=const)
        mark('host_tables')
        if use_smem:
            ent = self._entropy_smem(seqs, x_dev, lens, lit_count, n_seq,
                                     modes, trees, ests, code_vals,
                                     code_bits, smax, mark)
        else:
            ent = self._entropy_xla(seqs, lens, lit_count, n_seq, modes,
                                    trees, ests, code_vals, code_bits,
                                    smax, mark)
        out = self._assemble(B, lens, lit_count, n_seq, hist, modes, trees,
                             ent, const=const)
        mark('assemble')
        if prof:
            import sys
            line = ' | '.join(f'{n} {t1 - t0:.3f}s' for (_, t0), (n, t1)
                              in zip(marks, marks[1:]))
            print(f'[ZN_PROFILE finish] {line}', file=sys.stderr)
        return out

    def _decide_modes(self, hist, lit_count, n_seq, lens, Bp, exact,
                      const=None):
        """Per-block literal-section mode decisions + Huffman tables.

        modes: "none" | "rle" | "raw" | "huf" | "skip" ("skip" = the block
        is certain to be stored raw, so no streams are emitted at all).
        When exact=False (fused-kernel path) the huf-vs-raw decision uses
        the provable Huffman size bound up front, since the post-hoc
        fallback would need literal bytes the kernel never materializes."""
        B = len(lens)
        code_vals = np.zeros((Bp, 256), np.int32)
        code_bits = np.zeros((Bp, 256), np.int32)
        trees: list[bytes | None] = [None] * B
        modes: list[str] = ["raw"] * B
        ests: list[int] = [0] * B
        if native.have_native():
            n_lengths, n_codes, n_trees, _mb = native.huf_build_batch(
                hist.astype(np.uint32))
        else:
            n_lengths = n_codes = n_trees = None
        for i in range(B):
            lc = int(lit_count[i])
            blen = int(lens[i])
            nz = np.count_nonzero(hist[i])
            if const is not None and blen > 4 and const[i] >= 0:
                modes[i] = "rleblock"   # whole block = one repeated byte
                continue
            if lc == 0:
                modes[i] = "none"
                continue
            raw_hdr = 1 if lc < 32 else (2 if lc < 4096 else 3)
            if nz == 1:
                modes[i] = "rle"
                continue
            if lc < 64:
                ests[i] = lc + 8
                continue  # raw literals
            if n_trees is not None:
                tree, lengths, codes = n_trees[i], n_lengths[i], n_codes[i]
                if tree is None:
                    ests[i] = lc + 8
                    continue
            else:
                ct = huffman.build_ctable(hist[i])
                try:
                    tree = huffman.write_weights(ct)
                except FormatError:
                    ests[i] = lc + 8
                    continue
                lengths, codes = ct.lengths, ct.codes
            one = lc < 256 and not exact   # 1-stream (SMEM path only)
            jump = 0 if one else 6
            pad = 2 if one else 8          # per-stream sentinel/rounding
            est_bits = int(np.sum(hist[i] * lengths))
            stream_bound = est_bits // 8 + pad
            est = est_bits // 8 + len(tree) + jump + pad
            if est >= lc:
                ests[i] = lc + 8
                continue
            if not exact:
                # conservative pre-fallback (no literal bytes on host)
                payload_bound = len(tree) + jump + stream_bound
                hdr = 3 if (lc <= 1023 and payload_bound <= 1023) else \
                    4 if (lc <= 16383 and payload_bound <= 16383) else 5
                if hdr + payload_bound >= raw_hdr + lc:
                    ests[i] = lc + 8
                    continue
            trees[i] = tree
            modes[i] = "huf1" if one else "huf"
            ests[i] = stream_bound
            code_vals[i] = codes
            code_bits[i] = lengths
        # rows that stayed raw-literals and whose minimal payload already
        # reaches the block size are certain to be stored as raw blocks —
        # skip emitting any streams for them
        for i in range(B):
            if modes[i] != "raw":
                continue
            lc = int(lit_count[i])
            raw_hdr = 1 if lc < 32 else (2 if lc < 4096 else 3)
            if lc > 0 and raw_hdr + lc + 1 >= int(lens[i]):
                modes[i] = "skip"
                ests[i] = 0
        return modes, trees, ests, code_vals, code_bits

    def _fetch_payload(self, Bp, streams, lit_bytes_dev, seq_stream,
                       seq_bytes_dev, cap_words, anchors, mark):
        """compact_payload + one bundled device->host transfer.  anchors is
        a list of device arrays appended to the metadata section.  Returns
        (sizes4_like None, ...) -- actually (meta np array, flat bytes,
        base_w, lw_w, anchor arrays)."""
        flat, base_w, lw_w = compact_payload(
            streams, lit_bytes_dev, seq_stream, seq_bytes_dev, cap_words)
        meta_parts = [base_w, lw_w] + [a.reshape(-1) for a in anchors]
        meta_len = sum(int(np.prod(p.shape)) for p in meta_parts)
        fetched = np.asarray(jnp.concatenate(
            meta_parts + [jax.lax.bitcast_convert_type(flat, jnp.int32)]))
        meta = fetched[:meta_len]
        flat_bytes = fetched[meta_len:].view(np.uint8)
        mark('payload_fetch')
        base_w = meta[:Bp]
        lw_w = meta[Bp: 2 * Bp]
        rest = meta[2 * Bp:]
        outs = []
        pos = 0
        for a in anchors:
            na = int(np.prod(a.shape))
            outs.append(rest[pos: pos + na].reshape(a.shape))
            pos += na
        return flat_bytes, base_w, lw_w, outs

    def _entropy_smem(self, seqs, x_dev, lens, lit_count, n_seq, modes,
                      trees, ests, code_vals, code_bits, smax, mark):
        """Fused SMEM entropy emission (ops/pallas_entropy.py)."""
        from libzseek_tpu.ops import pallas_entropy as pe
        B = len(lens)
        Bp = seqs["n_seq"].shape[0]
        N = self.block
        S = max(SMEM_SEQ_MIN, smax)
        lit_cap = _ceil_to(N + 64, 128)
        seq_cap = _ceil_to(9 * S + 64, 128)
        mode_bits = np.zeros((Bp,), np.int32)
        for i in range(B):
            m = modes[i]
            if m == "huf":
                mode_bits[i] = pe.MODE_HUF | pe.MODE_SEQ
            elif m == "huf1":
                mode_bits[i] = pe.MODE_HUF | pe.MODE_HUF1 | pe.MODE_SEQ
            elif m == "raw" and int(lit_count[i]) > 0:
                mode_bits[i] = pe.MODE_RAWLIT | pe.MODE_SEQ
            elif m in ("none", "rle", "raw"):
                mode_bits[i] = pe.MODE_SEQ
            # "skip": 0
        meta = np.zeros((Bp, 8), np.int32)
        meta[:B, 0] = lens
        meta[:B, 1] = lit_count
        meta[:B, 2] = n_seq
        meta[:B, 3] = mode_bits[:B]
        # exact per-stream byte sizes position the kernel's 4 lockstep
        # literal streams (see ops/pallas_entropy.py)
        hq = np.asarray(seqs["hist_q"])[:B].astype(np.int64)
        bits_q = np.sum(hq * code_bits[:B, None, :], axis=2)
        for i in range(B):
            if modes[i] == "huf":
                meta[i, 4:8] = (bits_q[i] + 1 + 7) >> 3
            elif modes[i] == "huf1":
                meta[i, 4] = (int(bits_q[i].sum()) + 1 + 7) >> 3
        codes_packed = (code_vals << 4) | code_bits
        interp = jax.devices()[0].platform == "cpu"
        kout = pe.entropy_emit_smem(
            x_dev,
            jax.lax.slice_in_dim(seqs["ll"], 0, S, axis=1),
            jax.lax.slice_in_dim(seqs["ml"], 0, S, axis=1),
            jax.lax.slice_in_dim(seqs["offv"], 0, S, axis=1),
            jnp.asarray(meta), jnp.asarray(codes_packed),
            S, lit_cap, seq_cap, interpret=interp)
        lit_w, seq_w, osz, lanch, sanch = kout
        mark('entropy_kernel', osz)
        sizes4_dev = osz[:, :4]
        lit_bytes_dev = jnp.sum(sizes4_dev, axis=1)
        seq_bytes_dev = osz[:, 4]
        # + 256 B/row: compact_payload pads each row's lit and seq
        # sections to whole 128-B tiles (tile-granular gather)
        cap_bytes = sum(e + 16 for e in ests) + \
            int(np.sum(n_seq.astype(np.int64) * 9 + 12)) + 256 + 256 * Bp
        cap_words = max(1024, 1 << int(cap_bytes // 4).bit_length())
        anchors = [osz]
        if self.collect_hints:
            anchors += [lanch, sanch]
        flat_bytes, base_w, lw_w, outs = self._fetch_payload(
            Bp, lit_w, lit_bytes_dev, seq_w, seq_bytes_dev, cap_words,
            anchors, mark)
        osz_h = outs[0]
        sizes4 = osz_h[:, :4]
        seq_sizes = osz_h[:, 4]
        if B:
            need = int(base_w[B - 1] + lw_w[B - 1] +
                       (int(seq_sizes[B - 1]) + 3) // 4)
            assert need <= cap_words, \
                f"payload compaction overflow: {need} > {cap_words}"
        if self.collect_hints:
            lit_anchors = outs[1]
            sa = outs[2]
            sa_bits = sa[:, 0]
            sa_states = np.stack([sa[:, 1], sa[:, 2], sa[:, 3]], axis=2)
            sa_rep1 = sa[:, 4]
        else:
            lit_anchors = sa_bits = sa_states = sa_rep1 = None
        # raw-literal rows read their bytes from the flat buffer
        lit_rows: dict[int, np.ndarray] = {}
        for i in range(B):
            if mode_bits[i] & pe.MODE_RAWLIT:
                lo = 4 * int(base_w[i])
                lit_rows[i] = flat_bytes[lo: lo + int(lit_count[i])]
        rep23 = np.asarray(jnp.sum(
            ((seqs["offv"] == 2) | (seqs["offv"] == 3)).astype(jnp.int32),
            axis=1))
        return dict(sizes4=sizes4, seq_sizes=seq_sizes,
                    flat_bytes=flat_bytes, base_w=base_w, lw_w=lw_w,
                    lit_anchors=lit_anchors, sa_bits=sa_bits,
                    sa_states=sa_states, sa_rep1=sa_rep1, lit_rows=lit_rows,
                    modes=modes, rep23=rep23)

    def _entropy_xla(self, seqs, lens, lit_count, n_seq, modes, trees,
                     ests, code_vals, code_bits, smax, mark):
        """XLA entropy kernels (CPU tests / interpret / big-seq fallback)."""
        B = len(lens)
        Bp = seqs["n_seq"].shape[0]
        N = self.block
        # Rows already decided non-Huffman (raw/RLE/none) are masked out of
        # the literal kernel — they would otherwise inflate lcap to the
        # block size (incompressible rows) and the packing cost with it.
        huf_counts = np.where(np.array([m == "huf" for m in modes]),
                              lit_count, 0)
        lit_count_dev = np.zeros((Bp,), np.int32)
        lit_count_dev[:B] = huf_counts
        lmax = int(huf_counts.max()) if B else 0
        lcap = min(N, max(128, 1 << max(0, (lmax - 1)).bit_length()))
        lit_cap = _ceil_to(lcap + 64, 128)
        hout = huffman_encode_literals(
            jax.lax.slice_in_dim(seqs["literals"], 0, lcap, axis=1),
            jnp.asarray(lit_count_dev),
            jnp.asarray(code_vals), jnp.asarray(code_bits), lit_cap,
            anchor_interval=LIT_ANCHOR_INTERVAL if self.collect_hints else 0,
            return_words=True)
        streams, sizes4_dev = hout[0], hout[1]
        mark('huf_kernel', hout)
        seq_cap = _ceil_to(min(N // 2, 11 * smax) + 64, 128)
        fout = fse_encode_sequences(
            jax.lax.slice_in_dim(seqs["ll"], 0, smax, axis=1),
            jax.lax.slice_in_dim(seqs["ml"], 0, smax, axis=1),
            jax.lax.slice_in_dim(seqs["offv"], 0, smax, axis=1),
            seqs["n_seq"], seq_cap, smax=smax,
            anchor_interval=SEQ_ANCHOR_INTERVAL if self.collect_hints else 0,
            return_words=True)
        seq_stream, seq_sizes_dev = fout[0], fout[1]
        mark('fse_kernel', fout)
        huf_mask = np.zeros((Bp,), np.int32)
        huf_mask[:B] = [m == "huf" for m in modes]
        lit_bytes_dev = jnp.sum(sizes4_dev, axis=1) * jnp.asarray(huf_mask)
        # + 256 B/row: compact_payload pads each row's lit and seq
        # sections to whole 128-B tiles (tile-granular gather)
        cap_bytes = sum(e + 16 for e in ests) + \
            int(np.sum(n_seq.astype(np.int64) * 9 + 12)) + 256 + 256 * Bp
        cap_words = max(1024, 1 << int(cap_bytes // 4).bit_length())
        anchors = [sizes4_dev.reshape(-1), seq_sizes_dev]
        if self.collect_hints:
            anchors += [hout[2], fout[2][0], fout[2][1], fout[2][2]]
        flat_bytes, base_w, lw_w, outs = self._fetch_payload(
            Bp, streams, lit_bytes_dev, seq_stream, seq_sizes_dev,
            cap_words, anchors, mark)
        sizes4 = outs[0].reshape(Bp, 4)
        seq_sizes = outs[1]
        if B:
            need = int(base_w[B - 1] + lw_w[B - 1] +
                       (int(seq_sizes[B - 1]) + 3) // 4)
            assert need <= cap_words, \
                f"payload compaction overflow: {need} > {cap_words}"
        if self.collect_hints:
            lit_anchors, sa_bits, sa_states, sa_rep1 = outs[2:6]
        else:
            lit_anchors = sa_bits = sa_states = sa_rep1 = None
        # exact huf->raw fallback from the fetched sizes, then fetch
        # bytes for rows that need them on host (raw payloads)
        for i in range(B):
            if modes[i] != "huf":
                continue
            lc = int(lit_count[i])
            payload_len = len(trees[i]) + 6 + int(sizes4[i].sum())
            hdr = 3 if (lc <= 1023 and payload_len <= 1023) else \
                4 if (lc <= 16383 and payload_len <= 16383) else 5
            raw_hdr = 1 if lc < 32 else (2 if lc < 4096 else 3)
            if hdr + payload_len >= raw_hdr + lc:
                modes[i] = "raw"
                trees[i] = None
        need_rows = [i for i in range(B)
                     if modes[i] == "raw" and lit_count[i] > 0]
        lit_rows: dict[int, np.ndarray] = {}
        if need_rows:
            picked = np.asarray(seqs["literals"][jnp.asarray(need_rows)])
            lit_rows = {r: picked[k][: int(lit_count[r])]
                        for k, r in enumerate(need_rows)}
        rep23 = np.asarray(jnp.sum(
            ((seqs["offv"] == 2) | (seqs["offv"] == 3)).astype(jnp.int32),
            axis=1))
        return dict(sizes4=sizes4, seq_sizes=seq_sizes,
                    flat_bytes=flat_bytes, base_w=base_w, lw_w=lw_w,
                    lit_anchors=lit_anchors, sa_bits=sa_bits,
                    sa_states=sa_states, sa_rep1=sa_rep1, lit_rows=lit_rows,
                    modes=modes, rep23=rep23)

    @staticmethod
    def _seq_table_desc(ent, i) -> bytes:
        """Compression-modes byte + table descriptions (RFC 8878
        §3.1.1.3.2.1): Predefined (0), RLE (1: one symbol byte), or
        FSE_Compressed (2: serialized normalized counts), per stream in
        LL, OF, ML order.  Paths without a sequence-table plan (XLA
        entropy fallback) emit all-predefined."""
        sflags = ent.get("sflags")
        if sflags is None:
            return bytes([0x00])
        from libzseek_tpu.ops import fse, fse_plan as fpl
        fl = int(sflags[i])
        out = bytearray()
        modes2 = []
        descs = []
        off = 0
        for key, rbit, fbit in (("ll", fpl.MODE_LL_RLE, fpl.MODE_LL_FSE),
                                ("of", fpl.MODE_OF_RLE, fpl.MODE_OF_FSE),
                                ("ml", fpl.MODE_ML_RLE, fpl.MODE_ML_FSE)):
            nsym = fpl.NSYMS[key]
            if fl & rbit:
                modes2.append(1)
                ki = {"ll": 0, "of": 1, "ml": 2}[key]
                descs.append(bytes([int(ent["rle_syms"][i, ki])]))
            elif fl & fbit:
                modes2.append(2)
                norm = np.asarray(ent["norms"][i, off: off + nsym])
                from libzseek_tpu.ops.pallas_entropy import MODE_LOG_SHIFT
                lg = (fl >> MODE_LOG_SHIFT[key]) & 15
                descs.append(fse.write_norm_counts(
                    norm, lg or fpl.LOGS[key]))
            else:
                modes2.append(0)
                descs.append(b"")
            off += nsym
        out.append((modes2[0] << 6) | (modes2[1] << 4) | (modes2[2] << 2))
        for d in descs:
            out += d
        return bytes(out)

    def _assemble(self, B, lens, lit_count, n_seq, hist, modes, trees, ent,
                  const=None, rle=None):
        """Build per-block payloads + decode hints from fetched streams."""
        sizes4 = ent["sizes4"]
        seq_sizes = ent["seq_sizes"]
        flat_bytes = ent["flat_bytes"]
        base_w = ent["base_w"]
        lw_w = ent["lw_w"]
        lit_anchors = ent["lit_anchors"]
        sa_bits, sa_states, sa_rep1 = (ent["sa_bits"], ent["sa_states"],
                                       ent["sa_rep1"])
        lit_rows = ent["lit_rows"]
        modes = ent["modes"]
        out: list[bytes | None] = []
        out_h: list[object | None] = []
        for i in range(B):
            lc = int(lit_count[i])
            if modes[i] == "skip":
                out.append(None)
                out_h.append(None)
                continue
            if modes[i] == "rleblock":
                out.append(("rle", int(const[i])))
                out_h.append(None)
                continue
            lit_h = None
            if modes[i] == "none":
                lit_sec = _lit_section_raw(b"")
            elif modes[i] == "rle":
                b = int(rle[i]) if rle is not None \
                    else int(np.argmax(hist[i]))
                lit_sec = _lit_section_rle(b, lc)
            elif modes[i] == "huf1":
                lo = 4 * int(base_w[i])
                payload = trees[i] + \
                    flat_bytes[lo: lo + int(sizes4[i, 0])].tobytes()
                lit_sec = _lit_section_huff1(lc, len(payload), payload)
            elif modes[i] == "huf":
                jump = b"".join(int(sizes4[i, k]).to_bytes(2, "little")
                                for k in range(3))
                lo = 4 * int(base_w[i])
                payload = trees[i] + jump + \
                    flat_bytes[lo: lo + int(sizes4[i].sum())].tobytes()
                lit_sec = _lit_section_huff(lc, len(payload), payload)
                if lit_anchors is not None:
                    sA = LIT_ANCHOR_INTERVAL
                    s123 = (lc + 3) >> 2
                    cnts = [s123, s123, s123, lc - 3 * s123]
                    per = []
                    for s4 in range(4):
                        na = max(0, -(-cnts[s4] // sA) - 1)
                        per.append(lit_anchors[i, s4, :na].tolist())
                    lit_h = hints.StreamAnchors(sA, per)
            else:
                lits = lit_rows[i].tobytes() if i in lit_rows else b""
                lit_sec = _lit_section_raw(lits)
            ns = int(n_seq[i])
            seq_sec = _nbseq_header(ns)
            seq_h = None
            rep23 = ent.get("rep23")
            if ns > 0:
                seq_sec += self._seq_table_desc(ent, i)
                lo = 4 * int(base_w[i] + lw_w[i])
                seq_sec += flat_bytes[lo: lo + int(seq_sizes[i])].tobytes()
                if sa_bits is not None and \
                        not (rep23 is not None and rep23[i]):
                    sA = SEQ_ANCHOR_INTERVAL
                    na = max(0, -(-ns // sA) - 1)
                    seq_h = hints.SeqAnchors(
                        sA, sa_bits[i, :na].tolist(),
                        sa_states[i, :na].tolist(),
                        sa_rep1[i, :na].tolist())
            payload = lit_sec + seq_sec
            out.append(payload if len(payload) < int(lens[i]) else None)
            out_h.append(hints.BlockHints(lit_h, seq_h)
                         if (lit_h or seq_h) else None)
        return out, out_h

    # --- decompress ---

    def decompress_frame(self, data: bytes, d_size: int,
                         frame_hints=None) -> bytes:
        return self.decompress_frames([data], [d_size], [frame_hints])[0]

    def decompress_frames(self, datas: list[bytes], d_sizes: list[int],
                          frame_hints: list | None = None,
                          to_device: bool = False) -> list[bytes]:
        from libzseek_tpu.ops.zstd_decode import decode_frames
        return decode_frames(datas, d_sizes, hints=frame_hints,
                             to_device=to_device)


class _ZstdStream:
    """Streaming compression session (see ZstdCodec.begin_stream).

    Groups of frames move through a global FIFO of device batches; at most
    `depth` batches stay in flight, older ones are finished (fetched +
    assembled) as new ones are submitted, so device compute, both tunnel
    directions and host assembly overlap continuously across Writer
    flushes."""

    def __init__(self, codec: ZstdCodec, return_hints: bool, depth: int):
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        self._codec = codec
        self._return_hints = return_hints
        self._depth = max(1, depth)
        self._groups = deque()
        self._inflight = 0
        # one worker thread runs the finish chain (blocking fetches, table
        # build, entropy dispatch, assembly) so the main thread keeps
        # uploading/dispatching later batches: the tunnel round trips of
        # batch k then overlap the uploads of batch k+1.  A single worker
        # keeps batches finishing in FIFO order.
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="zseek-finish")

    def submit(self, frames):
        from collections import deque
        codec = self._codec
        frames = list(frames)
        spans = codec._frame_spans(frames)
        g = {"frames": frames, "spans": spans, "batches": deque(),
             "payloads": {}, "bhints": {}}
        for lo in range(0, len(spans), codec.max_batch_blocks):
            chunk = spans[lo: lo + codec.max_batch_blocks]
            st = codec._dispatch_parse(
                [np.frombuffer(frames[fi], np.uint8, sz, s)
                 for fi, s, sz in chunk],
                first_flags=[s == 0 for _, s, _ in chunk])
            g["batches"].append(
                (lo, self._pool.submit(codec._finish_blocks, st)))
            self._inflight += 1
        self._groups.append(g)
        return self._drain(self._depth)

    def finish(self):
        out = self._drain(0)
        self._pool.shutdown(wait=True)
        return out

    def _drain(self, depth: int):
        codec = self._codec
        while self._inflight > depth:
            g = next(gr for gr in self._groups if gr["batches"])
            lo0, fut = g["batches"].popleft()
            payloads, bhints = fut.result()
            for i, (p, bh) in enumerate(zip(payloads, bhints)):
                g["payloads"][lo0 + i] = p
                g["bhints"][lo0 + i] = bh
            self._inflight -= 1
        done = []
        while self._groups and not self._groups[0]["batches"]:
            g = self._groups.popleft()
            done.append(codec._assemble_frames(
                g["frames"], g["spans"], g["payloads"], g["bhints"]))
        return done
