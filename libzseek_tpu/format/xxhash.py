"""XXH32 — needed by the LZ4 frame format (header checksum byte, optional
content/block checksums) and by zstd's optional XXH64 content checksum.

Host-side implementation: checksums guard container metadata (cold path);
frame payload checksumming is optional in both formats and off by default in
the reference writer (LZ4F_preferences_t zeroed except autoFlush/blockSizeID,
/root/reference/src/compress.c:203-207; zstd checksumFlag unset).
"""

from __future__ import annotations

import numpy as np

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """Reference-exact XXH32 (validated against stock lz4 frame headers)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while i <= limit:
            for k, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 4 * k: i + 4 * k + 4], "little")
                v = (v + lane * _P2) & _M32
                v = _rotl(v, 13)
                v = (v * _P1) & _M32
                if k == 0: v1 = v
                elif k == 1: v2 = v
                elif k == 2: v3 = v
                else: v4 = v
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        lane = int.from_bytes(data[i: i + 4], "little")
        h = (h + lane * _P3) & _M32
        h = (_rotl(h, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M32
        h = (_rotl(h, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h
