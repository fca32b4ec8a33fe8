"""zstd frame codec (TPU encode/decode pipelines).

Placeholder module boundary: the zstd compute path (LZ77 sequences ->
FSE/Huffman entropy coding per RFC 8878) lands behind the same Codec
interface as LZ4Codec.  See ops/zstd_encode.py / ops/zstd_decode.py.
"""

from __future__ import annotations

from libzseek_tpu.errors import ZseekError


class ZstdCodec:
    name = "zstd"

    def __init__(self, level: int = 3):
        self.level = level
        raise ZseekError("zstd codec: TPU pipeline not wired up yet "
                         "(use codec='lz4')")
