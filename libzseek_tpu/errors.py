"""Error model.

The reference reports errors via boolean/ssize_t returns plus a fixed 80-byte
message buffer filled by set_error (/root/reference/src/common.c:45-54,
src/zseek.h:36).  The idiomatic Python equivalent is a typed exception
hierarchy carrying the same message; ZSEEK_ERRBUF_SIZE survives as the
truncation bound used when rendering messages into the C-compatible layer.
"""

ERRBUF_SIZE = 80


class ZseekError(Exception):
    """Base error for the framework (maps to the reference's errbuf text)."""

    def errbuf(self) -> str:
        """The message as it would appear in a zseek errbuf (truncated)."""
        return str(self)[: ERRBUF_SIZE - 1]


class FormatError(ZseekError):
    """Malformed archive / container data."""


class IOCallbackError(ZseekError):
    """A pluggable IO callback failed (wraps errno-style detail)."""


class ParameterError(ZseekError):
    """Invalid open/write/read parameters."""
