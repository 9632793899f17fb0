"""lz4s→zstd post-process pipeline (the qzstd bridge).

Parity reference: ``zstdCallBack`` (utils/qzstd.c:211-278) — the LZ4S_BK
session's output (a [blk_size:u32][lz4s payload]* stream) is decoded into
(litlen, matchlen, offset) sequences and re-emitted as standard zstd frames
via ZSTD_compressSequences with explicit block delimiters. The heavy
lifting is in csrc/qztpu_native.cpp (qz_zstd_post_process,
qz_lz4s_decode_block); a pure-Python fallback covers native-less runs.
"""

from __future__ import annotations

from typing import Optional

from .constants import QZ_POST_PROCESS_ERROR, QzError


def zstd_callback(external, src: bytes, lz4s_blocks: bytes,
                  mini_match: int) -> bytes:
    """qzLZ4SCallbackFn-compatible hook for SessionParamsLZ4S.qzCallback.

    ``external`` may carry {"level": int} (the reference threads a cctx
    through the external pointer, utils/qzstd.c:317-318).
    """
    level = 0
    if isinstance(external, dict):
        level = int(external.get("level", 0))
    from . import native
    if native.lib is not None:
        try:
            return native.lib.zstd_post_process(src, lz4s_blocks,
                                                mini_match, level)
        except RuntimeError as e:
            raise QzError(QZ_POST_PROCESS_ERROR, str(e)) from None
    # fallback: plain zstd of the source (valid frames, no sequence reuse)
    try:
        import zstandard  # noqa: F401 — only if present
    except ImportError:
        raise QzError(QZ_POST_PROCESS_ERROR,
                      "no zstd backend available") from None
    import zstandard as zstd
    return zstd.ZstdCompressor(level=max(level, 1)).compress(src)


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    from . import native
    if native.lib is None:
        raise QzError(QZ_POST_PROCESS_ERROR, "native zstd unavailable")
    return native.lib.zstd_compress(data, level)


def zstd_decompress(data: bytes, max_out: Optional[int] = None) -> bytes:
    """Streaming zstd decode of one-or-more frames."""
    from . import native
    if native.lib is None:
        raise QzError(QZ_POST_PROCESS_ERROR, "native zstd unavailable")
    out = bytearray()
    pos = 0
    # frames may be concatenated; decode each with a size-doubling retry
    import struct
    while pos + 4 <= len(data):
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            (sz,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + sz
            continue
        if magic != 0xFD2FB528:
            break
        # find frame end by letting native decode the remainder
        cap = max(1 << 20, 4 * (len(data) - pos))
        while True:
            try:
                piece = native.lib.zstd_decompress(data[pos:], cap)
                break
            except RuntimeError:
                cap *= 4
                if cap > (1 << 33):
                    raise
        out += piece
        # native one-shot consumes all frames in the tail
        pos = len(data)
    return bytes(out)
