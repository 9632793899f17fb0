"""Software fallback codec (host CPU) — analog of ``src/qatzip_sw.c``.

First-class path, not an afterthought: routes here when input is below the
session threshold, when no accelerator is available, or for formats the
accelerated path can't parse (exactly the reference's gating,
src/qatzip.c:2098-2116 / :2886-2899).
"""

from .codec import (  # noqa: F401
    sw_compress,
    sw_decompress,
    sw_decompress_multi,
    deflate_raw_compress,
    inflate_raw,
    lz4_frame_compress,
    lz4_frame_decompress,
    lz4s_blocks_compress,
)
