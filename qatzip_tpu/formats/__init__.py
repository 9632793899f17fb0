"""Byte-exact on-wire format serializers/parsers (header/footer/framing).

TPU-native analog of the reference format layer:
``src/qatzip_gzip.c`` / ``src/qatzip_lz4.c`` / ``src/qatzip_utils.c:731-856``.
Everything here is pure host-side Python over ``bytes``/``memoryview`` —
no JAX imports — so the framing layer stays importable in lightweight CLIs.
"""

from .gzip_format import (  # noqa: F401
    QzGzipHeader,
    GZIP_HEADER_SZ,
    GZIP_EXT_HEADER_SZ,
    GZIP_FOOTER_SZ,
    gzip_ext_header,
    std_gzip_header,
    gzip_footer,
    parse_gzip_header,
    find_std_gzip_footer,
    qz4b_header,
    QZ4B_HEADER_SZ,
    output_header_gen,
    output_footer_gen,
    output_header_sz,
    output_footer_sz,
    check_header,
    scan_members,
)
from .lz4_format import (  # noqa: F401
    LZ4_FRAME_HEADER_SZ,
    LZ4_FRAME_FOOTER_SZ,
    lz4_frame_header,
    lz4_frame_footer,
    parse_lz4_frame_header,
    find_lz4_footer,
    verify_lz4_frame_header,
    lz4s_block_header,
    walk_lz4_blocks,
)
