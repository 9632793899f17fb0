"""Compute ops: host checksums + TPU (JAX/XLA/Pallas) codec kernels.

Host-side modules (``xxhash``, ``checksum``) are numpy/ctypes-only.
Device-side modules (``crc32_jax``, ``lz77``, ``deflate_encode``,
``lz4_encode``) import JAX and must be imported lazily by callers that want
to stay JAX-free.
"""

from .xxhash import xxh32  # noqa: F401
from .checksum import (crc32, crc32_combine, crc32_combine_many,  # noqa: F401
                       adler32, adler32_combine)
