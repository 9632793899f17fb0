"""CLI tools: qzip (gzip workalike), qzstd (lz4s→zstd), aqzip (async)."""
