"""Debug, counters, timing and chunking utilities."""

from .debug import qz_log, qz_error, Counters, get_counters  # noqa: F401
