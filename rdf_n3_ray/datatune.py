"""Ray Data engine tuning applied at every entry point.

Central switchboard so bench.py, scripts/, tests/ and __ray_entry__
agree on engine-level Ray Data settings (the library itself never
touches global state implicitly — callers opt in, like tune_malloc).

Currently one knob: ``use_polars_sort``.  Ray's default sort
implementation materializes per-block pyarrow tables through pandas
conversions in the map stage; the polars path sorts Arrow natively.
Measured on the KG pipeline's final (conv_id, turn_idx) sort at 434k
triple rows / 32 cpus: 4.1 s default -> 1.5 s polars (2.7x), identical
output order (both are stable sorts on the same keys).
"""
from __future__ import annotations


def tune_data_context() -> None:
    """Apply engine settings to the CURRENT process's DataContext.
    Safe to call before or after ray.init, and idempotent."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.use_polars_sort = True
