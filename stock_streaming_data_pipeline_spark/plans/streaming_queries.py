"""Structured Streaming queries exposed through the batch catalog.

Each runs a real streaming query (availableNow trigger, memory sink) over
the parquet testdata and returns the settled result as a batch DataFrame —
so the streaming engine itself goes through the DuckDB differential oracle.
"""

from __future__ import annotations
