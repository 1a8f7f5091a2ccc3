"""Scalar functions (SURVEY.md §2.9 C1-C10), engine-neutral forms.

Timestamps surface in oracle-facing outputs as epoch integers
(micros for row-level identity, seconds for window bounds) so the
DuckDB comparison is representation-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Lossless timestamp → epoch microseconds (C1 inverse).

    Casts through TIMESTAMP so TIMESTAMP_NTZ columns (parquet millis with
    isAdjustedToUTC=false) work too; the session is pinned to UTC, so the
    NTZ wall-clock is interpreted as the stored instant.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_s(col: Column | str) -> Column:
    """Timestamp → epoch seconds (window bounds are whole seconds here)."""
    return F.unix_seconds(F.col(col) if isinstance(col, str) else col)


def from_epoch_ms(col: Column | str) -> Column:
    """Epoch-millis long → timestamp (C1, ProcessStockStream.py:106)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def json_double(col: Column | str, path: str) -> Column:
    """Extract a JSON field as double (C5; consumer-side json.loads,
    BtcPrediction/kafka.py:37-38)."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, path).cast(
        "double"
    )


def money(col: Column) -> Column:
    """Cast to the engine's exact money type before summing.

    Double summation order differs between engines/partitionings; DECIMAL
    arithmetic is exact, so aggregates over it are bit-reproducible at any
    parallelism — this is also the right call at 100 TB (no silent drift
    between retried/recomputed partitions).
    """
    return col.cast("decimal(18,4)")


def round6(col: Column) -> Column:
    """Engine-neutral rounding for ratio-magnitude doubles."""
    return F.round(col, 6)


def day_num(col: Column | str) -> Column:
    """Timestamp → integer epoch day (engine-neutral calendar bucketing)."""
    return (epoch_us(col) / F.lit(86_400_000_000)).cast("long")
