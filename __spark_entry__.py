"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``stock_streaming_data_pipeline_spark``; this file
is a thin adapter over its query catalog (plans/catalog.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stock_streaming_data_pipeline_spark.plans import catalog as _catalog
from stock_streaming_data_pipeline_spark.session import configure_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: sliding-window OHLC bars
    (the reference's centerpiece aggregation, ProcessStockStream.py:143-161,
    in deterministic batch form)."""
    configure_session(spark)
    from stock_streaming_data_pipeline_spark.plans.stock import ohlc_sliding_bars

    return ohlc_sliding_bars(spark, "/root/testdata/sf0.001")


def _wrap(build: _catalog.Builder) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)  # pin UTC/AQE on the driver-provided session
        return build(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-data)."""
    return {name: _wrap(build) for name, build in _catalog.queries().items()}


def oracle_sql(
    sf_dir: str = _catalog.DRIVER_SF_DIR, names: list[str] | None = None
) -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, aligned column-for-column.

    The driver calls this with no arguments and runs the SQL at sf0.01;
    lazily-generated oracles (whose text depends on the data, e.g. OPQ's
    frozen rotation literals) resolve against that scale factor by
    default. Local tooling may pass another sf_dir and/or restrict to
    `names` to skip paying for data-dependent oracle resolution it
    won't use."""
    return _catalog.oracle_sql(sf_dir, names)
