"""Final-schema discipline gates (r6 driver root-cause).

The grading driver's canonicalizer sorts RAW object columns and hashes
reprs: DECIMAL finals hash-mismatch on trailing zeros, ARRAY/MAP finals
crash it outright. Two layers keep that class out of the catalog:

1. ``tools/plan_lint.fragile_final_columns`` — schema-time, enforced
   catalog-wide by tests/test_plan_lint.py (every batch query);
2. ``tools/check_oracle.fragile_cells`` + its strict (no-float-coercion)
   ``normalize`` — result-time, enforced by the CORRECTNESS_SELF runs.

These tests prove both layers actually fire on deliberately fragile
fixtures (a DECIMAL final, an ARRAY final, a Decimal-vs-float repr
divergence the round-6 replica silently passed).
"""

from __future__ import annotations

import decimal
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import check_oracle  # noqa: E402
import plan_lint  # noqa: E402


def test_schema_gate_flags_decimal_and_array_finals(spark):
    df = spark.sql(
        "SELECT CAST(1.5 AS DECIMAL(18,6)) AS d, array(1, 2) AS a, "
        "map('k', 1) AS m, named_struct('x', 1) AS s, 1 AS ok_int, "
        "CAST(1.5 AS DOUBLE) AS ok_dbl, 'x' AS ok_str"
    )
    bad = plan_lint.fragile_final_columns(df)
    assert [b.split(":")[0] for b in bad] == ["d", "a", "m", "s"]


def test_schema_gate_clean_on_scalar_finals(spark):
    # NB: a bare `1.5` literal parses as DECIMAL(2,1) in Spark SQL —
    # which the gate correctly flags. CAST to DOUBLE like real queries.
    df = spark.sql("SELECT 1 AS i, CAST(1.5 AS DOUBLE) AS d, 'x' AS s, true AS b")
    assert plan_lint.fragile_final_columns(df) == []


def test_compare_flags_decimal_repr_divergence():
    # The exact r6 attribution_linear failure: numerically identical,
    # Decimal('874.865310') on the Spark side vs float 874.86531 from
    # DuckDB's pandas conversion. The lenient r6 normalize coerced both
    # to float64 and passed; the strict replica must go red.
    spark_pdf = pd.DataFrame({"credit": [decimal.Decimal("874.865310")]})
    duck_pdf = pd.DataFrame({"credit": [874.86531]})
    problems = check_oracle.compare("fixture", spark_pdf, duck_pdf)
    assert any("fragile[credit]" in p for p in problems)


def test_compare_flags_array_cells():
    import numpy as np

    spark_pdf = pd.DataFrame({"v": [np.array([1.0, 2.0])]})
    duck_pdf = pd.DataFrame({"v": [np.array([1.0, 2.0])]})
    problems = check_oracle.compare("fixture", spark_pdf, duck_pdf)
    assert any("fragile[v]" in p for p in problems)


def test_compare_passes_clean_scalars():
    a = pd.DataFrame({"n": [1, 2], "s": ["x", "y"], "d": [0.5, 1.5]})
    b = pd.DataFrame({"n": [2, 1], "s": ["y", "x"], "d": [1.5, 0.5]})
    assert check_oracle.compare("fixture", a, b) == []


def test_xxh64_reference_matches_spark(spark):
    # The xxh64 literal-VALUES oracle stands on this bit-equality.
    from pyspark.sql import functions as F

    from stock_streaming_data_pipeline_spark.functions.xxh64_ref import (
        spark_xxhash64_str,
    )

    samples = [
        "", "a", "abc", "x" * 7, "y" * 8, "z" * 15, "q" * 16, "w" * 31,
        "m" * 32, "n" * 33, "the quick brown fox", "café über 中文",
        "one two three four five six seven eight nine",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for row in df.collect():
        assert spark_xxhash64_str(row["s"]) == row["h"], repr(row["s"])
