"""Physical-plan regression guards: the properties that make these queries
scale (pushdown, broadcast choices, partial aggregation) must survive
refactors. A correctness-green but plan-regressed change should fail here.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    import contextlib
    import io

    from stock_streaming_data_pipeline_spark.plans import catalog

    df = catalog.queries()[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # formatted mode prints full PushedFilters lists (toString truncates)
    return buf.getvalue() + df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # partial + final aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_q5_dimensions_broadcast(spark):
    plan = plan_of(spark, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 4  # cust/supp/nation/region
    assert "EqualTo(r_name,ASIA)" in plan  # dim filter pushed to its scan


def test_semi_join_broadcast(spark):
    plan = plan_of(spark, "users_with_events_semi")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_cosine_topk_no_corpus_shuffle(spark):
    plan = plan_of(spark, "embedding_topk")
    # queries side broadcast; corpus scanned once, never hash-repartitioned
    # before the scoring join
    assert "BroadcastNestedLoopJoin" in plan
    before_join = plan.split("BroadcastNestedLoopJoin")[-1]
    assert "Exchange hashpartitioning" not in before_join


def test_trade_ticks_all_filters_pushed(spark):
    plan = plan_of(spark, "trade_ticks")
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "EqualTo(event_type,click)" in pushed
    assert "GreaterThan(value,0.0)" in pushed
    # The ts range predicate reaches the scan as RAW nano-long bounds
    # (load_events_pruned works around the TIMESTAMP(NANOS) limitation).
    assert "GreaterThanOrEqual(ts," in pushed and "LessThan(ts," in pushed


def test_q3_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "q3_top_unshipped_orders")
    assert "TakeOrderedAndProject" in plan  # per-partition top-k + merge
