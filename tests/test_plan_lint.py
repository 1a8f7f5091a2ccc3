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
