"""Round-body plan dumps for iterative (checkpointing) queries.

The round-11 verdict's evidence audit found that plain
``explain("formatted")`` dumps of loop-shaped queries are vacuous: every
``localCheckpoint`` truncates lineage, so the final plan shows only a
``Scan ExistingRDD`` tail and the per-round optimization claims
(exchange counts, join strategies, reused exchanges) are unverifiable.

This tool fixes the protocol: it monkey-patches
``DataFrame.localCheckpoint`` to record the checkpointed frame's OWN
physical plan — the round body, BEFORE the lineage cut — while the real
catalog query builds and runs. The dump then contains one plan per
checkpoint in build order: exactly the relations the loop materializes
each round.

Usage:
    python tools/dump_loop_plans.py --sf 0.01 --out plans/r12 \
        --suffix after pagerank_dup_graph dedup_components ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, ".")

MAX_CAPTURES = 8  # plans per query: enough for every round shape to appear


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="loopbody")
    args = ap.parse_args()

    # Spark 4 splits the user-facing pyspark.sql.DataFrame facade from the
    # classic implementation; instances dispatch to the classic subclass,
    # so that is the class to patch.
    from pyspark.sql.classic.dataframe import DataFrame

    from stock_streaming_data_pipeline_spark.plans import catalog
    from stock_streaming_data_pipeline_spark.session import get_spark

    cat = catalog.queries()
    spark = get_spark("dump-loop-plans")
    sf_dir = f"/root/testdata/sf{args.sf}"
    os.makedirs(args.out, exist_ok=True)

    original = DataFrame.localCheckpoint
    captures: list[str] = []

    def capturing(self, eager=True):
        if len(captures) < MAX_CAPTURES:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                self.explain("formatted")
            captures.append(
                f"== checkpoint #{len(captures)} (eager={eager}) — plan of the "
                f"checkpointed relation itself, pre-cut ==\n{buf.getvalue()}"
            )
        return original(self, eager=eager)

    for name in args.names:
        captures.clear()
        DataFrame.localCheckpoint = capturing
        try:
            df = cat[name](spark, sf_dir)
            # run it so lazy checkpoints and post-loop shapes are real
            df.write.format("noop").mode("overwrite").save()
        finally:
            DataFrame.localCheckpoint = original
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} @ sf{args.sf}: {len(captures)} captured round-body "
                f"plan(s) (first {MAX_CAPTURES}), then the final plan.\n\n"
            )
            fh.write("\n".join(captures))
            fh.write(f"\n== final query plan ==\n{buf.getvalue()}")
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
