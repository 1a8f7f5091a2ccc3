"""Per-query optimization harness: isolate one catalog query's compute.

Times catalog queries end-to-end with the noop sink (guide §1.4 — full
compute, no driver collection), labels each job (guide §1.5), and
optionally dumps `.explain("formatted")` for the plan diff artifacts in
plans/r11/.

Usage:
    python tools/opt_measure.py --sf 0.01 changepoint_daily_counts
    python tools/opt_measure.py --sf 0.1 --passes 3 --explain plans/r11 \
        --suffix before q1_pricing_summary dedup_ngram_jaccard
    python tools/opt_measure.py --sf 0.01 --all --passes 1   # whole catalog
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain", default="", help="dir for explain dumps")
    ap.add_argument("--suffix", default="", help="explain file suffix (before/after)")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--warm", action="store_true", help="one unmeasured warm pass at a smaller sf")
    args = ap.parse_args()

    from stock_streaming_data_pipeline_spark.plans import catalog
    from stock_streaming_data_pipeline_spark.session import get_spark

    cat = catalog.queries()
    names = sorted(cat) if args.all else args.names
    unknown = [n for n in names if n not in cat]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    sf_dir = f"/root/testdata/sf{args.sf}"
    spark = get_spark("opt-measure")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    if args.warm:
        warm_sf = "0.001" if args.sf != "0.001" else "0.01"
        for n in names:
            with contextlib.suppress(Exception):
                cat[n](spark, f"/root/testdata/sf{warm_sf}").write.format(
                    "noop"
                ).mode("overwrite").save()
            spark.catalog.clearCache()

    out: dict[str, list[float]] = {}
    for _p in range(args.passes):
        for n in names:
            spark.sparkContext.setJobDescription(f"opt: {n}")
            t0 = time.time()
            df = cat[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            out.setdefault(n, []).append(dt)
            print(f"# {n}[{_p}]: {dt:.2f}s", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for n in names:
            df = cat[n](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            fn = f"{n}_{args.suffix}.txt" if args.suffix else f"{n}.txt"
            with open(os.path.join(args.explain, fn), "w") as fh:
                fh.write(buf.getvalue())
            print(f"# wrote {os.path.join(args.explain, fn)}", file=sys.stderr)

    print(json.dumps({n: {"min": min(ts), "samples": ts} for n, ts in out.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
