"""Catalog inventory report: queries by tag family, oracle coverage.

Prints the machine-readable summary the coverage docs quote, straight
from the registry (so the docs can't drift from the code).

Usage: python tools/catalog_report.py
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, ".")


def main() -> int:
    from stock_streaming_data_pipeline_spark.plans import catalog

    cat = catalog.catalog()
    n_oracle = sum(1 for q in cat.values() if q.oracle)
    fams = Counter()
    for q in cat.values():
        for t in q.tags:
            fams[t.split("-")[0] if t.startswith("LLM") else t[0]] += 1
    print(f"queries: {len(cat)}  with_oracle: {n_oracle}  "
          f"rows_only: {len(cat) - n_oracle}")
    print("tag families:", dict(sorted(fams.items())))
    no_oracle = sorted(n for n, q in cat.items() if not q.oracle)
    print("rows-only queries:", no_oracle)
    bench = sorted(n for n, q in cat.items() if q.bench)
    print("bench set:", bench)
    streaming = sum(1 for n in cat if n.startswith("streaming_"))
    print(f"streaming queries: {streaming}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
