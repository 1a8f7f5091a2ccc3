"""Freeze Spark's HyperLogLog++ empirical correction tables into
``functions/hllpp_tables.py``.

The bias-correction data (THRESHOLDS / RAW_ESTIMATE_DATA / BIAS_DATA)
is the public empirical dataset from the HLL++ paper (Heule, Nunkesser,
Hall: "HyperLogLog in Practice", EDBT 2013 — appendix data published by
the authors) as shipped in Apache Spark (Apache-2.0,
org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper). We
extract it from the running JVM via py4j rather than transcribing the
paper because Spark PATCHES one value (THRESHOLDS for p=14 is 15500 in
Spark vs 11500 in the paper, SPARK-18432) and a bit-exact differential
oracle must use the engine's actual constants.

Only the rows the catalog needs are frozen (p=14, the precision
``approx_count_distinct(rsd=0.01)`` resolves to) plus the full
THRESHOLDS vector; rerun with --p to freeze additional precisions.

Usage:
    python tools/dump_hllpp_tables.py            # write + verify
    python tools/dump_hllpp_tables.py --verify   # assert frozen == JVM
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "stock_streaming_data_pipeline_spark",
    "functions",
    "hllpp_tables.py",
)

HEADER = '''"""Frozen HyperLogLog++ correction tables (GENERATED — do not edit).

Source: the public empirical dataset from the HLL++ paper (Heule,
Nunkesser, Hall, EDBT 2013) as shipped in Apache Spark's
``org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper``
(Apache-2.0), extracted from the running JVM by
``tools/dump_hllpp_tables.py`` and pinned bit-equal there and in
``tests/test_sketches.py``. Spark patches THRESHOLDS[p=14] to 15500
(the paper says 11500, SPARK-18432), which is why extraction beats
transcription for a bit-exact differential oracle.
"""

# fmt: off
'''


def _jvm_tables(spark):
    jvm = spark.sparkContext._jvm
    comp = jvm.java.lang.Class.forName(
        "org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper$"
    )
    mod = comp.getDeclaredField("MODULE$").get(None)
    return (
        [float(x) for x in mod.THRESHOLDS()],
        {p: [float(x) for x in mod.RAW_ESTIMATE_DATA()[p - 4]] for p in PS},
        {p: [float(x) for x in mod.BIAS_DATA()[p - 4]] for p in PS},
    )


def _fmt(vals: list[float]) -> str:
    # repr() of a Python float is the shortest round-tripping decimal —
    # re-parsing yields the identical IEEE-754 bits.
    lines, line = [], "    "
    for v in vals:
        tok = repr(v) + ", "
        if len(line) + len(tok) > 78:
            lines.append(line.rstrip())
            line = "    "
        line += tok
    lines.append(line.rstrip())
    return "\n".join(lines)


def write(thresholds, raw, bias) -> None:
    parts = [HEADER]
    parts.append(f"THRESHOLDS = (\n{_fmt(thresholds)}\n)\n")
    parts.append("RAW_ESTIMATE_DATA = {\n")
    for p in PS:
        parts.append(f"    {p}: (\n{_fmt(raw[p])}\n    ),\n")
    parts.append("}\n")
    parts.append("BIAS_DATA = {\n")
    for p in PS:
        parts.append(f"    {p}: (\n{_fmt(bias[p])}\n    ),\n")
    parts.append("}\n# fmt: on\n")
    with open(OUT, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {OUT}")


def verify(thresholds, raw, bias) -> None:
    from stock_streaming_data_pipeline_spark.functions import hllpp_tables as t

    def bits(xs):
        return [struct.pack("<d", x) for x in xs]

    assert bits(t.THRESHOLDS) == bits(thresholds), "THRESHOLDS diverge"
    for p in PS:
        assert bits(t.RAW_ESTIMATE_DATA[p]) == bits(raw[p]), f"RAW p={p}"
        assert bits(t.BIAS_DATA[p]) == bits(bias[p]), f"BIAS p={p}"
    print("frozen tables bit-equal to JVM")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true", help="check only")
    ap.add_argument("--p", type=int, nargs="*", default=[14])
    args = ap.parse_args()
    PS = tuple(args.p)

    from stock_streaming_data_pipeline_spark.session import get_spark

    spark = get_spark("dump_hllpp_tables")
    tables = _jvm_tables(spark)
    if not args.verify:
        write(*tables)
    verify(*tables)
    spark.stop()
