"""Generate a local sf1-equivalent tier for the scaling probe.

/root/testdata is read-only and stops at sf0.1, so the 10x tier the
scale probe needs is synthesized here: each SF-proportional table is 10
key-shifted copies of the sf0.1 table, with foreign keys shifted
consistently so referential integrity (and therefore join selectivity
and per-key cardinality) is preserved exactly — customer k copies join
the orders whose o_custkey was shifted by the same offset, etc.
region/nation are fixed-size by the TPC-H spec and are copied as-is.

documents.text goes through a per-copy BIJECTIVE letter substitution
(an affine cipher k -> (a*k + b) mod 26; plain rotation for the first
26 copies, multiplier steps beyond — see the inline comment) so the
copies are NOT near-duplicates of each other at ANY copy count:
shingle/minhash/jaccard pair structure then scales linearly
(each copy contributes exactly its own in-copy duplicate structure —
the rotation is a bijection, so within-copy overlaps are preserved
verbatim), instead of every doc gaining 9 artificial clones — which
would blow candidate pairs up quadratically by construction and corrupt
the probe. The rotation is also LENGTH-PRESERVING, so per-doc compute
for text operators scales with doc count only (a token-suffix scheme
was measured to inflate text length ~60% and overstate the top-step
exponent of compute-bound text queries by ~0.2). embeddings are
replicated unchanged: ANN probe cost depends on corpus x query
cardinalities, not vector values.

Layout: each scaled table is a DIRECTORY of 10 files (one per copy)
with bounded row groups — a production-like layout Spark can split,
unlike the driver's single-file single-row-group testdata whose scans
are physically limited to one task. Spark reads the directory
transparently (tables.load_table globs it like a file).

Deterministic (pure column arithmetic over the fixed sf0.1 input; no
RNG). Output: .scaletier/sf1/*.parquet (gitignored).

Usage: python tools/gen_scale_tier.py [--out .scaletier/sf1]
       python tools/gen_scale_tier.py --out .scaletier/sf10 --copies 100
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
COPIES = 10

# per-table key shifts: column -> sf0.1 domain size (max key + 1)
SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY_AS_IS = ["region", "nation"]

# Row-group sizing: small enough that row-group boundaries (Spark's
# finest split granularity within a file) expose parallelism, large
# enough that per-group metadata stays negligible.
ROW_GROUP = {
    "documents": 2_048,
    "embeddings": 1_024,
    "events": 32_768,
    "customer": 32_768,
    "part": 32_768,
    "supplier": 8_192,
    "orders": 65_536,
    "lineitem": 122_880,
}


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scaletier/sf1")
    ap.add_argument(
        "--copies",
        type=int,
        default=COPIES,
        help="key-shifted copies of sf0.1 (10 = sf1 tier, 100 = sf10)",
    )
    args = ap.parse_args()
    out, copies = args.out, args.copies
    os.makedirs(out, exist_ok=True)

    import duckdb

    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied")

    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        tdir = f"{out}/{t}.parquet"
        os.makedirs(tdir, exist_ok=True)
        for i in range(copies):
            exprs = []
            for c in cols:
                if c in shifts:
                    exprs.append(f"{c} + {i * shifts[c]} AS {c}")
                elif t == "documents" and c == "text":
                    # per-copy bijective AFFINE letter cipher k -> (a*k+b)
                    # mod 26: length-preserving, no cross-copy
                    # near-duplicates, in-copy structure exact. For
                    # i < 26 this is a = 1 (the plain rotation the sf1
                    # tier has always used — bit-identical regeneration);
                    # copies past 26 step the multiplier through the
                    # units of Z/26 so a 100-copy sf10 tier still has
                    # 100 DISTINCT bijections (a repeated rotation would
                    # make copy i and copy i+26 exact clones and blow up
                    # dedup pair structure quadratically by construction).
                    affine_a = (1, 3, 5, 7, 9, 11, 15, 17)[i // 26]
                    b = i % 26
                    lo = "abcdefghijklmnopqrstuvwxyz"
                    up = lo.upper()
                    rl = "".join(lo[(affine_a * k + b) % 26] for k in range(26))
                    ru = rl.upper()
                    exprs.append(
                        f"translate(text, '{lo}{up}', '{rl}{ru}') AS text"
                    )
                else:
                    exprs.append(c)
            con.execute(
                f"COPY (SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{tdir}/part-{i:03d}.parquet' "
                f"(FORMAT parquet, ROW_GROUP_SIZE {ROW_GROUP[t]})"
            )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{tdir}/*.parquet')"
        ).fetchone()[0]
        print(t, n, "rows", copies, "files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
