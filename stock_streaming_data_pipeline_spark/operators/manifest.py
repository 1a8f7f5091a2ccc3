"""Distributed parquet manifest: an Iceberg-style file-stats index.

Raw parquet directories make every query re-list and re-open footers;
table formats fix that with a manifest — per-file row counts and
column min/max — consulted at planning time. This module builds that
manifest AS A DATAFRAME JOB: the file list (driver-side, metadata-only)
fans out to executors, each reading ONLY the footers of its slice
(pyarrow metadata read — no row data is touched), and the result is a
small table you can persist next to the data and use to plan pruned
reads (``prune_files``), target compaction (small-files report), or
audit layout quality (the z-order test's measurement, productized).

At 100 TB the footer reads are the expensive part (~800k files) — which
is exactly why they must be distributed, not a driver loop; the
manifest itself is file-count-sized, trivially broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "file string, n_rows long, size_bytes long, column string, "
    "lmin long, lmax long, dmin double, dmax double"
)


def build_manifest(
    spark: SparkSession, path: str, *, columns: list[str] | None = None
) -> DataFrame:
    """One row per (file, column) with typed min/max footer stats:
    integer-family columns (int/long/timestamp-as-micros) fill
    lmin/lmax, floating columns fill dmin/dmax. Non-leaf or unstated
    columns are omitted."""
    import glob as _glob
    import os

    files = sorted(
        f
        for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.getsize(f) > 0
    )
    names = spark.createDataFrame([(f,) for f in files], "file string")

    def read_footers(batches):
        import datetime as dt

        import pandas as pd
        import pyarrow.parquet as pq

        def to_long(v):
            if isinstance(v, dt.datetime):
                epoch = dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                return int((v - epoch).total_seconds() * 1_000_000)
            return int(v)

        for pdf in batches:
            rows = []
            for fname in pdf["file"]:
                md = pq.ParquetFile(fname).metadata
                per_col: dict[str, dict] = {}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        s = c.statistics
                        if s is None or not s.has_min_max:
                            continue
                        name = c.path_in_schema
                        if columns is not None and name not in columns:
                            continue
                        acc = per_col.setdefault(
                            name, {"lmin": None, "lmax": None, "dmin": None, "dmax": None}
                        )
                        if isinstance(s.min, float):
                            acc["dmin"] = (
                                s.min if acc["dmin"] is None else min(acc["dmin"], s.min)
                            )
                            acc["dmax"] = (
                                s.max if acc["dmax"] is None else max(acc["dmax"], s.max)
                            )
                        elif isinstance(s.min, (int,)) or hasattr(s.min, "year"):
                            lo, hi = to_long(s.min), to_long(s.max)
                            acc["lmin"] = lo if acc["lmin"] is None else min(acc["lmin"], lo)
                            acc["lmax"] = hi if acc["lmax"] is None else max(acc["lmax"], hi)
                        else:
                            continue  # strings/binary: skipped by design
                import os as _os

                for name, acc in per_col.items():
                    rows.append(
                        {
                            "file": fname,
                            "n_rows": md.num_rows,
                            "size_bytes": _os.path.getsize(fname),
                            "column": name,
                            **acc,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return names.repartition(max(1, min(len(files), 32))).mapInPandas(
        read_footers, MANIFEST_SCHEMA
    )


def prune_files(
    manifest: DataFrame, *, column: str, lo, hi, use_long: bool = True
) -> list[str]:
    """Files that COULD contain rows with ``column`` in [lo, hi] — the
    planning decision a table format makes from its manifest. Driver
    gets only the surviving file names (manifest is file-count-sized)."""
    m = manifest.filter(F.col("column") == column)
    if use_long:
        keep = ~((F.col("lmax") < lo) | (F.col("lmin") > hi))
    else:
        keep = ~((F.col("dmax") < lo) | (F.col("dmin") > hi))
    return [r["file"] for r in m.filter(keep).select("file").collect()]


def small_files_report(
    manifest: DataFrame, *, target_bytes: int = 128 << 20
) -> DataFrame:
    """Compaction targeting: files under half the target size, with the
    rewrite savings (files merged per partition directory)."""
    per_file = manifest.select("file", "n_rows", "size_bytes").distinct()
    small = per_file.filter(F.col("size_bytes") < target_bytes / 2)
    dirpart = F.regexp_replace("file", r"/[^/]+$", "")
    return (
        small.withColumn("dir", dirpart)
        .groupBy("dir")
        .agg(
            F.count(F.lit(1)).alias("n_small_files"),
            F.sum("size_bytes").alias("bytes"),
            F.sum("n_rows").alias("rows"),
        )
        .withColumn(
            "files_after",
            F.greatest(
                F.lit(1), F.ceil(F.col("bytes") / F.lit(float(target_bytes)))
            ).cast("long"),
        )
    )


def compact_directory(
    spark: SparkSession,
    dir_path: str,
    *,
    target_bytes: int = 128 << 20,
) -> int:
    """Bin-pack a partition directory's small files into ~target-sized
    ones (the OPTIMIZE half of the manifest workflow; small_files_report
    picks the directories worth visiting). Publish-then-delete ordering
    (same as the upsert compactor): new files land before old ones go,
    so a crash never loses rows — but a concurrent reader inside the
    window can double-read, so run it in the maintenance window of
    non-LWW tables (the LWW upsert sink tolerates it at any time).
    Returns the number of files removed."""
    import math
    import os

    from stock_streaming_data_pipeline_spark.streaming.sinks import _hadoop_fs

    fs, hpath = _hadoop_fs(spark, dir_path)
    statuses = [
        f
        for f in fs.listStatus(hpath)
        if f.isFile()
        and not f.getPath().getName().startswith("_")
        and f.getPath().getName().endswith(".parquet")
    ]
    small = [f for f in statuses if f.getLen() < target_bytes / 2]
    if len(small) < 2:
        return 0
    total = sum(f.getLen() for f in small)
    n_out = max(1, math.ceil(total / target_bytes))
    paths = [f.getPath().toString() for f in small]
    df = spark.read.parquet(*paths)
    df.repartition(n_out).write.mode("append").parquet(dir_path)
    for f in small:
        fs.delete(f.getPath(), False)
    return len(small)
