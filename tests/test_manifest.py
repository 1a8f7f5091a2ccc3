"""Distributed parquet manifest: stats fidelity, pruned reads, and the
small-files compaction report."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators import manifest
from stock_streaming_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _write_sliced(spark, tmp_path, n_slices=8):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    path = str(tmp_path / "ev")
    (
        ev.repartitionByRange(n_slices, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    return ev, path


def test_manifest_stats_match_actual_extremes(spark, tmp_path):
    ev, path = _write_sliced(spark, tmp_path)
    m = manifest.build_manifest(spark, path, columns=["user_id", "value"])
    rows = m.collect()
    assert len({r["file"] for r in rows}) >= 8
    # per-file user_id stats must equal the real per-file extremes
    for r in [x for x in rows if x["column"] == "user_id"][:3]:
        actual = (
            spark.read.parquet(r["file"])
            .agg(F.min("user_id"), F.max("user_id"))
            .collect()[0]
        )
        assert (r["lmin"], r["lmax"]) == (actual[0], actual[1])
    # doubles land in the d-columns
    vrow = next(x for x in rows if x["column"] == "value")
    assert vrow["dmin"] is not None and vrow["lmin"] is None


def test_pruned_read_equals_full_filter(spark, tmp_path):
    ev, path = _write_sliced(spark, tmp_path)
    m = manifest.build_manifest(spark, path, columns=["user_id"])
    lo, hi = 4, 6  # sf0.001 user ids span 0..14; range-sliced files
    files = manifest.prune_files(m, column="user_id", lo=lo, hi=hi)
    all_files = [r["file"] for r in m.select("file").distinct().collect()]
    assert 0 < len(files) < len(all_files)  # pruning actually pruned
    got = (
        spark.read.parquet(*files)
        .filter(F.col("user_id").between(lo, hi))
        .count()
    )
    want = (
        spark.read.parquet(path).filter(F.col("user_id").between(lo, hi)).count()
    )
    assert got == want > 0


def test_small_files_report_targets_merges(spark, tmp_path):
    _, path = _write_sliced(spark, tmp_path, n_slices=8)
    m = manifest.build_manifest(spark, path)
    rep = manifest.small_files_report(m, target_bytes=128 << 20).collect()
    assert len(rep) == 1  # one directory
    r = rep[0]
    assert r["n_small_files"] >= 8
    assert r["files_after"] == 1  # tiny test files bin-pack into one


def test_compact_directory_preserves_data_and_reduces_files(spark, tmp_path):
    import glob

    ev, path = _write_sliced(spark, tmp_path, n_slices=12)
    before = sorted(r["event_id"] for r in spark.read.parquet(path).collect())
    n_before = len(glob.glob(f"{path}/*.parquet"))
    removed = manifest.compact_directory(spark, path, target_bytes=128 << 20)
    assert removed == n_before >= 8
    after_files = glob.glob(f"{path}/*.parquet")
    assert len(after_files) == 1  # tiny test data bin-packs into one
    after = sorted(r["event_id"] for r in spark.read.parquet(path).collect())
    assert after == before
