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


def test_concurrent_committers_never_lose_a_commit(spark, tmp_path):
    """The commit-manifest protocol's safety property under contention:
    N racing committers (threads hammering create-exclusive on the same
    version numbers) must ALL land, each at a DISTINCT version, with no
    overwrite — the exact mechanism that makes the publish atomic on
    HDFS create-no-overwrite and S3 conditional PUT alike. The loser
    path (create fails -> bump version -> retry) only executes under a
    real race, which sequential tests never produce."""
    import json
    import threading

    from stock_streaming_data_pipeline_spark.streaming import sinks

    path = str(tmp_path / "tbl")
    fs, hpath = sinks._hadoop_fs(spark, path)
    fs.mkdirs(hpath)

    n_threads, commits_each = 8, 5
    results: list[tuple[int, int]] = []
    errors: list[BaseException] = []
    lock = threading.Lock()
    start = threading.Barrier(n_threads)

    def committer(tid: int) -> None:
        try:
            start.wait()
            for i in range(commits_each):
                v = sinks._commit_manifest(
                    spark, path, [f"writer{tid}-file{i}.parquet"]
                )
                with lock:
                    results.append((tid, v))
        except BaseException as e:  # noqa: BLE001
            with lock:
                errors.append(e)

    threads = [
        threading.Thread(target=committer, args=(t,)) for t in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    versions = [v for _, v in results]
    assert len(versions) == n_threads * commits_each
    # distinct versions: nobody overwrote anybody (a lost commit would
    # surface as a duplicated version number)
    assert len(set(versions)) == len(versions)
    # every committed version is actually on disk with intact content
    import os

    mdir = os.path.join(path, "_manifests")
    on_disk = sorted(os.listdir(mdir))
    assert len(on_disk) == len(versions)
    for name in on_disk:
        with open(os.path.join(mdir, name)) as fh:
            doc = json.load(fh)
        assert doc["files"] and doc["version"]
    # and the reader resolves the single highest one
    latest = sinks._latest_manifest(spark, path)
    assert latest is not None and latest[0] == max(versions)
