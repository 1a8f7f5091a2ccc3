"""Scale-path operators: salted joins and upsert-sink compaction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators.skew import salted_join
from stock_streaming_data_pipeline_spark.streaming import sinks
from stock_streaming_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    """Salting changes the physical key distribution, never the result —
    exercised on a deliberately skewed fact table (90% one key)."""
    fact = spark.range(20_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("long").alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("dk"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    plain = fact.join(dim, fact.k == dim.dk, "inner").select("k", "payload", "name")
    salted = salted_join(
        fact, dim, fact_key="k", dim_key="dk", salts=8,
        salt_cols=("k", "payload"),
    ).select("k", "payload", "name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_variants_match_plain(spark):
    """left / semi / anti survive salting (dim holds every salt value, so
    match-vs-no-match per fact row is unchanged)."""
    fact = spark.range(5_000).select(
        (F.col("id") % 150).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(100).select(
        F.col("id").alias("dk"), F.concat(F.lit("n_"), F.col("id")).alias("name")
    )
    for how, cols in [
        ("left", ["k", "payload", "name"]),
        ("left_semi", ["k", "payload"]),
        ("left_anti", ["k", "payload"]),
    ]:
        plain = fact.join(dim, fact.k == dim.dk, how).select(*cols)
        salted = salted_join(
            fact, dim, fact_key="k", dim_key="dk", salts=4, how=how,
            salt_cols=("k", "payload"),
        ).select(*cols)
        assert plain.exceptAll(salted).count() == 0, how
        assert salted.exceptAll(plain).count() == 0, how


def test_salted_join_salt_cols_deterministic_and_equal(spark):
    """salt_cols makes the salt a pure function of row content (retry-safe
    under recomputation — ADVICE r8: monotonically_increasing_id depends
    on row order) and the result still equals the plain join on a skewed
    fact table."""
    fact = spark.range(20_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("long").alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("dk"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    plain = fact.join(dim, fact.k == dim.dk, "inner").select("k", "payload", "name")
    salted = salted_join(
        fact, dim, fact_key="k", dim_key="dk", salts=8,
        salt_cols=("k", "payload"),
    ).select("k", "payload", "name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    # determinism: the salt expression is content-hashed, so the salted
    # fact side contains no nondeterministic expression
    salted_plan = salted._jdf.queryExecution().analyzed().treeString()
    assert "monotonically_increasing_id" not in salted_plan
    assert "xxhash64" in salted_plan
    # and the hot key really is spread across multiple salt buckets
    n_buckets = (
        fact.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("k"), F.col("payload")), F.lit(8))
        )
        .filter(F.col("k") == 7)
        .select("_salt").distinct().count()
    )
    assert n_buckets == 8


def test_salted_join_rejects_outer_on_dim(spark):
    """right/full would emit unmatched dim rows S times — refused
    (ADVICE r1)."""
    import pytest

    fact = spark.range(10).select(F.col("id").alias("k"))
    dim = spark.range(10).select(F.col("id").alias("dk"))
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="unsupported how"):
            salted_join(
                fact, dim, fact_key="k", dim_key="dk", how=how,
                salt_cols=("k",),
            )


def test_salted_join_requires_real_salt_cols(spark):
    """Round-10 hardening (VERDICT r9 #2): the nondeterministic
    monotonically_increasing_id fallback is gone — salt_cols is required,
    and a key-only salt (every hot-key row in ONE bucket) is rejected."""
    import pytest

    fact = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("v"))
    dim = spark.range(10).select(F.col("id").alias("dk"))
    with pytest.raises(TypeError):
        salted_join(fact, dim, fact_key="k", dim_key="dk")
    with pytest.raises(ValueError, match="salt_cols is required"):
        salted_join(fact, dim, fact_key="k", dim_key="dk", salt_cols=())
    with pytest.raises(ValueError, match="key-only salt"):
        salted_join(fact, dim, fact_key="k", dim_key="dk", salt_cols=("k",))


def test_upsert_compaction_preserves_state(spark, tmp_path):
    path = str(tmp_path / "upsert")
    writer = sinks.upsert_writer(path, ["symbol", "timestamp"])
    t = dt.datetime(2024, 1, 1)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "symbol string, timestamp timestamp, v double"
    )
    writer(mk([("A", t, 1.0), ("B", t, 2.0)]), 0)
    writer(mk([("A", t, 10.0), ("C", t, 3.0)]), 1)

    before = {
        r["symbol"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, ["symbol", "timestamp"]).collect()
    }
    sinks.compact_upsert_table(spark, path, ["symbol", "timestamp"])
    after = {
        r["symbol"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, ["symbol", "timestamp"]).collect()
    }
    assert before == after == {"A": 10.0, "B": 2.0, "C": 3.0}

    # writes after compaction keep winning (epochs restart above -1)
    writer(mk([("B", t, 20.0)]), 0)
    final = {
        r["symbol"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, ["symbol", "timestamp"]).collect()
    }
    assert final == {"A": 10.0, "B": 20.0, "C": 3.0}


def test_minmax_strategies_identical(spark):
    from stock_streaming_data_pipeline_spark.operators.profile import minmax_scale

    ev = load_table(spark, SF_SMOKE, "events")
    a = (
        minmax_scale(ev, key="event_type", cols=["value"], strategy="window")
        .select("event_id", "value_scaled")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        minmax_scale(ev, key="event_type", cols=["value"], strategy="join")
        .select("event_id", "value_scaled")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    g = minmax_scale(ev, key=None, cols=["value"], strategy="join")
    assert g.agg(F.min("value_scaled"), F.max("value_scaled")).collect()[0] == (0.0, 1.0)


def test_running_sum_salted_equals_plain(spark):
    """The two-phase (segmented) prefix sum must equal the single-window
    form row-for-row — compared on DECIMAL values so both association
    orders are exact."""
    from stock_streaming_data_pipeline_spark.operators import running

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_id", "user_id", "ts",
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    plain = running.running_sum(
        ev, key="user_id", ts="ts", value="v", out="cum",
        tiebreak=("event_id",),
    )
    salted = running.running_sum_salted(
        ev, key="user_id", ts="ts", value="v", out="cum",
        tiebreak=("event_id",),
    )
    cols = ["event_id", "user_id", "cum"]
    assert plain.select(cols).exceptAll(salted.select(cols)).count() == 0
    assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0
    assert plain.count() == salted.count()


def test_running_sum_salted_spreads_hot_key(spark):
    """Planted 90%-skew key over 20 days: the local cumsum window must
    partition by (key, segment) — no single task sees the whole hot key —
    and the plan must show the composite partitioning."""
    from stock_streaming_data_pipeline_spark.operators import running

    base_epoch = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    n = 10_000
    rows = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id") % 100).cast("long").alias("k"),
        F.timestamp_seconds(
            F.lit(base_epoch) + F.col("id") * 173 % (86400 * 20)
        ).alias("ts"),
        F.lit(1).cast("long").alias("v"),
        F.col("id").alias("rid"),
    )
    out = running.running_sum_salted(
        rows, key="k", ts="ts", value="v", out="cum", tiebreak=("rid",)
    )
    # plan: the big-side window partitions on (k, _seg), not k alone
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(k" in plan and "_seg" in plan.split("hashpartitioning(k", 1)[1][:80]
    # data: the largest (key, segment) group is far below the hot key's total
    seg_sizes = (
        rows.withColumn("_seg", F.to_date("ts"))
        .groupBy("k", "_seg").count().agg(F.max("count")).collect()[0][0]
    )
    hot_total = rows.filter(F.col("k") == 7).count()
    assert hot_total >= 0.89 * n
    assert seg_sizes <= hot_total / 10
    # and the result is still the true prefix sum for the hot key
    got = (
        out.filter(F.col("k") == 7)
        .orderBy("ts", "rid")
        .select("cum")
        .limit(5)
        .collect()
    )
    assert [r["cum"] for r in got] == [1, 2, 3, 4, 5]
    assert out.filter(F.col("k") == 7).agg(F.max("cum")).collect()[0][0] == hot_total


def test_upsert_compaction_crash_between_publish_and_tombstone(spark, tmp_path):
    """Crash injection for the atomic-publish design: a compaction that
    dies AFTER appending the compacted epoch but BEFORE deleting the
    history files must leave readers resolving the identical state (the
    compacted rows carry each key's max-epoch winner, so last-write-wins
    is unchanged), and a recovery compaction must converge to the clean
    layout."""
    import glob

    path = str(tmp_path / "upsert")
    keys = ["symbol", "timestamp"]
    writer = sinks.upsert_writer(path, keys)
    t = dt.datetime(2024, 1, 1)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "symbol string, timestamp timestamp, v double"
    )
    writer(mk([("A", t, 1.0), ("B", t, 2.0)]), 0)
    writer(mk([("A", t, 10.0), ("C", t, 3.0)]), 1)
    want = {"A": 10.0, "B": 2.0, "C": 3.0}

    n_files_before = len(glob.glob(f"{path}/*.parquet"))
    sinks.compact_upsert_table(spark, path, keys, _crash_after_publish=True)
    # crashed state: history + compacted epoch coexist
    assert len(glob.glob(f"{path}/*.parquet")) > n_files_before
    crashed = {
        r["symbol"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, keys).collect()
    }
    assert crashed == want

    # recovery: a normal compaction over the crashed layout converges
    sinks.compact_upsert_table(spark, path, keys)
    recovered = {
        r["symbol"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, keys).collect()
    }
    assert recovered == want
    # post-recovery writes still win
    writer(mk([("C", t, 30.0)]), 0)
    final = {
        r["symbol"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, keys).collect()
    }
    assert final == {"A": 10.0, "B": 2.0, "C": 30.0}


def test_upsert_compaction_crash_before_manifest_commit(spark, tmp_path):
    """Crash injection for the manifest protocol's other window: a
    compaction that dies AFTER writing the compacted files but BEFORE the
    manifest commit must leave the OLD state in force — the new files are
    invisible, uncommitted garbage — and a recovery compaction converges
    and garbage-collects the orphans."""
    import glob
    import json

    path = str(tmp_path / "upsert")
    keys = ["symbol", "timestamp"]
    writer = sinks.upsert_writer(path, keys)
    t = dt.datetime(2024, 1, 1)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "symbol string, timestamp timestamp, v double"
    )
    writer(mk([("A", t, 1.0), ("B", t, 2.0)]), 0)
    writer(mk([("A", t, 10.0), ("C", t, 3.0)]), 1)
    want = {"A": 10.0, "B": 2.0, "C": 3.0}

    n_files_before = len(glob.glob(f"{path}/*.parquet"))
    manifests_before = sorted(glob.glob(f"{path}/_manifests/manifest-*.json"))
    sinks.compact_upsert_table(spark, path, keys, _crash_before_manifest=True)
    # crashed state: orphan compacted files exist, but NO new manifest —
    # readers resolve the previous commit, i.e. the old state exactly
    assert len(glob.glob(f"{path}/*.parquet")) > n_files_before
    assert sorted(glob.glob(f"{path}/_manifests/manifest-*.json")) == manifests_before
    crashed = {
        r["symbol"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, keys).collect()
    }
    assert crashed == want
    # the orphans are invisible: the resolved epochs are all >= 0 (no -1)
    raw = spark.read.parquet(
        *sinks._current_data_files(spark, path)
    )
    assert raw.filter("_epoch = -1").count() == 0

    # recovery: a normal compaction converges AND collects the orphans
    sinks.compact_upsert_table(spark, path, keys)
    recovered = {
        r["symbol"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, keys).collect()
    }
    assert recovered == want
    # on-disk files == exactly the committed manifest (orphans GC'd)
    latest = max(glob.glob(f"{path}/_manifests/manifest-*.json"))
    committed = set(json.load(open(latest))["files"])
    on_disk = {p.rsplit("/", 1)[-1] for p in glob.glob(f"{path}/*.parquet")}
    assert on_disk == committed


def test_read_changes_classifies_inserts_and_updates(spark, tmp_path):
    path = str(tmp_path / "cdc")
    writer = sinks.upsert_writer(path, ["k"])
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")
    writer(mk([("a", 1), ("b", 10)]), 1)          # epoch 1: a, b born
    writer(mk([("a", 2)]), 2)                     # epoch 2: a updated
    writer(mk([("c", 30)]), 3)                    # epoch 3: c born
    writer(mk([("b", 11), ("d", 40)]), 4)         # epoch 4: b updated, d born

    out = {
        r["k"]: r
        for r in sinks.read_changes(spark, path, ["k"], since_epoch=2).collect()
    }
    assert set(out) == {"b", "c", "d"}
    assert (out["b"]["_change_type"], out["b"]["v"], out["b"]["_commit_epoch"]) == (
        "update", 11, 4,
    )
    assert out["c"]["_change_type"] == "insert"
    assert out["d"]["_change_type"] == "insert"
    # a last changed at epoch 2 -> not in the feed
    full = sinks.read_changes(spark, path, ["k"], since_epoch=0).collect()
    assert {r["k"] for r in full} == {"a", "b", "c", "d"}
    assert all(r["_change_type"] == "insert" for r in full)


def test_read_changes_after_compaction_respects_retention(spark, tmp_path):
    """Compaction collapses history to epoch -1: a cut at 0 then sees NO
    changes (history truncated) while the resolved state is unchanged —
    the documented Delta-CDF-after-VACUUM retention contract."""
    path = str(tmp_path / "cdc2")
    writer = sinks.upsert_writer(path, ["k"])
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")
    writer(mk([("a", 1)]), 1)
    writer(mk([("a", 2), ("b", 5)]), 2)
    sinks.compact_upsert_table(spark, path, ["k"])
    assert sinks.read_changes(spark, path, ["k"], since_epoch=0).count() == 0
    state = {
        r["k"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, ["k"]).collect()
    }
    assert state == {"a": 2, "b": 5}


def test_snapshot_as_of_plus_changes_reconstructs_present(spark, tmp_path):
    """snapshot(T) overlaid with changes-since(T) == current state —
    the algebra that makes the CDC/time-travel pair useful."""
    path = str(tmp_path / "tt")
    writer = sinks.upsert_writer(path, ["k"])
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")
    writer(mk([("a", 1), ("b", 10)]), 1)
    writer(mk([("a", 2)]), 2)
    writer(mk([("c", 30), ("b", 11)]), 3)

    snap = {
        r["k"]: r["v"]
        for r in sinks.read_upsert_table_as_of(
            spark, path, ["k"], as_of_epoch=2
        ).collect()
    }
    assert snap == {"a": 2, "b": 10}
    changes = {
        r["k"]: r["v"]
        for r in sinks.read_changes(spark, path, ["k"], since_epoch=2).collect()
    }
    snap.update(changes)
    now = {
        r["k"]: r["v"]
        for r in sinks.read_upsert_table(spark, path, ["k"]).collect()
    }
    assert snap == now == {"a": 2, "b": 11, "c": 30}


def test_tombstone_delete_resolution_and_compaction(spark, tmp_path):
    path = str(tmp_path / "del")
    up = sinks.upsert_writer(path, ["k"])
    rm = sinks.tombstone_writer(path, ["k"])
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")
    up(mk([("a", 1), ("b", 10), ("c", 5)]), 1)
    rm(mk([("b", 0)]), 2)            # delete b
    up(mk([("b", 12)]), 3)           # b resurrected
    rm(mk([("c", 0)]), 4)            # delete c, stays dead

    state = {
        r["k"]: r["v"]
        for r in sinks.read_upsert_table_with_deletes(spark, path, ["k"]).collect()
    }
    assert state == {"a": 1, "b": 12}

    # tombstones must never leak value columns from older epochs
    sinks.compact_upsert_table_with_deletes(spark, path, ["k"])
    after = {
        r["k"]: r["v"]
        for r in sinks.read_upsert_table_with_deletes(spark, path, ["k"]).collect()
    }
    assert after == state
    # compaction physically dropped c: one epoch, two rows
    raw = spark.read.option("mergeSchema", "true").parquet(path)
    assert raw.count() == 2
    assert [r["_epoch"] for r in raw.select("_epoch").distinct().collect()] == [-1]


def test_delete_aware_reader_matches_plain_when_no_deletes(spark, tmp_path):
    path = str(tmp_path / "nodel")
    up = sinks.upsert_writer(path, ["k"])
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")
    up(mk([("a", 1)]), 1)
    up(mk([("a", 2), ("b", 3)]), 2)
    a = sorted(
        (r["k"], r["v"])
        for r in sinks.read_upsert_table(spark, path, ["k"]).collect()
    )
    b = sorted(
        (r["k"], r["v"])
        for r in sinks.read_upsert_table_with_deletes(spark, path, ["k"]).collect()
    )
    assert a == b


def test_merge_states_equals_full_recompute_and_handles_one_sided_groups(spark):
    from stock_streaming_data_pipeline_spark.operators import incremental

    facts = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 10), ("c", 7), ("c", -3), ("d", 2)],
        "k string, v long",
    )
    # split so 'b' is base-only and 'd' delta-only
    base_f = facts.filter(F.col("v") >= 5)
    delta_f = facts.filter(F.col("v") < 5)
    measures = {"v": ["sum", "count", "min", "max"]}
    merged = incremental.merge_states(
        incremental.aggregate_state(base_f, keys=["k"], measures=measures),
        incremental.aggregate_state(delta_f, keys=["k"], measures=measures),
        keys=["k"],
    )
    full = incremental.aggregate_state(facts, keys=["k"], measures=measures)
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want


def test_merge_states_all_null_group_stays_null(spark):
    """merged == recomputed also for a group whose measure is entirely
    NULL on both sides: its sum must merge to NULL, not 0 (the r3-advice
    coalesce bug)."""
    from stock_streaming_data_pipeline_spark.operators import incremental

    facts = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 3)],
        "k string, v long",
    )
    base_f = facts.limit(0).unionByName(facts.filter("k = 'a'"))
    delta_f = facts.filter("k = 'b'").unionByName(
        spark.createDataFrame([("a", None)], "k string, v long")
    )
    measures = {"v": ["sum", "count"]}
    merged = incremental.merge_states(
        incremental.aggregate_state(base_f, keys=["k"], measures=measures),
        incremental.aggregate_state(delta_f, keys=["k"], measures=measures),
        keys=["k"],
    )
    full = incremental.aggregate_state(facts, keys=["k"], measures=measures)
    got = {r["k"]: (r["f_sum_v"], r["f_count_v"]) for r in merged.collect()}
    want = {r["k"]: (r["f_sum_v"], r["f_count_v"]) for r in full.collect()}
    assert got == want
    assert got["a"] == (None, 0)


def test_merge_states_rejects_schema_mismatch(spark):
    import pytest

    from stock_streaming_data_pipeline_spark.operators import incremental

    facts = spark.createDataFrame([("a", 1)], "k string, v long")
    a = incremental.aggregate_state(facts, keys=["k"], measures={"v": ["sum"]})
    b = incremental.aggregate_state(facts, keys=["k"], measures={"v": ["min"]})
    with pytest.raises(ValueError, match="schemas differ"):
        incremental.merge_states(a, b, keys=["k"])
    with pytest.raises(ValueError, match="not mergeable"):
        incremental.aggregate_state(facts, keys=["k"], measures={"v": ["avg"]})


def test_bloom_no_false_negatives_and_prunes(spark):
    """Bloom contract: every true key survives the prefilter (no false
    negatives, ever); a properly-sized bitmap prunes most non-members;
    the DuckDB position replay computes identical bit positions."""
    import duckdb
    from pyspark.sql import functions as F

    from stock_streaming_data_pipeline_spark.operators import bloom

    keys = spark.createDataFrame([(i * 7,) for i in range(500)], "k long")
    words = bloom.build_bloom_words(keys, "k", m_bits=1 << 13, k_hashes=4)
    assert len(words) == (1 << 13) // 64
    test = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    pred = bloom.bloom_might_contain(F.col("k"), words, k_hashes=4)
    kept = {r["k"] for r in test.filter(pred).collect()}
    true_keys = {i * 7 for i in range(500) if i * 7 < 5000}
    assert true_keys <= kept  # no false negatives
    fp = len(kept - true_keys) / (5000 - len(true_keys))
    assert fp < 0.05  # 8192 bits / 500 keys ~ 16 bits/key -> ~0.2% expected
    # cross-engine: DuckDB recomputes the same positions for every key
    pos_sql = bloom.sql_bloom_positions("k", k_hashes=4, m_bits=1 << 13)
    duck_rows = duckdb.sql(
        "SELECT k, " + ", ".join(f"{p} AS p{i}" for i, p in enumerate(pos_sql))
        + " FROM (SELECT unnest(range(0, 50)) * 7 AS k)"
    ).fetchall()
    spark_rows = (
        keys.filter(F.col("k") < 350)
        .select(
            "k",
            *[
                p.alias(f"p{i}")
                for i, p in enumerate(
                    bloom._positions(
                        bloom._h31(F.col("k"), "bf_"), k_hashes=4, m_bits=1 << 13
                    )
                )
            ],
        )
        .collect()
    )
    assert sorted(map(tuple, duck_rows)) == sorted(tuple(r) for r in spark_rows)


def test_bloom_semi_join_exactness(spark):
    """bloom_semi_join == plain left-semi join, bit for bit, including
    under an undersized (saturating) bitmap."""
    from stock_streaming_data_pipeline_spark.operators import bloom

    fact = spark.createDataFrame(
        [(i % 97, i) for i in range(3000)], "fk long, payload long"
    )
    keys = spark.createDataFrame([(i * 3,) for i in range(30)], "dk long")
    got = sorted(
        (r["fk"], r["payload"])
        for r in bloom.bloom_semi_join(
            fact, keys, fact_key="fk", dim_key="dk", m_bits=256, k_hashes=3
        ).collect()
    )
    want = sorted(
        (r["fk"], r["payload"])
        for r in fact.join(keys, fact["fk"] == keys["dk"], "left_semi").collect()
    )
    assert got == want


def test_dq_agg_report_single_pass_and_verdicts(spark):
    """The per-table check pack folds into ONE aggregate (plan has
    exactly one pair of partial/final HashAggregates); verdicts evaluate
    on the rounded metric; both pass and fail branches fire."""
    from pyspark.sql import functions as F

    from stock_streaming_data_pipeline_spark.operators import dq

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", None), (2, "c", 7.0)], "k long, s string, v double"
    )
    rep = dq.agg_report(
        df,
        [
            dq.AggCheck("k.unique", dq.uniqueness("k"), lambda m: m == 1.0),
            dq.AggCheck("v.complete", dq.completeness("v"), lambda m: m >= 0.9),
            dq.AggCheck(
                "s.in_set",
                dq.violations(~F.col("s").isin("a", "b")),
                lambda m: m == 0.0,
            ),
        ],
    )
    got = {r["check_name"]: (r["metric"], r["passed"]) for r in rep.collect()}
    assert got["k.unique"] == (round(2 / 3, 6), False)
    assert got["v.complete"] == (round(2 / 3, 6), False)
    assert got["s.in_set"] == (1.0, False)
    # countDistinct legitimately expands into a two-phase aggregate; the
    # single-pass claim is about the SCAN: the table is read exactly once.
    # (AQE's toString prints Final AND Initial plan sections — count the
    # final section only.)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    final_section = plan.split("== Initial Plan ==")[0]
    assert final_section.count("Scan ExistingRDD") == 1


def test_snapshot_diff_all_four_classes(spark, tmp_path):
    """Scripted timeline exercising added/removed/changed/unchanged in
    one diff."""
    import datetime as dt
    import os

    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    late = dt.datetime(2024, 1, 20)
    rows = []
    # u1/view: 2 early, 1 late -> changed ; u1/click: 1 and 1 -> unchanged
    rows += [(1, "view", base), (1, "view", base), (1, "view", late)]
    rows += [(2, "click", base), (2, "click", late)]
    rows += [(3, "buy", base)]          # removed (early only)
    rows += [(4, "buy", late)]          # added (late only)
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[2] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    from stock_streaming_data_pipeline_spark.plans.catalog import queries

    got = {
        (r["user_id"], r["event_type"]): r["change_type"]
        for r in queries()["snapshot_table_diff"](spark, d).collect()
    }
    assert got == {
        (1, "view"): "changed",
        (2, "click"): "unchanged",
        (3, "buy"): "removed",
        (4, "buy"): "added",
    }


def test_attribution_splits_credit_exactly(spark, tmp_path):
    """Scripted journey: a purchase with 3 in-window touches splits
    round-6 thirds; an out-of-window touch earns nothing; a purchase
    with no touches contributes no credit."""
    import datetime as dt
    import os

    import pandas as pd

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ev(eid, typ, when, uid=1):
        return (eid, when, uid, typ, 1.0, "{}")

    rows = [
        ev(1, "view", t0 - dt.timedelta(days=4)),      # OUT of 3d window
        ev(2, "view", t0 - dt.timedelta(days=2)),
        ev(3, "click", t0 - dt.timedelta(hours=5)),
        ev(4, "view", t0 - dt.timedelta(hours=1)),
        ev(5, "purchase", t0),
        ev(6, "purchase", t0 + dt.timedelta(days=5), uid=2),  # no touches
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    from stock_streaming_data_pipeline_spark.plans.catalog import queries

    got = {
        r["touch_type"]: (r["n_touches"], int(r["credit_micros"]))
        for r in queries()["attribution_linear"](spark, d).collect()
    }
    # per-touch weight is an exact half-away BIGINT micro-unit
    # (2e6 + cnt) DIV (2*cnt) BEFORE summation, so two thirds
    # accumulate as 2 x 333333 micros
    assert got == {
        "view": (2, 666666),
        "click": (1, 333333),
    }


def test_asof_salted_equals_plain_both_directions(spark):
    """The segmented as-of join must equal the single-window form
    row-for-row in both directions, including rows with no match and
    segments containing no right rows (the cross-segment carry)."""
    from stock_streaming_data_pipeline_spark.operators import asof

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    # left: hourly points over 6 days; right: sparse quotes with whole
    # days empty (days 2 and 4 have no right rows at all) + one exact-ts
    # collision to pin inclusive semantics
    left = spark.createDataFrame(
        [(i, 1 + i % 3, base + dt.timedelta(hours=i)) for i in range(144)],
        ["lid", "k", "ts"],
    )
    right_rows = [
        (100 + j, 1 + j % 3, base + dt.timedelta(hours=5 * j + 1), float(j))
        for j in range(29)
        if (5 * j + 1) // 24 not in (2, 4)
    ]
    right_rows.append((999, 1, base + dt.timedelta(hours=7), 777.0))
    right = spark.createDataFrame(right_rows, ["rid", "k", "ts", "px"])

    for direction in ("backward", "forward"):
        plain = asof.asof_join(
            left, right, by="k", on="ts",
            right_values=["rid", "px"], direction=direction,
        )
        salted = asof.asof_join_salted(
            left, right, by="k", on="ts",
            right_values=["rid", "px"], direction=direction,
        )
        cols = ["lid", "k", "asof_rid", "asof_px"]
        assert plain.select(cols).exceptAll(salted.select(cols)).count() == 0, direction
        assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0, direction
        assert plain.count() == salted.count() == 144


def test_asof_salted_spreads_hot_key(spark):
    """Planted 90%-skew key over 20 days: the salted as-of's big-side
    window must partition on (key, segment), and the largest (key,
    segment) task must stay far below the hot key's row total."""
    from stock_streaming_data_pipeline_spark.operators import asof

    base_epoch = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    n = 10_000
    left = spark.range(n).select(
        F.col("id").alias("lid"),
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id") % 100).cast("long").alias("k"),
        F.timestamp_seconds(
            F.lit(base_epoch) + F.col("id") * 173 % (86400 * 20)
        ).alias("ts"),
    )
    right = spark.range(200).select(
        F.col("id").alias("rid"),
        (F.col("id") % 100).cast("long").alias("k"),
        F.timestamp_seconds(
            F.lit(base_epoch) + F.col("id") * 9973 % (86400 * 20)
        ).alias("ts"),
        (F.col("id") * 2).cast("double").alias("px"),
    )
    out = asof.asof_join_salted(
        left, right, by="k", on="ts", right_values=["rid", "px"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(k" in plan
    assert "_seg" in plan.split("hashpartitioning(k", 1)[1][:80]
    seg_max = (
        left.withColumn("_seg", F.to_date("ts"))
        .groupBy("k", "_seg").count().agg(F.max("count")).collect()[0][0]
    )
    hot_total = left.filter(F.col("k") == 7).count()
    assert hot_total >= 0.89 * n
    assert seg_max <= hot_total / 10
    # spot-check correctness against the plain form on the hot key
    plain = asof.asof_join(
        left, right, by="k", on="ts", right_values=["rid", "px"]
    )
    cols = ["lid", "asof_rid", "asof_px"]
    a = plain.filter(F.col("k") == 7).select(cols)
    b = out.filter(F.col("k") == 7).select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
