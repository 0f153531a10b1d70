"""Round-5b operators: time-decay attribution, referential integrity,
exact stratified sampling, hashed linear classifier — semantics + plan
shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from martech_pipelines_spark.operators import text as TX
from martech_pipelines_spark.operators.transforms import referential_check
from martech_pipelines_spark.plans import QUERIES
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


# --- referential_check -------------------------------------------------------


def test_referential_check_counts_orphans_and_passes_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (2,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_check(child, parent, "fk", "pk", "c").collect()[0]
    assert row.constraint_name == "c"
    assert row.child_rows == 5
    # 99 is an orphan; NULL child key is NOT (dbt relationships semantics)
    assert row.orphan_rows == 1


def test_referential_check_duplicate_parent_keys_no_fanout(spark):
    child = spark.createDataFrame([(1,), (1,)], "fk long")
    parent = spark.createDataFrame([(1,), (1,), (1,)], "pk long")
    row = referential_check(child, parent, "fk", "pk", "c").collect()[0]
    assert row.child_rows == 2 and row.orphan_rows == 0


def test_dq3_broadcasts_dimension_parents(spark):
    plan = plan_of(QUERIES["dq3_referential_integrity"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --- stratified_sample_exact -------------------------------------------------


def test_stratified_sample_exact_quota_and_determinism(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "source")
    )
    sample = TX.stratified_sample_exact(docs, ["lang", "source"], 3)
    per = sample.groupBy("lang", "source").count().collect()
    assert per and all(r["count"] <= 3 for r in per)
    # strata with >= 3 docs must yield exactly 3 (exact quota, not pct)
    sizes = {
        (r.lang, r.source): r["count"]
        for r in docs.groupBy("lang", "source").count().collect()
    }
    got = {(r.lang, r.source): r["count"] for r in per}
    for k, n in sizes.items():
        assert got.get(k, 0) == min(n, 3)
    # deterministic under repartitioning / input order
    a = {r.doc_id for r in sample.collect()}
    b = {
        r.doc_id
        for r in TX.stratified_sample_exact(
            docs.repartition(13).sortWithinPartitions(F.desc("doc_id")),
            ["lang", "source"],
            3,
        ).collect()
    }
    assert a == b


def test_t28_plan_has_window_group_limit(spark):
    """The quota filter must lower to WindowGroupLimit so map tasks ship
    at most quota rows per stratum into the exchange."""
    plan = plan_of(QUERIES["t28_stratified_sample"](spark, SF))
    assert "WindowGroupLimit" in plan


# --- hashed_linear_score -----------------------------------------------------


def test_hashed_linear_score_exact_vs_python_model(spark):
    import hashlib

    rows = [
        (1, "Alpha beta beta!"),
        (2, ""),
        (3, "   "),
        (4, "gamma-delta gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in TX.hashed_linear_score(df).collect()}

    import re

    def weight(tok: str) -> int:
        h = int(hashlib.md5(f"qc:{tok}".encode()).hexdigest()[:8], 16)
        b = h % TX.QC_BUCKETS
        return b * TX.QC_WEIGHT_MULT % TX.QC_WEIGHT_MOD - (TX.QC_WEIGHT_MOD - 1) // 2

    for doc_id, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]
        score = sum(weight(t) for t in toks)
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert r.score_milli == score
        assert r.label == (score > 0)


def test_t29_plan_is_shuffle_and_python_free(spark):
    """Model application must be one codegen projection: no Exchange, no
    Python eval nodes."""
    plan = plan_of(QUERIES["t29_quality_classifier"](spark, SF))
    assert "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython


# --- mart8 -------------------------------------------------------------------


def test_mart8_decay_weights_model(spark):
    """Hand-built scenario: one purchase, touches at ages 0, 1 and 6 days
    -> weights 64/32/1; credit floor-divides value_paise * w by 97."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (100, t0, 7, "purchase", 10.0, None),
        (1, t0 - dt.timedelta(hours=1), 7, "view", 0.0, None),
        (2, t0 - dt.timedelta(days=1, hours=1), 7, "click", 0.0, None),
        (3, t0 - dt.timedelta(days=6, hours=1), 7, "view", 0.0, None),
        (4, t0 - dt.timedelta(days=8), 7, "view", 0.0, None),  # outside
        (5, t0 + dt.timedelta(hours=1), 7, "click", 0.0, None),  # after
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        try:
            df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
        out = {
            r.touch_type: r
            for r in QUERIES["mart8_time_decay_attribution"](spark, d).collect()
        }
    # value_paise = 1000; weights: view 64+1=65, click 32; sum_w = 97
    assert out["view"].n_touches == 2
    assert out["click"].n_touches == 1
    assert out["view"].credit_paise_total == 1000 * 64 // 97 + 1000 * 1 // 97
    assert out["click"].credit_paise_total == 1000 * 32 // 97


def test_mart8_plan_single_keyed_join(spark):
    plan = plan_of(QUERIES["mart8_time_decay_attribution"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- late_data_admission -----------------------------------------------------


def test_late_admission_matches_real_stream(spark, tmp_path):
    """The batch replay must agree bit-for-bit with a real Structured
    Streaming run fed the same micro-batches (one file per batch),
    including the boundary case window_end == watermark (dropped)."""
    import datetime as dt
    import os

    from martech_pipelines_spark.operators.windows import late_data_admission

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    # arrival order = event_id; batch_rows=2 -> batches [0,1],[2,3],[4,5]
    rows = [
        (0, t(10, 5), 1),   # b0
        (1, t(12, 0), 1),   # b0: advances max ts to 12:00
        (2, t(10, 30), 2),  # b1: late, window end 11:00 == wm 11:00 -> DROP
        (3, t(11, 30), 2),  # b1: window end 12:00 > wm 11:00 -> keep
        (4, t(13, 0), 3),   # b2: on time (advances wm only AFTER b2)
        (5, t(11, 45), 3),  # b2: wm still 11:00 -> keep
    ]
    schema = "event_id long, ts timestamp, user_id long"
    df = spark.createDataFrame(rows, schema)
    adm = late_data_admission(
        df, batch_rows=2, window_size="1 hour", delay_s=3600
    )
    batch_counts = {
        (r.user_id, r.ws): r.n
        for r in adm.groupBy(
            "user_id", F.window("ts", "1 hour")["start"].alias("ws")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }

    src = tmp_path / "src"
    src.mkdir()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("w4_mem")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        for i in range(0, 6, 2):
            spark.createDataFrame(rows[i : i + 2], schema).coalesce(
                1
            ).write.parquet(str(src / f"b{i}"))
            q.processAllAvailable()
    finally:
        q.stop()
    # update mode re-emits a key on every change; the LAST emission per
    # key is the final count
    stream_counts = {}
    for r in spark.sql("SELECT * FROM w4_mem").collect():
        stream_counts[(r.user_id, r.ws)] = r.n
    assert stream_counts == batch_counts
    # and the boundary-dropped row (event 2: window end == watermark) is
    # really gone from both
    assert sum(batch_counts.values()) == 5
    assert (2, t(10)) not in batch_counts


# --- runtime bloom-filter join pruning ---------------------------------------


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """100-TB posture: a selective dim predicate should reach the fact
    scan as a runtime bloom filter (Spark's runtime row-level filtering),
    so the shuffle ships only probably-matching fact rows. Verifies the
    plan injects might_contain on the fact side and that results are
    unchanged vs the plain join."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # local[32]-sized data is below the production thresholds; relax
        # them so the optimizer exercises the same rewrite it would apply
        # to a real fact table
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1000GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}

    def build():
        o = spark.read.parquet(f"{SF}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = spark.read.parquet(f"{SF}/lineitem.parquet")
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )

    baseline = {r.o_orderpriority: r.n for r in build().collect()}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = build()
        plan = plan_of(df)
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        assert {r.o_orderpriority: r.n for r in df.collect()} == baseline
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --- knn graph ---------------------------------------------------------------


def test_knn_graph_lsh_recall_vs_exact(spark, sf_dir):
    """Edge recall of the banded self-join graph vs the exact graph on
    the gate corpus — the LSH twin must find most true neighbors."""
    from martech_pipelines_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.src_id, r.nbr_id) for r in SIM.knn_graph(emb, k=3).collect()
    }
    approx = {
        (r.src_id, r.nbr_id)
        for r in SIM.knn_graph_lsh(emb, dim=64, k=3, bits=32, bands=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, recall


def test_s10b_plan_is_shuffle_self_join_no_broadcast_corpus(spark):
    """The scale form must NOT broadcast the corpus and must not fall
    back to any nested-loop/cartesian join: candidates come from an
    equi-join on the band keys."""
    plan = plan_of(QUERIES["s10b_knn_graph_lsh"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- h11 / dq4 / compaction --------------------------------------------------


def test_merge_token_counts_order_invariant(spark, sf_dir):
    """Counts are distributive: any batch split / merge order must yield
    the identical table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = {
        (r.token, r.cnt) for r in TX.word_count_table(docs).collect()
    }
    a, b, c = (docs.where(F.col("doc_id") % 3 == i) for i in range(3))
    fwd = TX.merge_token_counts(TX.merge_token_counts(TX.word_count_table(a), b), c)
    rev = TX.merge_token_counts(TX.merge_token_counts(TX.word_count_table(c), b), a)
    assert {(r.token, r.cnt) for r in fwd.collect()} == full
    assert {(r.token, r.cnt) for r in rev.collect()} == full


def test_compact_small_files_reduces_files_and_preserves_data(spark, tmp_path):
    from martech_pipelines_spark.operators.layout import compact_small_files

    path = str(tmp_path / "ds")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    before = compact_small_files(spark, path, target_bytes=1 << 30)
    assert before["files_before"] == 64
    assert before["skipped"] is False
    assert before["files_after"] == 1
    got = spark.read.parquet(path)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    # idempotent: second run is a no-op
    again = compact_small_files(spark, path, target_bytes=1 << 30)
    assert again["skipped"] is True


def test_compact_small_files_crash_recovery(spark, tmp_path):
    """A crash between the two renames (live moved to .old, .next not
    yet moved in) must be recovered: the next call restores .old as live
    before compacting."""
    import os

    from martech_pipelines_spark.operators.layout import compact_small_files

    path = str(tmp_path / "ds")
    spark.range(1_000).repartition(8).write.parquet(path)
    os.rename(path, path + ".old")  # simulate mid-swap crash
    stats = compact_small_files(spark, path, target_bytes=1 << 30)
    assert stats["files_before"] == 8
    assert spark.read.parquet(path).count() == 1_000
