"""Round-11 regression tests for the r10 ADVICE findings: the dq17
even-pair-count median selection (high), the t54/h31/s32 cos^2
128-bit arithmetic (low), and the streaming ordered-ingestion guard
hardening (low x2: narrow except + marker-coverage assertion)."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from martech_pipelines_spark.plans import ORACLE, QUERIES
from martech_pipelines_spark.plans.corpus_r10 import (
    sparse_topk_readout,
    trigram_tf_state,
)


def _write_events(spark, root, day_counts):
    """Materialize an events table with the given per-day row counts
    (one event_type) under ``root`` in the synthetic-table layout."""
    rows, eid = [], 0
    for day, n in enumerate(day_counts):
        for i in range(n):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, 1 + day, 12, 0, i),
                    100 + i,
                    "x",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/events.parquet")


def test_dq17_even_pair_count(spark, tmp_path):
    """ADVICE r10 (high): with 4 distinct days the spine has m = C(4,2)
    = 6 pairs, so the lower-median rank is (6+1) div 2 = 3 — the old
    double-division predicate compared rn == 3.5 and silently dropped
    the event type.  Hand spine: daily counts [5, 3, 8, 2] give sorted
    slopes_e6 [-6e6, -2e6, -1e6, -5e5, 1.5e6, 5e6]; the lower median is
    the 3rd element, -1_000_000."""
    root = str(tmp_path / "sf_even")
    _write_events(spark, root, [5, 3, 8, 2])
    got = QUERIES["dq17_sen_slope"](spark, root).collect()
    assert [tuple(r) for r in got] == [("x", 6, -1_000_000)]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{root}/events.parquet/*.parquet'"
    )
    assert con.execute(ORACLE["dq17_sen_slope"]).fetchall() == [
        ("x", 6, -1_000_000)
    ]


def test_dq17_odd_pair_count(spark, tmp_path):
    """The odd-m path (3 days, m=3, median rank 2) must keep matching
    the oracle — pins that the div fix didn't shift the original case."""
    root = str(tmp_path / "sf_odd")
    # counts [4, 9, 1]: pairs (dy,dx) = (5,1), (-3,2), (-8,1) ->
    # slopes_e6 sorted [-8e6, -1.5e6, 5e6]; median rank (3+1) div 2 = 2.
    _write_events(spark, root, [4, 9, 1])
    got = QUERIES["dq17_sen_slope"](spark, root).collect()
    assert [tuple(r) for r in got] == [("x", 3, -1_500_000)]


def test_t54_cos2_no_bigint_overflow(spark):
    """ADVICE r10: dot > ~3e6 pushed 1e6*dot^2 past BIGINT, where
    DuckDB raises and pre-ANSI Spark wrapped silently.  Both sides now
    compute in 128-bit integers (DECIMAL(38,0) / HUGEINT): two docs
    sharing one trigram with tf=3000 give dot = 9e6 (1e6*dot^2 =
    8.1e19 > int64 max) and an exact cos^2 of 1.0 -> cos2_e6 =
    1_000_000 on BOTH engines."""
    tf = spark.createDataFrame(
        [(1, "a b c", 3000), (2, "a b c", 3000)],
        "doc_id long, g string, tf long",
    )
    got = sorted(map(tuple, sparse_topk_readout(tf).collect()))
    assert got == [
        (1, 2, 9_000_000, 1_000_000, 1),
        (2, 1, 9_000_000, 1_000_000, 1),
    ]
    # the oracle arithmetic on the same cell values agrees exactly
    assert duckdb.sql(
        "SELECT CAST((1000000::HUGEINT * 9000000 * 9000000)"
        " // (CAST(9000000 AS HUGEINT) * 9000000) AS BIGINT)"
    ).fetchone()[0] == 1_000_000


def test_t54_trigram_pipeline_big_tf(spark):
    """End-to-end through the tokenizer: a repeated-word document makes
    the repeated trigram's tf grow with doc length, the exact class the
    BIGINT bound failed on.  tf('w w w') = n-2 for an n-word doc."""
    text = " ".join(["w"] * 3002)
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = sparse_topk_readout(trigram_tf_state(docs)).collect()
    # dot = 3000*3000 = 9e6, norms equal -> cos2_e6 exactly 1e6
    assert sorted((r["doc_id"], r["nbr_id"], r["cos2_e6"]) for r in out) == [
        (1, 2, 1_000_000),
        (2, 1, 1_000_000),
    ]


def test_s13b_rayleigh_within_spectrum(spark):
    """The link gate tying the integer power-iteration twin to the real
    eigensolve (VERDICT r10 #4): since v_{t+1} = C v_t in fixed point,
    the Rayleigh quotient (v2.v3)/(v2.v2) must lie inside the
    covariance's eigenvalue range, and — C being PSD — must be
    NON-DECREASING across rounds.  On the near-isotropic synthetic
    corpus the top-eigenvector direction itself is ill-conditioned
    (eigengap ~1e-3), so the spectrum/monotonicity invariants are the
    honest gates; the arithmetic is pinned bit-exact by the oracle."""
    import numpy as np

    from martech_pipelines_spark.operators import linalg as LA
    from martech_pipelines_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["s13b_power_iteration_det"](spark, sf).collect()
    v = {t: np.array([r[f"v{t}"] for r in sorted(rows, key=lambda r: r["dim"])], dtype=float) for t in (1, 2, 3)}
    r12 = (v[1] @ v[2]) / (v[1] @ v[1])
    r23 = (v[2] @ v[3]) / (v[2] @ v[2])
    emb = load_table(spark, sf, "embeddings")
    cells = LA.embedding_covariance(
        emb, "embedding", round_dp=6, id_col="vec_id"
    ).collect()
    d = max(r["j"] for r in cells) + 1
    C = np.zeros((d, d))
    for r in cells:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    vals = np.linalg.eigvalsh(C)
    eps = 1e-4  # dp=6 cell rounding + fixed-point division noise
    assert vals.min() - eps <= r12 <= vals.max() + eps
    assert vals.min() - eps <= r23 <= vals.max() + eps
    assert r23 >= r12 - eps, (r12, r23)


def test_pipe6b_equals_pipe6(spark):
    """pipe6b is pipe6 with an oracle bolted on — same merges, same
    encode, same packing; the two must be row-for-row identical."""
    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, QUERIES["pipe6_tokenize_pack"](spark, sf).collect()))
    b = sorted(
        map(tuple, QUERIES["pipe6b_tokenize_pack_oracled"](spark, sf).collect())
    )
    assert a == b and a


def test_fixed_q_twins_query_set(spark):
    """The fixed-|Q| twins must answer exactly 500 distinct queries at
    every tier (the whole point: |Q| constant while the corpus scales),
    and agree with the originals on the shared query ids."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        got = QUERIES["s8c3_pq_adc_fixedq"](spark, sf)
        qids = {r["query_id"] for r in got.select("query_id").distinct().collect()}
        assert len(qids) == 500, (sf, len(qids))
    # overlap check at sf0.001: vec_id %10==0 AND <500 is shared
    sf = "/root/testdata/sf0.001"
    orig = {
        (r["query_id"], r["rnk"]): r["vec_id"]
        for r in QUERIES["s2i_ivfpq_deterministic_topk"](spark, sf).collect()
        if r["query_id"] % 10 == 0 and r["query_id"] < 500
    }
    twin = {
        (r["query_id"], r["rnk"]): r["vec_id"]
        for r in QUERIES["s2i3_ivfpq_fixedq"](spark, sf).collect()
        if r["query_id"] % 10 == 0
    }
    assert orig == twin and orig


def _split_events(spark, sf="/root/testdata/sf0.001"):
    from martech_pipelines_spark.sources import load_table

    ev = load_table(spark, sf, "events")
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    cut = lo + (hi - lo) // 2
    return (
        ev.where(F.unix_micros("ts") < cut),
        ev.where(F.unix_micros("ts") >= cut),
    )


def test_journey_state_missing_marker_raises(spark, tmp_path):
    """ADVICE r10: a state batch with no _range marker used to be
    silently exempt from the ordered-ingestion check.  A root that HAS
    markers must now cover every state batch_id — a bare state
    partition (written outside the apply path) raises."""
    from martech_pipelines_spark.plans.corpus_r9b import journey_state
    from martech_pipelines_spark.streaming.stream import (
        apply_journey_batch,
        read_journey_state,
    )

    early, late = _split_events(spark)
    root = str(tmp_path / "jr_gap")
    apply_journey_batch(early, 0, root)
    # state batch 1 lands WITHOUT its marker (not via the apply path)
    journey_state(late).write.mode("overwrite").parquet(f"{root}/batch_id=1")
    with pytest.raises(ValueError, match="no _range marker"):
        read_journey_state(spark, root).collect()


def test_journey_state_marker_read_errors_propagate(spark, tmp_path):
    """ADVICE r10: only the missing-path case may disable the guard.
    A _range dir that EXISTS but cannot be read (here: empty — schema
    inference fails) must propagate instead of silently reading the
    state unguarded."""
    from pyspark.errors import AnalysisException

    from martech_pipelines_spark.plans.corpus_r9b import journey_state
    from martech_pipelines_spark.streaming.stream import read_journey_state

    early, _ = _split_events(spark)
    root = str(tmp_path / "jr_corrupt")
    journey_state(early).write.mode("overwrite").parquet(f"{root}/batch_id=0")
    (tmp_path / "jr_corrupt" / "_range").mkdir()
    with pytest.raises(AnalysisException):
        read_journey_state(spark, root).collect()


def test_journey_state_marker_only_batch_is_harmless(spark, tmp_path):
    """The marker is written BEFORE the state partition, so a crash
    between the two leaves a marker with no state — the reader must
    accept that (replay overwrites both)."""
    from martech_pipelines_spark.plans.corpus_r9b import (
        journey_readout,
        journey_state,
    )
    from martech_pipelines_spark.streaming.stream import (
        apply_journey_batch,
        read_journey_state,
    )

    early, late = _split_events(spark)
    root = str(tmp_path / "jr_crash")
    apply_journey_batch(early, 0, root)
    # simulate the crash: batch 1's marker landed, its state did not
    late.agg(F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")).write.mode(
        "overwrite"
    ).parquet(f"{root}/_range/batch_id=1")
    got = sorted(map(tuple, read_journey_state(spark, root).collect()))
    want = sorted(map(tuple, journey_readout(journey_state(early)).collect()))
    assert got == want


def test_transitions_state_missing_marker_raises(spark, tmp_path):
    """Same coverage contract for the transition-matrix state (cells +
    bounds both checked against the marker set)."""
    from martech_pipelines_spark.plans.corpus_r10 import (
        transition_bounds,
        transition_cells,
    )
    from martech_pipelines_spark.streaming.stream import (
        apply_transitions_batch,
        read_transitions_state,
    )

    early, late = _split_events(spark)
    root = str(tmp_path / "tr_gap")
    apply_transitions_batch(early, 0, root)
    transition_cells(late).write.mode("overwrite").parquet(
        f"{root}/cells/batch_id=1"
    )
    transition_bounds(late).write.mode("overwrite").parquet(
        f"{root}/bounds/batch_id=1"
    )
    with pytest.raises(ValueError, match="no _range marker"):
        read_transitions_state(spark, root).collect()
