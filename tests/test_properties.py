"""Property-based tests (hypothesis): the Column-expression re-expressions
vs straight-Python reference implementations of the documented semantics.

These sweep input spaces the example-based tests cannot — arbitrary
numeric strings for mobile_sanity, arbitrary rewards for the paise
truncation, arbitrary chunk shapes for chunkify.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from martech_pipelines_spark.functions import fix_dob, mobile_sanity, modify_reward
from martech_pipelines_spark.operators.sinks import chunkify

SLOW = settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- Python reference implementations (documented semantics, not the
# reference's buggy code paths — SURVEY.md §0) --------------------------------


def py_mobile_sanity(s: str | None) -> str | None:
    if s is None:
        return None
    try:
        n = str(int(s))
    except ValueError:
        return None
    last10 = n[-10:]
    return last10 if len(last10) == 10 else None


def py_modify_reward(x: float | None) -> int | None:
    if x is None:
        return None
    return int(x * 100)


def py_fix_dob(v: str | None) -> str | None:
    if not v:
        return None
    if v.endswith("BC"):
        v = v[:-3]
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y-%m-%d %H:%M:%S.%f"):
        try:
            r = dt.datetime.strptime(v, fmt)
        except ValueError:
            continue
        if r.year < 1900:
            r = r.replace(year=1952)
        return r.strftime("%Y-%m-%d")
    return None


# --- strategies --------------------------------------------------------------

mobile_strings = st.one_of(
    st.from_regex(r"[0-9]{1,14}", fullmatch=True),
    st.from_regex(r" ?[+-]?[0-9]{5,12} ?", fullmatch=True),
    st.text(alphabet="0123456789abc .+-", max_size=15),
    st.none(),
)

rewards = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.none(),
)

dob_strings = st.one_of(
    st.dates(dt.date(1, 1, 1), dt.date(2200, 1, 1)).map(lambda d: d.strftime("%Y-%m-%d")),
    st.datetimes(dt.datetime(1800, 1, 1), dt.datetime(2100, 1, 1)).map(
        lambda d: d.strftime("%Y-%m-%d %H:%M:%S")
    ),
    st.dates(dt.date(100, 1, 1), dt.date(1900, 1, 1)).map(
        lambda d: d.strftime("%Y-%m-%d") + " BC"
    ),
    st.text(max_size=12),
    st.none(),
)


@SLOW
@given(vals=st.lists(mobile_strings, min_size=1, max_size=30))
def test_mobile_sanity_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r[0] for r in df.select(mobile_sanity(F.col("v")).alias("m")).collect()]
    want = [py_mobile_sanity(v) for v in vals]
    assert got == want


@SLOW
@given(vals=st.lists(rewards, min_size=1, max_size=30))
def test_modify_reward_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r[0] for r in df.select(modify_reward(F.col("v")).alias("p")).collect()]
    want = [py_modify_reward(v) for v in vals]
    assert got == want


@SLOW
@given(vals=st.lists(dob_strings, min_size=1, max_size=30))
def test_fix_dob_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r[0] for r in df.select(fix_dob(F.col("v")).alias("d")).collect()]
    want = [py_fix_dob(v) for v in vals]
    assert got == want


@given(
    items=st.lists(st.integers(), max_size=200),
    size=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=100, deadline=None)
def test_chunkify_partitions_exactly(items, size):
    chunks = list(chunkify(items, size))
    assert [x for c in chunks for x in c] == items
    assert all(len(c) <= size for c in chunks)
    if chunks:
        assert all(len(c) == size for c in chunks[:-1])


@given(size=st.integers(max_value=0))
@settings(max_examples=20, deadline=None)
def test_chunkify_rejects_nonpositive(size):
    with pytest.raises(ValueError):
        list(chunkify([1], size))


@given(
    recs=st.lists(st.text(min_size=0, max_size=40), max_size=50),
    cap=st.integers(min_value=1, max_value=120),
)
@settings(max_examples=100, deadline=None)
def test_chunkify_by_bytes_properties(recs, cap):
    """Order preserved; every chunk within cap unless it is a single
    oversize record (which must travel alone)."""
    from martech_pipelines_spark.operators.sinks import chunkify_by_bytes

    chunks = list(chunkify_by_bytes(recs, cap))
    assert [r for c in chunks for r in c] == recs
    for c in chunks:
        size = sum(len(r.encode("utf-8")) + 1 for r in c)
        assert size <= cap or len(c) == 1


# --- round-4 operator properties ---------------------------------------------

_words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=0, max_size=40
)


@SLOW
@given(words=_words, k=st.integers(min_value=1, max_value=7))
def test_paragraph_chunks_partition_tokens_exactly(spark, words, k):
    """Concatenating the paragraph chunks reproduces the token stream:
    no token lost, duplicated, or reordered, for any k and any doc."""
    from martech_pipelines_spark.operators.text import paragraph_chunks, tokens

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "t string").select(
        tokens(F.col("t")).alias("tk")
    )
    row = df.select(
        F.col("tk"), paragraph_chunks(F.col("tk"), k).alias("p")
    ).collect()[0]
    rejoined = [w for chunk in row["p"] for w in chunk.split(" ") if w != ""]
    assert rejoined == list(row["tk"])
    # every chunk except the last has exactly k tokens
    for chunk in row["p"][:-1]:
        assert len(chunk.split(" ")) == k


@SLOW
@given(
    a=st.integers(min_value=0, max_value=65535),
    b=st.integers(min_value=0, max_value=65535),
)
def test_zorder_key_matches_python_interleave(spark, a, b):
    """The unrolled Column interleave equals the bit-twiddling reference."""
    from martech_pipelines_spark.operators.layout import zorder_key_from_buckets

    def py_morton(x: int, y: int) -> int:
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i + 1)
            out |= ((y >> i) & 1) << (2 * i)
        return out

    df = spark.createDataFrame([(a, b)], "a long, b long")
    got = df.select(
        zorder_key_from_buckets(F.col("a"), F.col("b")).alias("z")
    ).collect()[0]["z"]
    assert got == py_morton(a, b)


def test_weighted_sample_prefix_property(spark):
    """top-k is a PREFIX of top-(k+m) under the same keys — growing the
    sample never swaps earlier selections (what makes incremental
    sample-size tuning reproducible)."""
    from martech_pipelines_spark.operators.text import weighted_sample_topk
    from martech_pipelines_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    small = [r["doc_id"] for r in weighted_sample_topk(docs, "n_chars", k=10).collect()]
    big = [r["doc_id"] for r in weighted_sample_topk(docs, "n_chars", k=30).collect()]
    assert big[:10] == small


# --- round-5 operators vs dict-model references ------------------------------


@given(
    base=st.dictionaries(
        st.integers(0, 8), st.integers(-5, 5), max_size=6
    ),
    chg=st.dictionaries(
        st.integers(0, 8),
        st.tuples(st.integers(-5, 5), st.booleans()),  # (value, delete?)
        max_size=6,
    ),
)
@SLOW
def test_merge_upsert_matches_dict_model(spark, base, chg):
    """MERGE semantics vs the obvious dict model: change wins, delete
    removes, base passes through."""
    from martech_pipelines_spark.operators import cdc

    model = dict(base)
    for k, (v, is_del) in chg.items():
        if is_del:
            model.pop(k, None)
        else:
            model[k] = v

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "k long, v long"
    ).where(F.col("k").isNotNull())
    chg_df = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in chg.items()] or [(None, None, None)],
        "k long, v long, d boolean",
    ).where(F.col("k").isNotNull())
    out = cdc.merge_upsert(base_df, chg_df, "k", delete_when="d = true")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == model


@given(
    series=st.lists(
        st.tuples(st.integers(1, 12), st.floats(-100, 100, width=32)),
        min_size=1,
        max_size=12,
    )
)
@SLOW
def test_resample_ffill_matches_python_model(spark, series):
    """Gap fill vs a straight-Python model: dense day range, sum per
    day, carry last observed value forward."""
    from martech_pipelines_spark.operators import transforms as TR

    rows = [
        (1, dt.datetime(2024, 1, day, 6), float(v)) for day, v in series
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {
        r["period"].day: r["value_ffill"]
        for r in TR.resample_ffill(df, "k", "ts", "v", unit="day").collect()
    }

    per_day: dict[int, float] = {}
    for day, v in series:
        per_day[day] = per_day.get(day, 0.0) + float(v)
    per_day = {d: round(s, 2) for d, s in per_day.items()}
    model: dict[int, float] = {}
    last = None
    for d in range(min(per_day), max(per_day) + 1):
        if d in per_day:
            last = per_day[d]
        model[d] = last
    assert set(out) == set(model)
    for d in model:
        assert out[d] == pytest.approx(model[d], abs=1e-9)


@given(
    words=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
        min_size=1,
        max_size=200,
    ),
    frac=st.sampled_from([0.05, 0.1, 0.25]),
)
@SLOW
def test_heavy_hitters_exact_vs_counter_model(spark, words, frac):
    """Two-pass MG must equal the brute-force counter filter for ANY
    stream and threshold — the exactness claim, swept."""
    import math
    from collections import Counter

    from martech_pipelines_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    got = {
        r["w"]: r["cnt"]
        for r in TX.heavy_hitters(docs.repartition(3), frac=frac).collect()
    }
    thr = max(1, math.ceil(frac * len(words)))
    want = {w: c for w, c in Counter(words).items() if c >= thr}
    assert got == want


# --- round-5 temporal joins vs python models ---------------------------------


def py_asof(left, right, tol_s=None):
    """Model: per left (key, ts, lid) -> payload of the latest right row
    (key, rts, rid) with rts <= ts (tie: max rid), within tolerance."""
    out = {}
    for key, ts, lid in left:
        best = None
        for k2, rts, rid in right:
            if k2 != key or rts > ts:
                continue
            if tol_s is not None and rts < ts - tol_s:
                continue
            if best is None or (rts, rid) > best:
                best = (rts, rid)
        out[lid] = best[1] if best else None
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 50),
        ),
        min_size=1,
        max_size=12,
    ),
    right=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 50),
        ),
        max_size=12,
    ),
    tol=st.one_of(st.none(), st.integers(1, 30)),
)
def test_asof_join_matches_python_model(spark, left, right, tol):
    import datetime as _dt

    from martech_pipelines_spark.operators.joins import asof_join

    base = _dt.datetime(2024, 1, 1)
    lrows = [
        (k, base + _dt.timedelta(seconds=ts), i)
        for i, (k, ts) in enumerate(left)
    ]
    rrows = [
        (k, base + _dt.timedelta(seconds=ts), 100 + i)
        for i, (k, ts) in enumerate(right)
    ]
    ldf = spark.createDataFrame(lrows, "key long, ts timestamp, lid long")
    rdf = spark.createDataFrame(
        rrows, "key long, rts timestamp, rid long"
    ) if rrows else spark.createDataFrame([], "key long, rts timestamp, rid long")
    out = asof_join(
        ldf,
        rdf,
        on=["key"],
        left_ts="ts",
        right_ts="rts",
        right_payload=["rid"],
        tolerance=F.expr(f"INTERVAL {tol} SECONDS") if tol else None,
    )
    got = {r["lid"]: r["rid_asof"] for r in out.collect()}
    want = py_asof(
        [(k, int(ts.timestamp()), i) for k, ts, i in
         [(k, t, i) for (k, t, i) in lrows]],
        [(k, int(ts.timestamp()), i) for k, ts, i in rrows],
        tol_s=tol if tol else None,
    )
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(st.integers(0, 2000), min_size=1, max_size=15),
    intervals=st.lists(
        st.tuples(st.integers(0, 2000), st.integers(1, 500)),
        min_size=1,
        max_size=8,
    ),
    bucket=st.sampled_from([7, 60, 300]),
)
def test_range_join_matches_python_model(spark, events, intervals, bucket):
    import datetime as _dt

    from martech_pipelines_spark.operators.joins import range_join

    base = _dt.datetime(2024, 1, 1)
    evrows = [
        (i, base + _dt.timedelta(seconds=s)) for i, s in enumerate(events)
    ]
    ivrows = [
        (
            j,
            base + _dt.timedelta(seconds=s),
            base + _dt.timedelta(seconds=s + d),
        )
        for j, (s, d) in enumerate(intervals)
    ]
    edf = spark.createDataFrame(evrows, "eid long, ts timestamp")
    idf = spark.createDataFrame(ivrows, "iid long, s timestamp, e timestamp")
    out = range_join(edf, idf, "ts", "s", "e", bucket_seconds=bucket)
    got = {(r["iid"], r["eid"]) for r in out.collect()}
    want = {
        (j, i)
        for j, s, e in ivrows
        for i, ts in evrows
        if s <= ts < e
    }
    assert got == want


# --- ordered funnel (greedy min-chain, optional per-step window) -------------


def py_funnel(events, steps, within_s=None):
    """Greedy first-touch chain over (user, type, t_us, tiebreak) rows."""
    by_user = {}
    for u, typ, t, tb in events:
        by_user.setdefault(u, []).append((t, tb, typ))
    counts = [0] * len(steps)
    for evs in by_user.values():
        reached = [None] * len(steps)
        for t, _tb, typ in sorted(evs):
            for i, s in enumerate(steps):
                if reached[i] is None and typ == s:
                    if i == 0:
                        reached[i] = t
                    elif reached[i - 1] is not None and t > reached[i - 1]:
                        if within_s is None or t <= reached[i - 1] + within_s * 1_000_000:
                            reached[i] = t
        for i in range(len(steps)):
            if reached[i] is not None:
                counts[i] += 1
    return counts


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 4),            # user
            st.sampled_from(["a", "b", "c", "x"]),  # type (x = noise)
            st.integers(0, 20),           # seconds offset (dups likely)
        ),
        min_size=1,
        max_size=25,
    ),
    within=st.one_of(st.none(), st.integers(1, 10)),
)
def test_ordered_funnel_matches_python_model(spark, events, within):
    from martech_pipelines_spark.operators.transforms import ordered_funnel

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, typ, base + dt.timedelta(seconds=s))
        for i, (u, typ, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = ordered_funnel(df, ["a", "b", "c"], within_s=within).collect()
    got = [r["users"] for r in sorted(out, key=lambda r: r["step_idx"])]
    want = py_funnel(
        [
            (u, typ, int((base + dt.timedelta(seconds=s)).timestamp() * 1_000_000), i)
            for i, (u, typ, s) in enumerate(events)
        ],
        ["a", "b", "c"],
        within_s=within,
    )
    assert got == want


# --- nearest as-of join ------------------------------------------------------

_asof_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # key
        st.integers(min_value=0, max_value=500),   # minutes offset
    ),
    min_size=0,
    max_size=12,
)


@given(lefts=_asof_events, rights=_asof_events)
@SLOW
def test_asof_nearest_matches_bruteforce(spark, lefts, rights):
    """Property: for random small histories (with timestamp collisions),
    asof_join_nearest picks exactly the brute-force nearest right row —
    backward on distance ties, max-id among equal backward timestamps,
    min-id among equal forward timestamps, strictly-after forward."""
    import datetime as dt

    from martech_pipelines_spark.operators.joins import asof_join_nearest

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left_rows = [(k, ts(m), i) for i, (k, m) in enumerate(lefts)]
    right_rows = [(k, ts(m), 100 + i) for i, (k, m) in enumerate(rights)]
    if not left_rows:
        return
    left = spark.createDataFrame(
        left_rows, "user_id long, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        right_rows, "user_id long, rts timestamp, rid long"
    )
    got = {
        r["lid"]: r["rid_asof"]
        for r in asof_join_nearest(
            left, right, on=["user_id"], left_ts="ts", right_ts="rts",
            right_payload=["rid"],
        ).collect()
    }

    def brute(k, t):
        back = [(rt, rid) for (rk, rt, rid) in right_rows if rk == k and rt <= t]
        fwd = [(rt, rid) for (rk, rt, rid) in right_rows if rk == k and rt > t]
        b = max(back) if back else None            # latest ts, max id
        f = min(fwd) if fwd else None              # earliest ts, min id
        if b is None and f is None:
            return None
        if b is None:
            return f[1]
        if f is None:
            return b[1]
        return b[1] if (t - b[0]) <= (f[0] - t) else f[1]

    assert len(got) == len(left_rows)
    for (k, t, lid) in left_rows:
        assert got[lid] == brute(k, t), (k, t, lid, got[lid], brute(k, t))


# --- round-7: integer-exact ANN candidate generation --------------------------


@SLOW
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=3,
        max_size=20,
    ),
    ncells=st.integers(2, 5),
)
def test_quantized_cells_match_python_argmin(spark, vecs, ncells):
    """quantized_cell_assignments must equal a pure-Python integer-exact
    argmin (quantize -> squared distance -> lowest-cell tie-break) on
    ARBITRARY vectors, not just the testdata."""
    from martech_pipelines_spark.operators import similarity as SIM

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = SIM.modular_representatives(df, nlist=ncells)
    got = {
        r["vec_id"]: (r["cell"], r["d2q"])
        for r in SIM.quantized_cell_assignments(df, cents).collect()
    }

    def quant(v):
        import math

        return [math.floor(float(x) * 1e6 + 0.5) for x in v]

    # rebuild the centroid table the same way (min id per id%ncells)
    reps = {}
    for i, _v in rows:
        c = i % ncells
        if c not in reps or i < reps[c]:
            reps[c] = i
    cent_q = {c: quant(vecs[rid]) for c, rid in reps.items()}
    for i, v in rows:
        vq = quant(v)
        best = min(
            (sum((a - b) ** 2 for a, b in zip(vq, cq)), c)
            for c, cq in cent_q.items()
        )
        assert got[i] == (best[1], best[0]), (i, got[i], best)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cdefg. hij!"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=12,
    )
)
def test_prep_report_matches_inline_funnel(spark, tmp_path_factory, texts):
    """The materialized prep report must equal the inline pipe10 stage
    composition on ARBITRARY corpora (same keep predicate, fingerprint,
    window semantics) — the bit-equal claim, property-tested."""
    from martech_pipelines_spark import caching
    from martech_pipelines_spark.operators import dedup as DD
    from martech_pipelines_spark.operators import prep

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    idx = str(tmp_path_factory.mktemp("prep_prop"))
    prep.prep_index_build(docs, idx, w=8)
    got = sorted(
        map(tuple, prep.prep_funnel_report(spark, idx).collect())
    )

    kept = prep.prep_funnel_inline_base(docs).select("doc_id", "text")
    deduped = DD.exact_dedup(kept)
    train = deduped.where(F.col("doc_id") % 10 != 3)
    eval_docs = docs.where(F.col("doc_id") % 10 == 3)
    clean = DD.decontaminate(train, eval_docs, w=8).where(
        ~F.col("contaminated")
    )
    want = sorted(
        [
            (0, "raw", docs.count()),
            (1, "quality_lang", kept.count()),
            (2, "exact_dedup", deduped.count()),
            (3, "train_split", train.count()),
            (4, "decontaminated", clean.count()),
        ]
    )
    caching.release()
    assert got == want
