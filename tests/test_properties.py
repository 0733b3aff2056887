"""Property-based tests (SURVEY.md §5.4) — algebraic invariants over
generated inputs. Examples kept small: each case round-trips through the
JVM, so the budget goes to diverse shapes, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(alphabet="abc ", min_size=1, max_size=12), min_size=1, max_size=8
)
int_lists = st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=12)
vectors = st.lists(
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=32), min_size=4, max_size=8
)


@settings(**SETTINGS)
@given(texts)
def test_dedup_idempotent_property(spark, docs):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(docs)], "id long, text string")
    once = df.dropDuplicates(["text"])
    assert once.dropDuplicates(["text"]).count() == once.count()
    assert once.count() == len(set(docs))


@settings(**SETTINGS)
@given(int_lists, int_lists)
def test_set_algebra_property(spark, xs, ys):
    a = spark.createDataFrame([(x,) for x in xs] or [(0,)], "v long").limit(len(xs))
    b = spark.createDataFrame([(y,) for y in ys] or [(0,)], "v long").limit(len(ys))
    # distinct(A except B) ∪ (A intersect B) == distinct(A) when B ⊇ nothing special
    lhs = {r.v for r in a.subtract(b).union(a.intersect(b)).collect()}
    assert lhs == set(xs)
    # union-all preserves multiplicity
    assert a.unionByName(b).count() == len(xs) + len(ys)


@settings(**SETTINGS)
@given(vectors)
def test_cosine_self_is_one_property(spark, vec):
    if all(abs(v) < 1e-6 for v in vec):
        return  # zero vector: cosine undefined
    df = spark.createDataFrame([(vec,)], "e array<float>")
    row = df.select(
        F.expr(
            "aggregate(zip_with(e, e, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("dot"),
        F.expr(
            "sqrt(aggregate(transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
        ).alias("nrm"),
    ).collect()[0]
    assert abs(row.dot / (row.nrm * row.nrm) - 1.0) < 1e-9


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=15))
def test_sessionize_gap_count_property(spark, offsets_min):
    """Number of sessions == number of >30min gaps + 1 (single user)."""
    from pyspark.sql.window import Window

    ts = sorted(set(offsets_min))
    df = spark.createDataFrame([(1, m * 60_000_000) for m in ts], "user_id long, ts_us long")
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gap_us = 30 * 60 * 1_000_000
    flagged = df.withColumn(
        "new_s",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us) | F.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    n_sessions = flagged.agg(F.sum("new_s")).collect()[0][0]
    expected = 1 + sum(1 for a, b in zip(ts, ts[1:]) if (b - a) * 60_000_000 > gap_us)
    assert n_sessions == expected


def test_window_sum_consistent_with_groupby_sum(spark):
    """The last running-sum value within each partition must equal the
    group's total — windows and aggregates see the same data (SURVEY §5.4)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kse.catalog import load

    from .conftest import SF_SMOKE

    e = load(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running_last = (
        e.withColumn("rsum", F.sum("value").over(w))
        .groupBy("user_id")
        .agg(F.max("rsum").alias("final_rsum"))
    )
    totals = e.groupBy("user_id").agg(F.sum("value").alias("total"))
    joined = running_last.join(totals, "user_id").collect()
    assert joined
    for r in joined:
        assert abs(r.final_rsum - r.total) < 1e-6


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=40), min_size=2, max_size=8))
def test_editdist_banding_complete_property(spark, texts_in):
    """Banded-length blocking must find EXACTLY the pairs brute force
    finds under the threshold — blocking may never lose a qualifying
    pair (completeness) nor invent one (soundness)."""
    import pandas as pd

    from kse.queries.llm import q_llm_dedup_editdist

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = list(enumerate(texts_in))
    want = {
        (i, j): lev(a, b)
        for (i, a) in rows
        for (j, b) in rows
        if i < j and lev(a, b) <= 10
    }

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        pd.DataFrame(
            {
                "doc_id": [i for i, _ in rows],
                "text": [s for _, s in rows],
                "lang": ["en"] * len(rows),
                "source": ["src0"] * len(rows),
                "n_chars": [len(s) for _, s in rows],
            }
        ).to_parquet(f"{tmp}/documents.parquet", index=False)
        got = {
            (r.doc_a, r.doc_b): r.dist
            for r in q_llm_dedup_editdist(spark, tmp).collect()
        }
        from kse import catalog

        catalog._RELATION_CACHE.pop((id(spark), tmp, "documents"), None)
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 100_000), st.integers(0, 50)),
                min_size=1, max_size=20, unique_by=lambda p: p[0]))
def test_dist_prefix_sum_matches_naive_property(spark, pairs):
    """The two-pass distributed prefix sum must equal a sequential cumsum
    in id order — including SPARSE, non-dense ids spanning many empty
    buckets (the packing operators only need unique ordered ids)."""
    from kse.queries.llm import dist_prefix_sum

    df = spark.createDataFrame(pairs, "doc_id long, w long")
    got = {r.doc_id: r.cum for r in dist_prefix_sum(df, "doc_id", F.col("w")).collect()}
    run, want = 0, {}
    for i, w in sorted(pairs):
        run += w
        want[i] = run
    assert got == want


word_docs = st.lists(
    st.lists(st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=10),
    min_size=1,
    max_size=6,
)


def _py_shingles(words):
    n = max(len(words) - 2, 1)
    return [" ".join(words[i : i + 3]) for i in range(n)]


def _py_hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(**SETTINGS)
@given(word_docs)
def test_simhash_matches_python_reference(spark, docs):
    """The codegen explode/aggregate fingerprint path must equal a direct
    Python implementation of the Charikar construction — guards the hot
    path against refactors that change hashing or bit assembly."""
    from kse.queries.llm import _simhash_fingerprints

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id LONG, text STRING"
    )
    got = {r.doc_id: r.simhash for r in _simhash_fingerprints(df).collect()}
    for i, ws in enumerate(docs):
        sums = [0] * 60
        for w in ws:
            h = _py_hash60(w)
            for b in range(60):
                sums[b] += 1 if (h >> b) & 1 else -1
        expect = sum(1 << b for b in range(60) if sums[b] > 0)
        assert got[i] == expect


@settings(**SETTINGS)
@given(word_docs)
def test_minhash_pairs_match_python_reference(spark, docs):
    """The codegen signature path must produce exactly the candidate pairs
    of a direct Python implementation of the banding construction."""
    from kse.queries.llm import _MH_A, _MH_B, minhash_candidate_pairs

    import hashlib

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id LONG, text STRING"
    )
    got = {(r.doc_a, r.doc_b) for r in minhash_candidate_pairs(df).collect()}

    def bands(ws):
        vals = [_py_hash60(s) for s in _py_shingles(ws)]
        mh = [
            min(a * (v >> 30) + b * (v & 1073741823) + s for v in vals)
            for s, (a, b) in enumerate(zip(_MH_A, _MH_B))
        ]
        return [
            hashlib.md5(",".join(str(x) for x in mh[k * 4 : k * 4 + 4]).encode()).hexdigest()
            for k in range(4)
        ]

    sigs = [bands(ws) for ws in docs]
    expect = {
        (i, j)
        for i in range(len(docs))
        for j in range(i + 1, len(docs))
        if any(sigs[i][k] == sigs[j][k] for k in range(4))
    }
    assert got == expect


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user_id
            st.integers(min_value=0, max_value=600),  # offset minutes
        ),
        min_size=1,
        max_size=20,
    )
)
def test_session_window_matches_batch_fold_property(spark, user_offsets):
    """session_window (the st_session engine operator) and the batch
    lag-fold (q_win_sessionize's plan) must agree on session COUNT,
    membership, and span for ANY gap structure — including the exact-gap
    boundary (two events exactly 30min apart are ONE session in both:
    session_window merges when end == next start, the fold opens a new
    session only on strictly-greater gaps). The two operators are
    documented as identical-gap-semantics twins (kse/streaming/windows.py
    session_counts); this property pins that claim over random gaps."""
    import datetime as dt

    gap_min = 30
    base = dt.datetime(2024, 1, 1)
    rows = sorted(set(user_offsets))
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(minutes=m)) for u, m in rows],
        "user_id long, ts timestamp",
    )
    engine = (
        df.groupBy(F.session_window("ts", f"{gap_min} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("start"), "n_events")
        .collect()
    )
    got = {(r.user_id, r.start, r.n_events) for r in engine}

    # reference: the batch fold semantics (new session iff gap > 30min)
    expect = set()
    by_user: dict[int, list] = {}
    for u, m in rows:
        by_user.setdefault(u, []).append(m)
    for u, ms in by_user.items():
        ms.sort()
        start, n = ms[0], 1
        prev = ms[0]
        for m in ms[1:]:
            if m - prev > gap_min:
                expect.add((u, base + dt.timedelta(minutes=start), n))
                start, n = m, 1
            else:
                n += 1
            prev = m
        expect.add((u, base + dt.timedelta(minutes=start), n))
    assert got == expect


def test_scd2_incremental_equals_rebuild_under_fuzz(spark, tmp_path):
    """r5 verdict item: the NULL-change-date SCD2 class was found by hand
    (a bare </>= split pair silently dropped NULL dates from both
    batches); this automates the hunt. Seeded-fuzz change feeds with
    DECORRELATED ~25% NULL dates/prices/keys, duplicate per-key change
    dates (the o_orderkey tiebreak), and keys whose dates are entirely
    NULL / pre-split / post-split — for every (seed, split), the
    incremental apply must reproduce the full rebuild exactly, including
    the all-history and all-delta extreme splits."""
    import datetime as dt
    import random

    from kse.queries.extras import q_sql_scd2, scd2_incremental_apply

    splits = ("1980-01-01", "1995-03-07", "1997-11-30", "2030-01-01")
    for seed in (101, 202, 303):
        rng = random.Random(seed)
        rows = []
        for i in range(400):
            # keys concentrated so each carries a long version chain; the
            # queries keep only o_custkey % 100 == 7 — generate mostly
            # matching keys plus non-matching and NULL keys for the filter
            pick = rng.random()
            if pick < 0.1:
                key = None
            elif pick < 0.2:
                key = rng.randrange(1, 1000)  # mostly filtered out
            else:
                key = 7 + 100 * rng.randrange(0, 8)
            if rng.random() < 0.25:
                date = None
            else:
                date = dt.date(1992, 1, 1) + dt.timedelta(
                    # coarse grid => frequent duplicate dates per key
                    days=rng.randrange(0, 3000, 250)
                )
            price = None if rng.random() < 0.25 else round(rng.uniform(-1e4, 1e4), 2)
            rows.append((key, i, date, price))
        sf_dir = tmp_path / f"fuzz{seed}"
        sf_dir.mkdir()
        spark.createDataFrame(
            rows,
            "o_custkey long, o_orderkey long, o_orderdate date, o_totalprice double",
        ).coalesce(1).write.parquet(str(sf_dir / "orders.parquet"))

        full = {tuple(r) for r in q_sql_scd2(spark, str(sf_dir)).collect()}
        assert full, f"seed {seed}: empty rebuild (generator broken)"
        for split in splits:
            inc = {
                tuple(r)
                for r in scd2_incremental_apply(spark, str(sf_dir), split).collect()
            }
            assert inc == full, f"seed {seed} split {split} diverged from rebuild"
