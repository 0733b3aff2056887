"""LLM-data-pipeline operator tests (SURVEY.md §2.10): hand-checkable
invariants + the planted sf0.1 duplicates (FIXTURES.md: 8 exact-dup pairs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kse.catalog import load
from kse.queries.llm import (
    minhash_candidate_pairs,
    q_llm_dedup_exact,
    q_llm_dedup_minhash,
    q_llm_dedup_simhash,
    q_llm_sim_knn,
)
from kse.queries.relational import q_agg_approx_distinct

from .conftest import SF_BENCH, SF_SMOKE, SF_T2


def _planted_dup_pairs(spark):
    """Ground truth: exact-duplicate text pairs in sf0.1 documents."""
    d = load(spark, SF_BENCH, "documents")
    groups = (
        d.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    )
    pairs = set()
    for g in groups:
        ids = sorted(g.ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def test_exact_dedup_removes_planted_duplicates(spark):
    n_docs = load(spark, SF_BENCH, "documents").count()
    n_kept = q_llm_dedup_exact(spark, SF_BENCH).count()
    assert n_docs - n_kept == 8  # FIXTURES.md: 8 duplicate pairs at sf0.1


def test_minhash_finds_planted_duplicates(spark):
    truth = _planted_dup_pairs(spark)
    assert len(truth) == 8
    d = load(spark, SF_BENCH, "documents")
    found = {(r.doc_a, r.doc_b) for r in minhash_candidate_pairs(d).collect()}
    # identical texts have identical signatures in every band => all found
    assert truth <= found


def test_minhash_output_nonempty_everywhere(spark):
    out = q_llm_dedup_minhash(spark, SF_T2)
    assert out.count() == 500  # one row per doc even with zero candidates


def test_minhash_fast_recall_and_volume(spark):
    """Contract of the xxhash64 production path (q_llm_dedup_minhash_fast):
    identical banding math means identical behavior on HIGH-Jaccard pairs
    (every planted exact duplicate must be found — P(candidate)=1 at j=1
    for any hash family), while the mid-similarity candidate tail is
    sampled differently per family, so the sets are NOT equal; the volume
    check pins both paths to the same O(n) candidate regime."""
    truth = _planted_dup_pairs(spark)
    assert len(truth) == 8
    d = load(spark, SF_BENCH, "documents")
    slow = {(r.doc_a, r.doc_b) for r in minhash_candidate_pairs(d).collect()}
    fast = {(r.doc_a, r.doc_b) for r in minhash_candidate_pairs(d, fast=True).collect()}
    assert truth <= fast  # 100% recall on exact duplicates
    assert len(fast) <= 2 * len(slow) and len(slow) <= 2 * len(fast)


def test_simhash_identical_docs_equal_fingerprints(spark):
    sims = {r.doc_id: r.simhash for r in q_llm_dedup_simhash(spark, SF_BENCH).collect()}
    for a, b in _planted_dup_pairs(spark):
        assert sims[a] == sims[b]


def test_knn_self_similarity_and_ordering(spark):
    rows = q_llm_sim_knn(spark, SF_T2).collect()
    assert len(rows) == 10
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)
    assert all(r.vec_id != 0 for r in rows)  # self excluded


def test_knn_cosine_self_is_one(spark):
    e = load(spark, SF_SMOKE, "embeddings").limit(1)
    row = (
        e.select(
            F.expr(
                "aggregate(zip_with(embedding, embedding,"
                " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
                " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            ).alias("dot"),
            F.expr(
                "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
                " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
            ).alias("nrm"),
        )
        .collect()[0]
    )
    assert abs(row.dot / (row.nrm * row.nrm) - 1.0) < 1e-12


def test_approx_count_distinct_accuracy(spark):
    approx = {r.event_type: r.approx_users for r in q_agg_approx_distinct(spark, SF_T2).collect()}
    e = load(spark, SF_T2, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05


def test_dedup_idempotent(spark):
    once = q_llm_dedup_exact(spark, SF_BENCH).count()
    # running dedup on already-deduped data removes nothing
    d = load(spark, SF_BENCH, "documents")
    deduped = d.dropDuplicates(["text"])
    assert deduped.dropDuplicates(["text"]).count() == deduped.count() == once


def test_ivf_recall_vs_brute_force(spark):
    """IVF with nprobe=2 of 8 lists must recover most of the exact top-10
    (measured 10/10 on this data; assert >=8 to absorb data drift)."""
    from kse.queries.llm import q_llm_sim_ivf, q_llm_sim_knn

    knn = {r.vec_id for r in q_llm_sim_knn(spark, SF_T2).collect()}
    ivf = {r.vec_id for r in q_llm_sim_ivf(spark, SF_T2).collect()}
    assert len(knn & ivf) >= 8


def test_lsh_ann_deterministic(spark):
    """LSH planes derive from literal-seeded hashes — two runs must agree
    exactly (no RNG state anywhere)."""
    from kse.queries.llm import q_llm_sim_lsh_ann

    a = sorted(map(tuple, q_llm_sim_lsh_ann(spark, SF_T2).collect()))
    b = sorted(map(tuple, q_llm_sim_lsh_ann(spark, SF_T2).collect()))
    assert a == b


def test_inverted_index_invariants(spark):
    """doc_freq must equal the posting-list length (postings are distinct
    doc ids), every posting list is strictly sorted, and — the r7 driver
    lesson — the column reaches the output SERIALIZED (comma-joined
    string, never a raw array the driver's hash canonicalizer chokes on)."""
    from kse.queries.llm import q_llm_inverted_index

    df = q_llm_inverted_index(spark, SF_SMOKE)
    assert dict(df.dtypes)["postings"] == "string"
    rows = df.collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert r.doc_freq == len(ids)
        assert ids == sorted(set(ids))


def test_index_lookup_and_semantics(spark):
    """Every hit must actually contain BOTH search terms; total_tf equals
    the hand-counted occurrences."""
    from kse.queries.llm import q_llm_index_lookup

    from kse.catalog import load

    hits = {r.doc_id: r.total_tf for r in q_llm_index_lookup(spark, SF_SMOKE).collect()}
    docs = {r.doc_id: r.text.lower().split(" ") for r in load(spark, SF_SMOKE, "documents").collect()}
    expected = {
        did: toks.count("scan") + toks.count("column")
        for did, toks in docs.items()
        if "scan" in toks and "column" in toks
    }
    assert hits == expected


def test_knn_batch_agrees_with_single_query(spark):
    """The batched kNN restricted to query_id=0 must rank the same corpus
    neighbours as brute force over the same candidate set (vec_id >= 5)."""
    import math

    from kse.catalog import load
    from kse.queries.llm import q_llm_sim_knn_batch

    got = [
        (r.vec_id, r.cos_sim)
        for r in q_llm_sim_knn_batch(spark, SF_SMOKE).filter("query_id = 0").collect()
    ]
    vecs = {r.vec_id: r.embedding for r in load(spark, SF_SMOKE, "embeddings").collect()}
    q = vecs[0]

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        return dot / (math.sqrt(sum(float(x) ** 2 for x in a)) * math.sqrt(sum(float(y) ** 2 for y in b)))

    want = sorted(((vid, cos(v, q)) for vid, v in vecs.items() if vid >= 5),
                  key=lambda t: (-t[1], t[0]))[:3]
    assert [v for v, _ in got] == [v for v, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 5e-4


def test_embed_quantize_error_bound(spark):
    """int8 reconstruction error is bounded by s/254 per element (half a
    quantization step), which is what makes quantized scan + fp32 rerank
    safe; verify the bound holds row by row on real vectors."""
    import math

    from kse.catalog import load

    for r in load(spark, SF_SMOKE, "embeddings").collect():
        s = max(abs(float(x)) for x in r.embedding)
        if s == 0:
            continue
        for x in r.embedding:
            x = float(x)
            q = math.floor(x * 127.0 / s + 0.5)
            assert abs(x - q * s / 127.0) <= s / 254.0 + 1e-12


def test_stratified_sample_rates_and_reproducibility(spark):
    """Per-stratum rates of the hash-Bernoulli draw land near the requested
    fractions and the seeded draw is identical across invocations (it is a
    pure function of (doc_id, seed) — tools/layout_invariance.py further
    holds it identical across physical layouts, which df.sampleBy's
    per-partition RNG streams are not)."""
    from kse.catalog import load
    from kse.queries.llm import q_llm_sample_stratified

    totals = {r.source: r.n for r in load(spark, SF_SMOKE, "documents")
              .groupBy("source").agg(F.count("*").alias("n")).collect()}
    a = {r.source: r.n_sampled for r in q_llm_sample_stratified(spark, SF_SMOKE).collect()}
    b = {r.source: r.n_sampled for r in q_llm_sample_stratified(spark, SF_SMOKE).collect()}
    assert a == b  # fixed seed -> identical draw
    for src, n in a.items():
        i = int(src.removeprefix("src"))
        frac = 1.0 if i % 4 == 0 else 0.5 if i % 2 == 0 else 0.25
        # binomial tolerance: 4 sigma + 1
        import math
        tol = 4 * math.sqrt(totals[src] * frac * (1 - frac)) + 1
        assert abs(n - totals[src] * frac) <= tol, (src, n, totals[src], frac)


def test_shard_assign_budget_respected(spark):
    """Cumulative packing: shards are contiguous in doc_id order, cover all
    docs, and no shard exceeds the 50k-char budget by more than one doc."""
    from kse.catalog import load
    from kse.queries.llm import q_llm_shard_assign

    chars = {r.doc_id: r.n_chars for r in load(spark, SF_SMOKE, "documents").collect()}
    assign = {r.doc_id: r.shard for r in q_llm_shard_assign(spark, SF_SMOKE).collect()}
    assert set(assign) == set(chars)
    # contiguity: shard ids are non-decreasing in doc_id order
    ordered = [assign[d] for d in sorted(assign)]
    assert all(a <= b for a, b in zip(ordered, ordered[1:]))
    # budget: each shard's size stays under budget + max single doc
    sizes = {}
    for d, sh in assign.items():
        sizes[sh] = sizes.get(sh, 0) + chars[d]
    for sh, size in sizes.items():
        assert size <= 50000 + max(chars.values())


def test_shard_assign_matches_global_window_and_avoids_global_sort(spark):
    """The two-pass prefix-sum must be value-identical to the naive global
    ORDER BY window AND keep the full corpus off a single reducer: the doc
    window is partitioned by bucket (hash exchange), never a global sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kse.catalog import load
    from kse.queries.llm import q_llm_shard_assign

    got = {r.doc_id: r.shard for r in q_llm_shard_assign(spark, SF_T2).collect()}
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r.doc_id: r.shard
        for r in load(spark, SF_T2, "documents")
        .select(
            "doc_id",
            F.floor((F.sum("n_chars").over(w) - 1) / 50000.0).cast("bigint").alias("shard"),
        )
        .collect()
    }
    assert got == want
    plan = q_llm_shard_assign(spark, SF_T2)._jdf.queryExecution().executedPlan().toString()
    # per-bucket window => hash exchange on the bucket key for the doc rows
    assert "hashpartitioning(bkt" in plan
    # no range repartition anywhere = no global sort of the corpus
    assert "rangepartitioning" not in plan


def test_editdist_finds_planted_unequal_length_neardups(spark, tmp_path):
    """Banded-length blocking must reach near-dups of UNEQUAL length
    (exact-length blocking missed these), including a pair whose lengths
    straddle a band boundary, while candidates still come from an
    equi-join — never a nested-loop over all pairs."""
    from kse.queries.llm import q_llm_dedup_editdist

    base = "the quick brown fox jumps over the lazy dog today"  # 50 chars
    long_a = base * 2  # 100 chars, band 6
    long_b = (base * 2) + " abcd"  # 105 chars, band 6
    edge_a = base + " twelve chars" # 63 chars, band 3
    edge_b = base + " twelve charsXYZ"  # 66 chars, band 4 (crosses boundary)
    far = "completely different content about spark shuffles and parquet files here"
    rows = [
        (1, long_a),
        (2, long_b),
        (3, edge_a),
        (4, edge_b),
        (5, far),
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["src0"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    sf_dir = tmp_path / "planted_sf"
    sf_dir.mkdir()
    pdf.to_parquet(sf_dir / "documents.parquet", index=False)

    res = q_llm_dedup_editdist(spark, str(sf_dir))
    pairs = {(r.doc_a, r.doc_b): r.dist for r in res.collect()}
    assert pairs.get((1, 2)) == 5  # unequal length, same band
    assert pairs.get((3, 4)) == 3  # unequal length, adjacent bands
    assert (1, 5) not in pairs and (2, 5) not in pairs
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    from kse import catalog

    catalog._RELATION_CACHE.pop((id(spark), str(sf_dir), "documents"), None)


def test_simhash_hamming_finds_planted_near_dups(spark, tmp_path):
    """Pigeonhole 4-segment bucketing must find pairs within Hamming
    distance 3 — an identical pair (distance 0) and a planted variant whose
    distance is chosen 1..3 BY CONSTRUCTION (the test replicates the
    fingerprint in pure Python and searches for a qualifying variant) —
    while a far document stays unmatched and candidates come from an
    equi-join, never a cartesian product."""
    import hashlib
    from collections import Counter

    from kse.queries.llm import q_llm_dedup_simhash_hamming

    def simhash(text: str) -> int:
        s = [0] * 60
        for tok, c in Counter(text.split(" ")).items():
            th = hashlib.md5(tok.encode()).hexdigest()
            for i in range(60):
                bit = (int(th[i // 4], 16) >> (i % 4)) & 1
                s[i] += c if bit else -c
        return sum(1 << i for i in range(60) if s[i] > 0)

    base = " ".join(f"tok{j}" for j in range(40))
    h0 = simhash(base)
    variant = None
    for j in range(2000):
        cand = base + f" extra{j}"
        if 1 <= bin(h0 ^ simhash(cand)).count("1") <= 3:
            variant = cand
            break
    assert variant is not None, "no 1..3-distance variant found in search space"
    far = " ".join(f"other{j}" for j in range(40))
    assert bin(h0 ^ simhash(far)).count("1") > 3

    import pandas as pd

    texts = [base, base, variant, far]
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["src0"] * 4,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf_dir = tmp_path / "planted_simhash_sf"
    sf_dir.mkdir()
    pdf.to_parquet(sf_dir / "documents.parquet", index=False)

    res = q_llm_dedup_simhash_hamming(spark, str(sf_dir))
    got = {r.doc_id: r.n_near for r in res.collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 0}
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    from kse import catalog

    catalog._RELATION_CACHE.pop((id(spark), str(sf_dir), "documents"), None)


def test_min_label_components_multi_hop_chain(spark):
    """Transitivity: a chain 1-2, 2-3, plus a separate pair 7-8 and an
    out-of-order edge (9,4) must collapse to min-id components even though
    no direct edge joins the chain ends."""
    from kse.queries.llm import min_label_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (4, 9), (9, 5)], ["doc_a", "doc_b"]
    )
    labels = {r.node: r.label for r in min_label_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 4: 4, 9: 4, 5: 4}


def test_components_long_chain_diameter_beyond_old_cap(spark):
    """A planted path graph of diameter 60 (previously FAILED under the old
    20-round min-label cap, which silently emitted unconverged labels).
    min_label_components must now iterate to convergence, and the
    large-star/small-star variant must agree while needing only
    O(log^2 n) rounds by construction."""
    from kse.queries.llm import bigstar_components, min_label_components

    chain = [(i, i + 1) for i in range(1, 61)]  # path 1-2-...-61, diameter 60
    pairs = spark.createDataFrame(chain + [(100, 101)], ["doc_a", "doc_b"])
    expect = {n: 1 for n in range(1, 62)} | {100: 100, 101: 100}
    got_min = {r.node: r.label for r in min_label_components(pairs).collect()}
    assert got_min == expect
    got_star = {r.node: r.label for r in bigstar_components(pairs).collect()}
    assert got_star == expect


def test_bigstar_components_matches_min_label_on_random_graph(spark):
    """Property: both component algorithms produce identical labelings on a
    deterministic pseudo-random edge set (hash-derived, no RNG)."""
    from kse.queries.llm import bigstar_components, min_label_components

    edges = [((i * 7919) % 97 + 1, (i * 6277) % 97 + 1) for i in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got_min = {r.node: r.label for r in min_label_components(pairs).collect()}
    got_star = {r.node: r.label for r in bigstar_components(pairs).collect()}
    assert got_star == got_min


def test_dedup_cluster_groups_planted_duplicates(spark):
    """The planted exact-duplicate texts (present at sf0.1 only —
    measured) must share a cluster id (the smallest doc_id of the group),
    and cluster assignment must be a coarsening of text equality:
    identical texts never split clusters."""
    from kse.catalog import load
    from kse.queries.llm import q_llm_dedup_cluster

    sf_bench = "/root/testdata/sf0.1"
    docs = {r.doc_id: r.text for r in load(spark, sf_bench, "documents").collect()}
    clusters = {r.doc_id: r.cluster_id for r in q_llm_dedup_cluster(spark, sf_bench).collect()}
    assert set(clusters) == set(docs)
    by_text: dict[str, list[int]] = {}
    for doc_id, text in docs.items():
        by_text.setdefault(text, []).append(doc_id)
    planted = [ids for ids in by_text.values() if len(ids) > 1]
    assert planted, "testdata should contain planted exact duplicates"
    for ids in planted:
        got = {clusters[i] for i in ids}
        assert len(got) == 1, (ids, got)
        assert min(got) <= min(ids)


def test_pii_redact_planted(spark):
    """Redaction semantics on planted PII (the synthetic corpus has none,
    so q_llm_pii_redact is exercised on real patterns here)."""
    from kse.queries.llm import _pii_columns

    rows = [
        (1, "mail me at jane.doe+x@example.co.uk thanks"),
        (2, "call 555-123-4567 or 555.987.6543 today"),
        (3, "ssn 123-45-6789 on file"),
        (4, "clean text with no pii at all"),
        (5, "a@b.io and 111-222-3333 and 999-88-7777"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["red_text"], r["n_pii"])
        for r in df.select("doc_id", *_pii_columns(F.col("text"))).collect()
    }
    assert got[1] == ("mail me at [EMAIL] thanks", 1)
    assert got[2] == ("call [PHONE] or [PHONE] today", 2)
    assert got[3] == ("ssn [SSN] on file", 1)
    assert got[4] == ("clean text with no pii at all", 0)
    assert got[5] == ("[EMAIL] and [PHONE] and [SSN]", 3)


def test_ngram_counts_consistent(spark):
    """Top bigram counts: each doc with W words yields W-1 bigrams, and the
    top-20 is sorted (n desc, bigram asc) with every count positive."""
    from kse.queries.llm import q_llm_ngram

    rows = q_llm_ngram(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    keys = [(-r["n"], r["bigram"]) for r in rows]
    assert keys == sorted(keys)
    total_bigrams = (
        load(spark, SF_SMOKE, "documents")
        .select((F.size(F.split(F.lower("text"), " ")) - 1).alias("k"))
        .agg(F.sum(F.greatest(F.col("k"), F.lit(0)))).collect()[0][0]
    )
    assert all(0 < r["n"] <= total_bigrams for r in rows)
