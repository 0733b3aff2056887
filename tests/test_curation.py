"""Round-3 curation/clustering operators: Lloyd's-invariant checks for
k-means, chunk-overlap reconstruction, planted sub-document containment,
URL canonicalization collapse, and per-domain cap bounds."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kse.catalog import load
from kse.queries.llm import (
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _KM_K,
    _km_assign,
    _km_update,
    q_llm_chunk,
    q_llm_containment,
    q_llm_dedup_url,
    q_llm_domain_cap,
    q_llm_kmeans,
)

from .conftest import SF_T2


def _plant_documents(tmp_path, rows):
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
    return str(sf_dir)


def test_kmeans_partition_and_lloyd_invariant(spark):
    res = q_llm_kmeans(spark, SF_T2)
    rows = res.collect()
    n_vecs = load(spark, SF_T2, "embeddings").count()
    assert len(rows) == n_vecs  # every vector assigned exactly once
    assert {r.cluster for r in rows} <= set(range(_KM_K))

    # Lloyd's monotonicity: total squared distance under the final
    # centroids/assignment must not exceed the initial assignment's.
    emb = load(spark, SF_T2, "embeddings")
    vecs = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e")
    )
    cent0 = vecs.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )

    def sse(assign, cent):
        d = assign.join(cent, "cid").select(
            F.expr(
                "aggregate(zip_with(e, c, (x, y) -> (x - y) * (x - y)),"
                " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            ).alias("d2")
        )
        return d.agg(F.sum("d2")).collect()[0][0]

    a0 = _km_assign(vecs, cent0)
    sse0 = sse(a0, cent0)
    cent1 = _km_update(a0)
    a1 = _km_assign(vecs, cent1)
    sse1 = sse(a1, cent1)
    cent2 = _km_update(a1)
    a2 = _km_assign(vecs, cent2)
    sse2 = sse(a2, cent2)
    assert sse0 >= sse1 >= sse2


def test_chunk_overlap_reconstruction(spark):
    doc = (
        load(spark, SF_T2, "documents")
        .filter(F.col("doc_id") == 3)
        .select("text")
        .collect()[0]
        .text
    )
    tokens = doc.split(" ")
    chunks = (
        q_llm_chunk(spark, SF_T2)
        .filter(F.col("doc_id") == 3)
        .orderBy("chunk_idx")
        .collect()
    )
    overlap = _CHUNK_SIZE - _CHUNK_STRIDE
    for i, ch in enumerate(chunks):
        start = i * _CHUNK_STRIDE
        expect = tokens[start : start + _CHUNK_SIZE]
        assert ch.chunk_text.split(" ") == expect
        assert ch.n_tokens == len(expect)
    # consecutive chunks overlap by exactly (size - stride) tokens
    for prev, nxt in zip(chunks, chunks[1:]):
        p, n = prev.chunk_text.split(" "), nxt.chunk_text.split(" ")
        if len(p) == _CHUNK_SIZE:
            assert p[-overlap:] == n[:overlap]
    # chunk starts cover every token index
    assert (len(chunks) - 1) * _CHUNK_STRIDE < len(tokens)


def test_containment_detects_planted_subdocument(spark, tmp_path):
    words = [f"w{i}" for i in range(60)]
    full = " ".join(words)
    # prefix long enough that shingle-Jaccard (53/58 ~ 0.91) makes the pair
    # an LSH candidate with near-certainty under the deterministic seeds
    sub = " ".join(words[:55])
    far = " ".join(f"z{i}" for i in range(40))
    sf_dir = _plant_documents(tmp_path, [(1, full), (2, sub), (3, far)])
    res = {r.doc_id: r.max_containment for r in q_llm_containment(spark, sf_dir).collect()}
    # sub's shingles are a strict subset of full's => containment 1.0 both ways
    assert res[1] == 1.0 and res[2] == 1.0
    assert res[3] == 0.0
    from kse import catalog

    catalog._RELATION_CACHE.pop((id(spark), sf_dir, "documents"), None)


def test_url_dedup_matches_python_reference(spark):
    import re

    docs = load(spark, SF_T2, "documents").select("doc_id", "source").collect()
    ref: dict[str, list[int]] = {}
    for r in docs:
        scheme, src = ("HTTPS://", r.source.upper()) if r.doc_id % 7 == 0 else (
            "https://",
            r.source,
        )
        url = f"{scheme}{src}.example.com/doc/{r.doc_id % 50}"
        if r.doc_id % 3 == 0:
            url += "/"
        if r.doc_id % 5 == 0:
            url += "?utm_source=feed&utm_medium=rss"
        canon = re.sub(r"/$", "", re.sub(r"\?utm[^#]*$", "", url.lower()))
        ref.setdefault(canon, []).append(r.doc_id)
    got = {r.url: (r.n_variants, r.keep_doc_id) for r in
           q_llm_dedup_url(spark, SF_T2).collect()}
    assert got == {u: (len(ids), min(ids)) for u, ids in ref.items()}
    # the variants actually collapse: fewer canonical urls than docs
    assert len(got) < len(docs)


def test_domain_cap_bounds(spark):
    caps = q_llm_domain_cap(spark, SF_T2).collect()
    docs = load(spark, SF_T2, "documents")
    per_domain = {
        r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert {r.domain for r in caps} == set(per_domain)
    for r in caps:
        assert r.n_kept == min(200, per_domain[r.domain])
        assert r.floor_chars <= r.chars_kept / r.n_kept  # floor is a lower bound


def test_zorder_buckets_bound_both_dimensions(spark):
    from kse.queries.extras import q_scan_zorder

    rows = q_scan_zorder(spark, SF_T2).collect()
    assert len(rows) >= 2
    li = load(spark, SF_T2, "lineitem")
    gmax_pk = li.agg(F.max(F.col("l_partkey") % 65536)).collect()[0][0]
    gmax_sk = li.agg(F.max(F.col("l_suppkey") % 65536)).collect()[0][0]
    # every z-bucket spans a bounded sub-range of BOTH dimensions — the
    # min/max statistics a z-ordered file layout would expose for pruning
    for r in rows:
        assert r.pk_min <= r.pk_max and r.sk_min <= r.sk_max
    worst_pk = max(r.pk_max - r.pk_min for r in rows)
    assert worst_pk < gmax_pk  # strictly tighter than the global range
    assert sum(r.n_rows for r in rows) == li.count()


def test_length_filter_bounds_follow_percentiles(spark):
    import numpy as np

    from kse.queries.llm import q_llm_length_filter

    docs = load(spark, SF_T2, "documents").select("n_chars", "lang").collect()
    lens = np.array([r.n_chars for r in docs])
    lo, hi = np.percentile(lens, 5), np.percentile(lens, 95)
    kept = [(r.lang, r.n_chars) for r in docs if lo <= r.n_chars <= hi]
    ref: dict[str, list[int]] = {}
    for lang, n in kept:
        ref.setdefault(lang, []).append(n)
    got = {r.lang: r for r in q_llm_length_filter(spark, SF_T2).collect()}
    assert set(got) == set(ref)
    for lang, ns in ref.items():
        r = got[lang]
        assert (r.n_kept, r.len_min, r.len_max) == (len(ns), min(ns), max(ns))


def test_semdedup_flags_planted_near_identical_vectors(spark, tmp_path):
    """Two nearly-identical planted embeddings must land in the same
    k-means cluster and flag each other above the SemDeDup threshold,
    while well-separated vectors stay unflagged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kse import catalog, registry
    from kse.queries.llm import _KM_K, q_llm_dedup_semantic

    rng_vecs = []
    # K well-separated seed vectors (axis-aligned, one per init centroid)
    for i in range(_KM_K):
        v = [0.0] * 64
        v[i * 8] = 1.0
        rng_vecs.append(v)
    # a near-duplicate pair close to centroid 0, plus a lone far vector
    dup_a = [0.0] * 64
    dup_a[0] = 1.0
    dup_a[1] = 0.05
    dup_b = [0.0] * 64
    dup_b[0] = 1.0
    dup_b[1] = 0.06
    lone = [0.0] * 64
    lone[4] = 1.0  # distinct from every seed axis (seeds use multiples of 8)
    all_vecs = rng_vecs + [dup_a, dup_b, lone]
    sf_dir = tmp_path / "sem_sf"
    sf_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": list(range(len(all_vecs))),
                "embedding": all_vecs,
                "label": [0] * len(all_vecs),
            },
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32()),
                ]
            ),
        ),
        sf_dir / "embeddings.parquet",
    )
    sf = str(sf_dir)
    try:
        res = {r.vec_id: r for r in q_llm_dedup_semantic(spark, sf).collect()}
        ida, idb, idl = _KM_K, _KM_K + 1, _KM_K + 2
        assert res[ida].cluster == res[idb].cluster
        assert res[ida].would_drop and res[idb].would_drop
        assert res[ida].max_cluster_cos > 0.99
        assert not res[idl].would_drop
    finally:
        catalog._RELATION_CACHE.pop((id(spark), sf, "embeddings"), None)
        registry.invalidate_plans(sf, spark)


def test_semdedup_arrow_tier_matches_exact_twin(spark):
    """The BLAS tier must agree with the exact pair-join twin on every
    verdict and within 5e-4 on every score at sf0.001 — same clustering,
    same tau, different (numpy gemm) accumulation order."""
    from kse.queries.llm import q_llm_dedup_semantic, q_llm_dedup_semantic_arrow

    sf = "/root/testdata/sf0.001"
    exact = {r.vec_id: r for r in q_llm_dedup_semantic(spark, sf).collect()}
    arrow = {r.vec_id: r for r in q_llm_dedup_semantic_arrow(spark, sf).collect()}
    assert set(exact) == set(arrow)
    for vid, er in exact.items():
        ar = arrow[vid]
        assert ar.cluster == er.cluster, vid
        assert ar.would_drop == er.would_drop, vid
        assert abs(ar.max_cluster_cos - er.max_cluster_cos) <= 5e-4, vid


def test_substring_dedup_finds_planted_shared_passage(spark, tmp_path):
    """Two documents sharing an exact 12-token passage must surface it;
    documents with no cross-doc repetition must contribute nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kse import catalog, registry
    from kse.queries.llm import q_llm_dedup_substring

    passage = " ".join(f"tok{i}" for i in range(12))
    docs = [
        (0, "alpha beta " + passage + " gamma delta"),
        (1, passage + " epsilon zeta eta theta iota kappa"),
        (2, " ".join(f"uniq{i}" for i in range(30))),
    ]
    sf_dir = tmp_path / "substr_sf"
    sf_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [d[0] for d in docs],
                "text": [d[1] for d in docs],
                "lang": ["en"] * 3,
                "source": ["t"] * 3,
                "n_chars": [len(d[1]) for d in docs],
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        sf_dir / "documents.parquet",
    )
    sf = str(sf_dir)
    try:
        rows = q_llm_dedup_substring(spark, sf).collect()
        # a 12-token shared passage yields 3 shared 10-grams
        assert len(rows) == 3
        for r in rows:
            assert r.n_docs == 2 and r.n_occurrences == 2 and r.first_doc == 0
        # doc 2 (all-unique tokens) must not appear as a first_doc anywhere
        assert all(r.first_doc != 2 for r in rows)
    finally:
        catalog._RELATION_CACHE.pop((id(spark), sf, "documents"), None)
        registry.invalidate_plans(sf, spark)
