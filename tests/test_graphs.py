"""Graph-analytics invariants: planted-graph correctness for the
co-purchase edge derivation, brute-force cross-checks for triangles and
neighborhood Jaccard, and conservation/positivity for fixed-point
PageRank."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from kse.catalog import load
from kse.queries.graphs import (
    _MIN_COOCCUR,
    _PR_SCALE,
    _copurchase_edges_from,
    q_graph_jaccard_neighbors,
    q_graph_pagerank,
    q_graph_triangles,
)

from .conftest import SF_T2


def _planted_lineitem(spark):
    """Orders over parts with known co-occurrence: parts (1,2,3) appear
    together twice (all three edges supported), part 4 co-occurs with 1
    only once (below the support threshold)."""
    rows = [
        (100, 1), (100, 2), (100, 3),
        (200, 1), (200, 2), (200, 3),
        (300, 1), (300, 4),
        (300, 1),  # duplicate (orderkey, partkey) line must not inflate support
    ]
    return spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG")


def test_copurchase_edges_planted(spark):
    edges = {(r.u, r.v) for r in _copurchase_edges_from(_planted_lineitem(spark)).collect()}
    assert edges == {(1, 2), (1, 3), (2, 3)}  # the triangle; (1,4) support=1 pruned
    assert _MIN_COOCCUR == 2


def test_triangles_match_bruteforce(spark):
    li = load(spark, SF_T2, "lineitem")
    edges = {(r.u, r.v) for r in _copurchase_edges_from(li).collect()}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    brute = {
        (a, b, c)
        for a, nbrs in adj.items()
        for b, c in combinations(sorted(nbrs), 2)
        if c in adj.get(b, set())
    }
    got = {(r.a, r.b, r.c) for r in q_graph_triangles(spark, SF_T2).collect()}
    assert got == brute
    assert len(got) == 61  # calibrated at sf0.01


def test_pagerank_mass_and_determinism(spark):
    res = q_graph_pagerank(spark, SF_T2)
    rows = res.collect()
    assert all(r.pr > 0 for r in rows)
    # truncating division leaks a little mass each round but never creates
    # any; total stays within 1% of the initial 1e12 budget
    total = sum(r.pr for r in rows)
    assert 0.99 * _PR_SCALE <= total <= _PR_SCALE
    again = {(r.node, r.pr) for r in q_graph_pagerank(spark, SF_T2).collect()}
    assert again == {(r.node, r.pr) for r in rows}


def test_jaccard_neighbors_bounds_and_bruteforce(spark):
    li = load(spark, SF_T2, "lineitem")
    edges = [(r.u, r.v) for r in _copurchase_edges_from(li).collect()]
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    got = {(r.u, r.v): (r.n_common, r.jaccard) for r in
           q_graph_jaccard_neighbors(spark, SF_T2).collect()}
    for (u, v), (n_common, jac) in got.items():
        assert u < v and n_common >= 2
        common = nbrs[u] & nbrs[v]
        assert len(common) == n_common
        expect = len(common) / len(nbrs[u] | nbrs[v])
        assert abs(jac - expect) < 1e-6
        assert 0.0 < jac <= 1.0
    # brute force finds exactly the same qualifying pairs
    brute = {
        (u, v)
        for u in nbrs
        for v in nbrs
        if u < v and len(nbrs[u] & nbrs[v]) >= 2
    }
    assert set(got) == brute


def test_truncate_lineage_reliable_mode_identical(spark, tmp_path):
    """truncate_lineage switches to a RELIABLE checkpoint when the context
    has a checkpoint dir (the 100 TB posture — executor loss mid-iteration
    survives), and both modes must produce identical component labels."""
    from kse.queries.llm import bigstar_components, min_label_components
    from kse.session import truncate_lineage

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (5, 1)],
        "doc_a LONG, doc_b LONG",
    )
    expect = {1: 1, 2: 1, 3: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # default: local mode, no dir
    local_min = {r.node: r.label for r in min_label_components(pairs).collect()}
    local_big = {r.node: r.label for r in bigstar_components(pairs).collect()}

    def _clear_checkpoint_dir(*, loud: bool) -> None:
        # Restoring "no checkpoint dir" has no public API, so this uses the
        # private Scala field setter — version-brittle py4j reflection. If
        # the upstream engine ever renames the field, fail LOUDLY with an
        # actionable message instead of leaking the tmp_path dir into the
        # rest of the suite (which would silently flip every later
        # truncate_lineage call to reliable mode against a deleted dir).
        # When the test BODY already failed, `loud=False` demotes a restore
        # failure to a printed warning so the primary error is the one
        # pytest reports, not the cleanup's (r8 advice).
        try:
            none_opt = sc._jvm.scala.Option.apply(None)
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(none_opt)
            restored = sc.getCheckpointDir() is None
        except Exception as exc:  # pragma: no cover - version drift only
            if not loud:
                print(f"WARNING: checkpoint-dir restore also failed: {exc!r}")
                return
            raise RuntimeError(
                "could not clear the session checkpoint dir via the private "
                "checkpointDir_$eq accessor (Spark renamed the field?); the "
                "tmp checkpoint dir would leak into the rest of the suite — "
                "update this restore or move the test to its own session"
            ) from exc
        if not restored and loud:
            raise AssertionError(
                "checkpointDir_$eq no-opped; checkpoint dir leaked into the suite"
            )

    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        # the helper must now route to a reliable checkpoint: the dir gets
        # RDD checkpoint files written under it
        probe = truncate_lineage(spark.range(5).toDF("id"))
        files = list((tmp_path / "ckpt").rglob("*"))
        assert any(f.is_file() for f in files), "no reliable checkpoint written"
        assert probe.count() == 5
        rel_min = {r.node: r.label for r in min_label_components(pairs).collect()}
        rel_big = {r.node: r.label for r in bigstar_components(pairs).collect()}
    except BaseException:
        _clear_checkpoint_dir(loud=False)
        raise
    else:
        _clear_checkpoint_dir(loud=True)

    assert local_min == rel_min == expect
    assert local_big == rel_big == expect
