"""Graph analytics over relation-derived graphs: triangle counting and
PageRank, both as pure DataFrame plans with DuckDB oracle parity.

The graph is the part co-purchase graph: parts are nodes; an undirected
edge joins two parts that appear together in at least ``_MIN_COOCCUR``
orders. Deriving it is itself a scale-shaped plan — per-order pair
generation is a bounded blow-up (TPC-H caps lineitems per order at 7, and
real basket data is similarly bounded), and the support filter prunes the
dense accidental-co-occurrence tail BEFORE any graph algorithm runs, so
downstream joins operate on a sparse graph. At sf0.01 this yields ~3.4k
edges and 61 triangles; support>=1 would yield 116k edges and 414k
triangles (measured) — the filter is the difference between a usable
graph and noise.

PageRank uses fixed-point integer arithmetic (bigint micro-mass, explicit
DIV at every division) so Spark and DuckDB compute bit-identical ranks —
float PageRank differs across engines in summation order, which would
force tolerance checks; the integer recurrence keeps the driver's exact
hash-match gate applicable to an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kse.queries._util import t
from kse.registry import register
from kse.session import truncate_lineage

_MIN_COOCCUR = 2  # minimum co-occurring orders for a co-purchase edge

_EDGE_CTE = f"""
op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING count(*) >= {_MIN_COOCCUR}
)"""


# Per-session edge memo lives ON the session object (like registry's
# _plan_cache): GC reclaims it with the session (no id() aliasing after a
# session dies), and registry.invalidate_plans clears it alongside the
# plan cache when a layout changes under the same sf_dir path.
_EDGE_CACHE_ATTR = "_kse_edge_cache"


def _edge_cache(spark: SparkSession) -> dict[str, DataFrame]:
    cache = getattr(spark, _EDGE_CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _EDGE_CACHE_ATTR, cache)
    return cache


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edges ``(u, v)`` with ``u < v`` between parts
    sharing >= _MIN_COOCCUR orders. One self-join on the order key (bounded
    per-group fan-out) + one partial-aggregating groupBy; the HAVING filter
    runs inside the aggregate, so only supported edges leave the shuffle.

    The result is localCheckpoint-ed LAZILY and memoized per
    (session, sf_dir) — the same discipline as _events_partitioned
    (extras.py): every graph query references the edge table 2-6 times,
    and Spark re-executes the whole derivation subtree per reference (no
    ReusedExchange fires across differently-keyed joins above it —
    verified in the executed plan). The lazy checkpoint keeps plan
    CONSTRUCTION side-effect-free (explain / plan audits don't trigger
    the derivation job); the first action materializes the checkpoint
    once, and every later reference across the whole graph family reuses
    it. That's exactly the production shape at 100 TB: edges are a shared
    derived dataset, written once (HDFS checkpoint / table), consumed by
    every algorithm — the same lineage-truncation discipline as
    min_label_components (llm.py). tools/scale10.py times the one-time
    derivation separately so the per-query numbers don't hide it."""
    cache = _edge_cache(spark)
    cached = cache.get(sf_dir)
    if cached is not None:
        return cached
    edges = _copurchase_edges_from(
        t(spark, sf_dir, "lineitem")
    )
    edges = truncate_lineage(edges, eager=False)
    cache[sf_dir] = edges
    return edges


def _copurchase_edges_from(li: DataFrame) -> DataFrame:
    """Pure (uncached, uncheckpointed) edge derivation from any lineitem-
    shaped frame — the unit the planted-graph tests exercise directly."""
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _MIN_COOCCUR)
        .select("u", "v")
    )


@register(
    "q_graph_triangles",
    oracle=f"""
WITH {_EDGE_CTE}
SELECT e1.u AS a, e1.v AS b, e2.v AS c
FROM edges e1
JOIN edges e2 ON e1.v = e2.u
JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v
""",
    doc=(
        "Triangle enumeration on the co-purchase graph: every edge is "
        "oriented low->high id, so each triangle (a<b<c) is produced "
        "exactly once by the wedge join e(a,b) |x| e(b,c) |x| e(a,c) — no "
        "post-hoc dedup or /6 correction. Scale shape: the wedge join's "
        "fan-out is sum(deg^2) of the SUPPORT-FILTERED graph (sparse); the "
        "closing edge check is an equi-join, not a filter over all wedges "
        "against a broadcast — at 100 TB both joins shuffle on their keys "
        "and skew is bounded by the support threshold. The standard "
        "refinement (orient edges by degree so high-degree nodes never "
        "fan out) drops in by replacing the u<v orientation with a "
        "(deg, id) ordering; at the test graph's bounded degrees the id "
        "orientation is already within noise of it."
    ),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    return (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )


_PR_SCALE = 1_000_000_000_000  # total rank mass in integer micro-units
_PR_ITERS = 6


def _pagerank_oracle() -> str:
    """Unrolled fixed-point PageRank as a DuckDB CTE chain. ``//`` (DuckDB)
    and ``DIV`` (Spark) both truncate toward zero for positive bigints, and
    every intermediate stays far below 2^63, so the two engines run the
    same exact integer recurrence."""
    base = f"((15 * ({_PR_SCALE} // (SELECT c FROM n))) // 100)"
    ctes = [
        f"sym AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges)",
        "deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u)",
        "n AS (SELECT count(*) AS c FROM deg)",
        f"pr0 AS (SELECT node, {_PR_SCALE} // (SELECT c FROM n) AS pr FROM deg)",
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"pr{i} AS (SELECT s.v AS node, "
            f"{base} + (85 * sum(p.pr // d.deg)) // 100 AS pr "
            f"FROM sym s JOIN pr{i - 1} p ON s.u = p.node "
            f"JOIN deg d ON d.node = s.u GROUP BY s.v)"
        )
    return (
        f"WITH {_EDGE_CTE},\n"
        + ",\n".join(ctes)
        # DuckDB's integer sum promotes to HUGEINT (-> float64 in pandas);
        # cast the output so the oracle's dtype matches Spark's BIGINT and
        # the driver's exact value hash compares like-for-like (_util.py rule).
        + f"\nSELECT node, CAST(pr AS BIGINT) AS pr FROM pr{_PR_ITERS}"
    )


@register(
    "q_graph_pagerank",
    oracle=_pagerank_oracle(),
    doc=(
        f"PageRank ({_PR_ITERS} synchronous iterations, damping 0.85) on "
        "the undirected co-purchase graph, in fixed-point bigint arithmetic "
        "(1e12 total mass, truncating DIV at both divisions) so the result "
        "is bit-identical across engines — an iterative algorithm under the "
        "exact hash gate instead of the weaker tolerance check. Each "
        "iteration is one equi-join (ranks onto edge sources) + one "
        "partial-aggregating groupBy (messages by destination) — the "
        "Pregel-on-DataFrames shape; the undirected graph has no dangling "
        "nodes, so no dangling-mass correction term is needed. Edges are "
        "localCheckpoint-ed once so the co-occurrence derivation does not "
        "re-expand per iteration (same lineage-truncation discipline as "
        "min_label_components, llm.py); on a cluster the checkpoint lands "
        "on HDFS and iteration cost is O(edges) per round, shuffled on "
        "node id."
    ),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = truncate_lineage(sym, eager=False)  # lazy: plan build stays side-effect-free
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).alias("c"))
    pr = deg.crossJoin(n).select(
        "node", F.expr(f"{_PR_SCALE} DIV c").alias("pr")
    )
    for _ in range(_PR_ITERS):
        contrib = pr.join(deg, "node").select(
            "node", F.expr("pr DIV deg").alias("contrib")
        )
        msgs = (
            sym.join(contrib, sym.u == contrib.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("contrib").alias("msum"))
        )
        pr = msgs.crossJoin(n).select(
            "node",
            F.expr(f"(15 * ({_PR_SCALE} DIV c)) DIV 100 + (85 * msum) DIV 100").alias(
                "pr"
            ),
        )
    return pr


@register(
    "q_graph_jaccard_neighbors",
    oracle=f"""
WITH {_EDGE_CTE},
sym AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
common AS (
  SELECT a.u AS u, b.u AS v, count(*) AS n_common
  FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
  GROUP BY a.u, b.u HAVING count(*) >= 2
)
SELECT c.u, c.v, CAST(c.n_common AS BIGINT) AS n_common,
       round(CAST(c.n_common AS DOUBLE) / (du.deg + dv.deg - c.n_common), 6)
         AS jaccard
FROM common c
JOIN deg du ON du.node = c.u
JOIN deg dv ON dv.node = c.v
""",
    doc=(
        "Neighborhood Jaccard similarity (link prediction): for every "
        "node pair sharing >= 2 neighbors, |N(u) ∩ N(v)| / |N(u) ∪ N(v)| "
        "— the classic co-citation / you-may-also-like signal. The pair "
        "candidates come from a wedge join THROUGH the shared neighbor "
        "(an equi-join on the middle node), so cost is sum(deg^2) of the "
        "support-filtered sparse graph, never nodes^2; the >= 2 common "
        "filter runs inside the partial aggregate. Degrees join back as "
        "a small broadcastable table. Same skew discipline as triangles: "
        "the support threshold bounds the hub degrees that would "
        "dominate the wedge fan-out at 100 TB."
    ),
)
def q_graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    a, b = sym.alias("a"), sym.alias("b")
    common = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.u") < F.col("b.u")))
        .groupBy(F.col("a.u").alias("u"), F.col("b.u").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= 2)
    )
    du = deg.alias("du")
    dv = deg.alias("dv")
    return (
        common.join(du, F.col("u") == F.col("du.node"))
        .join(dv, F.col("v") == F.col("dv.node"))
        .select(
            "u",
            "v",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("du.deg") + F.col("dv.deg") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
