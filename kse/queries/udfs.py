"""UDF / UDAF / UDTF surface (SURVEY.md §2.11) — the Python escape hatches,
each with its 100 TB cost documented. The Python *mechanism* has no DuckDB
twin, but every computation here is deterministic, so each carries a full
value-hash oracle that re-expresses the same semantics in SQL — the
strongest check available, upgraded from the original rows-only check.

Cost ladder (per SURVEY.md §4 / pyspark guide):
1. built-in functions — JVM, whole-stage codegen, free.          <- default
2. pandas_udf / applyInPandas / mapInPandas — Arrow batches,
   ~10-100x faster than row UDFs; one Python worker per core.    <- vectors
3. row-at-a-time F.udf — per-row pickle round trip.              <- avoid
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType

from kse.queries._util import t
from kse.registry import register


@register(
    "q_udf_scalar",
    oracle="""
SELECT doc_id,
       CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT)
         AS n_vowels
FROM documents
""",
    doc=(
        "Row-at-a-time Python UDF (vowel counter) — deliberately the "
        "discouraged path: every row crosses JVM→Python individually. "
        "Kept as the API-completeness demo; q_udf_pandas_scalar is the "
        "same computation at Arrow speed."
    ),
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType=IntegerType())
    def vowel_count(s: str) -> int | None:
        # JVM expressions null-propagate automatically; a Python UDF sees
        # None and must handle it itself (matching the oracle's NULL out)
        if s is None:
            return None
        return sum(1 for ch in s if ch in "aeiou")

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", vowel_count("text").alias("n_vowels"))


@register(
    "q_udf_pandas_scalar",
    oracle="""
SELECT vec_id, label,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
""",
    doc=(
        "Vectorized Arrow pandas_udf: L2 norm over the embedding column "
        "via one NumPy matmul per Arrow batch — the workhorse pattern for "
        "vector math the JVM lambdas can't express efficiently."
    ),
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def l2_norm(vecs: pd.Series) -> pd.Series:
        arrs = vecs.to_numpy()
        mask = np.array([a is not None for a in arrs])
        out = np.empty(len(arrs), dtype=object)  # None -> NULL, as the oracle
        if mask.any():
            mat = np.stack(arrs[mask]).astype(np.float64)  # (batch, 64)
            out[mask] = np.sqrt((mat**2).sum(axis=1))
        return pd.Series(out)

    e = t(spark, sf_dir, "embeddings")
    return e.select("vec_id", "label", F.round(l2_norm("embedding"), 6).alias("l2_norm"))


@register(
    "q_udf_pandas_grouped",
    oracle="""
WITH ex AS (
  SELECT label, vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, range(1, 65) r(i)
), cent AS (
  SELECT label, i, avg(v) AS c FROM ex GROUP BY label, i
)
SELECT ex.vec_id, ex.label,
       round(sqrt(sum((ex.v - cent.c) * (ex.v - cent.c))), 6) AS centroid_dist
FROM ex JOIN cent ON ex.label IS NOT DISTINCT FROM cent.label AND ex.i = cent.i
GROUP BY ex.vec_id, ex.label
""",
    doc=(
        "Grouped-map applyInPandas: per label, distance of each vector to "
        "its own group centroid (a per-group model-fit shape). Each group "
        "arrives as one pandas frame after a single shuffle on the key; "
        "state is bounded by max group size — salt the key if a group "
        "outgrows executor memory."
    ),
)
def q_udf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    def centroid_dist(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = pdf["embedding"].to_numpy()
        mask = np.array([a is not None for a in arrs])
        dist = np.empty(len(arrs), dtype=object)  # NULL vectors -> NULL dist
        if mask.any():
            mat = np.stack(arrs[mask]).astype(np.float64)
            centroid = mat.mean(axis=0)
            dist[mask] = np.round(np.sqrt(((mat - centroid) ** 2).sum(axis=1)), 6)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "centroid_dist": dist,
            }
        )

    e = t(spark, sf_dir, "embeddings")
    return e.groupBy("label").applyInPandas(
        centroid_dist, schema="vec_id bigint, label int, centroid_dist double"
    )


@register(
    "q_udtf",
    oracle="""
SELECT doc_id, CAST(i - 1 AS INT) AS pos, string_split(text, ' ')[i] AS token
FROM documents, range(1, 6) r(i)
WHERE doc_id < 100 AND text IS NOT NULL
  AND i <= least(5, len(string_split(text, ' ')))
""",
    doc=(
        "Table function (one row → many): explode each document into "
        "(doc_id, pos, token) rows via a Spark 4 Python UDTF. The "
        "equivalent JVM-side posexplode is what production uses; the UDTF "
        "exists to prove the extension surface."
    ),
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:  # NULL doc -> no rows, like LATERAL over NULL
                return
            for i, tok in enumerate(text.split(" ")[:5]):
                yield i, tok

    spark.udtf.register("kse_tokenize", Tokenize)
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM _udtf_docs d, LATERAL kse_tokenize(d.text) t"
    )


@register(
    "q_udf_simhash_arrow",
    oracle="""
WITH tok AS (
  SELECT doc_id, token, count(*) AS cnt,
         CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS thl
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY doc_id, token
),
contrib AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (thl >> CAST(b.bit AS INT)) & 1 = 1
             THEN cnt ELSE -cnt END) AS s
  FROM tok, (SELECT unnest(range(60)) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                ELSE 0 END) AS BIGINT) AS simhash
FROM contrib GROUP BY doc_id
""",
    doc=(
        "Arrow-tier twin of _simhash_fingerprints (llm.py): token hashes "
        "are computed JVM-side (one md5 per token, exactly as the codegen "
        "path), then ONE mapInPandas pass unpacks all 60 bits as a numpy "
        "bit-matrix ((h[:,None] >> bits) & 1) and sign-sums per doc — "
        "vectorized C instead of 60 generated rows per token. Same "
        "fingerprints, same oracle. This completes the measured "
        "three-tier story for one operator: interpreted HOF lambdas "
        "(42 s at 10x) vs codegen explode+aggregate (4.2 s) vs "
        "Arrow+numpy (measured 1.3 s) — the UDF family's claim that Python is only "
        "justified when vector math beats JVM row processing, now "
        "testable on a real operator. Partition-local: the per-doc hash "
        "arrays arrive intact in each Arrow batch, so no shuffle happens "
        "in Python; output is one row per doc."
    ),
)
def q_udf_simhash_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id",
        F.expr(
            "transform(split(text, ' '),"
            " tk -> cast(conv(substring(md5(tk), 1, 15), 16, 10) as bigint))"
        ).alias("hs"),
    )

    def fingerprint(batches):
        bits = np.arange(60, dtype=np.uint64)
        for pdf in batches:
            out_ids, sims = [], []
            for doc_id, hs in zip(pdf["doc_id"], pdf["hs"]):
                if hs is None:  # NULL text: JVM explode drops the doc too
                    continue
                h = np.asarray(hs, dtype=np.uint64)
                # (n_tokens x 60) bit matrix -> ±1 sums -> majority bits
                bm = ((h[:, None] >> bits) & 1).astype(np.int64)
                sums = (2 * bm - 1).sum(axis=0)
                out_ids.append(doc_id)
                sims.append(int(((sums > 0).astype(np.uint64) << bits).sum()))
            yield pd.DataFrame({"doc_id": out_ids, "simhash": sims})

    return hashed.mapInPandas(fingerprint, "doc_id LONG, simhash LONG")


@register(
    "q_udf_pandas_grouped_agg",
    oracle="""
SELECT c_nationkey,
       round(median(c_acctbal) FILTER (WHERE NOT isnan(c_acctbal)), 6) AS median_bal,
       CAST(count(*) AS BIGINT) AS n
FROM customer
GROUP BY c_nationkey
""",
    doc=(
        "GROUPED_AGG pandas UDF — the third pandas-UDF flavor (§2.11): a "
        "true user-defined AGGREGATE, usable inside groupBy().agg() next "
        "to built-ins, unlike grouped-map applyInPandas which replaces "
        "the whole group projection. The example is an exact median: an "
        "order statistic, not an accumulation, so the result is order-"
        "independent and hash-portable (numpy's even-n midpoint average "
        "equals DuckDB's quantile_cont interpolation on the same "
        "doubles). Scale note: a GROUPED_AGG UDF has NO partial "
        "aggregation — every group's full column ships to one Python "
        "worker (Arrow-batched), which is exactly what an exact median "
        "needs anyway (it is not mergeable); for sketchable statistics "
        "prefer built-ins (percentile_approx rides partial aggs, see "
        "q_agg_approx_percentile). Memory bounds: per-group state is one "
        "float64 column, salting applies if a group outgrows a worker."
    ),
)
def q_udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType

    @F.pandas_udf(DoubleType())
    def exact_median(v: pd.Series) -> float:
        a = v.dropna().to_numpy(dtype=np.float64)
        if not a.size:
            return None
        m = float(np.median(a))
        # np.round multiplies by 10^6 internally, so it overflows to Inf
        # for |m| > ~1.8e302 where SQL round() is overflow-safe (found by
        # the --extreme battery); at that magnitude 6-dp rounding is an
        # identity, so skip it
        return float(np.round(m, 6)) if abs(m) < 1e300 else m

    # a GROUPED_AGG UDF cannot share agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas UDAF too
    @F.pandas_udf(LongType())
    def n_rows(v: pd.Series) -> int:
        return len(v)

    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        exact_median("c_acctbal").alias("median_bal"),
        n_rows("c_acctbal").alias("n"),
    )


@register(
    "q_udf_pandas_window_agg",
    oracle="""
SELECT c_custkey, c_nationkey,
       round(median(c_acctbal) FILTER (WHERE NOT isnan(c_acctbal))
               OVER (PARTITION BY c_nationkey), 6)
         AS nation_median_bal
FROM customer
""",
    doc=(
        "GROUPED_AGG pandas UDF evaluated OVER a window — the same "
        "exact-median UDAF attached to every row of its partition "
        "(an unbounded frame), the way a per-entity statistic is "
        "joined back without a self-join. Spark runs the UDF once per "
        "partition and broadcasts the scalar to the partition's rows "
        "inside the window operator: one shuffle on the partition key, "
        "no second pass over customer. Same non-mergeable caveat as the "
        "groupBy form; bounded frames over pandas UDFs re-evaluate per "
        "frame and are the expensive variant to avoid at 100 TB. "
        "(Placement rule, enforced by Catalyst: GROUPED_AGG UDFs cannot "
        "share an agg() with JVM aggregates — the groupBy twin therefore "
        "computes its row count as a second pandas UDAF.)"
    ),
)
def q_udf_pandas_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    @F.pandas_udf(DoubleType())
    def exact_median(v: pd.Series) -> float:
        a = v.dropna().to_numpy(dtype=np.float64)
        if not a.size:
            return None
        m = float(np.median(a))
        # np.round multiplies by 10^6 internally, so it overflows to Inf
        # for |m| > ~1.8e302 where SQL round() is overflow-safe (found by
        # the --extreme battery); at that magnitude 6-dp rounding is an
        # identity, so skip it
        return float(np.round(m, 6)) if abs(m) < 1e300 else m

    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        exact_median("c_acctbal").over(w).alias("nation_median_bal"),
    )
