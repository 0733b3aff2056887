"""Coverage extensions beyond the core SURVEY.md §2 rows: pivot, multiset
ops, frame-navigation windows, struct and bitwise scalar functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kse.queries._util import dsum, t
from kse.registry import register


@register(
    "q_agg_pivot",
    oracle="""
SELECT l_returnflag,
       count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
       count(*) FILTER (WHERE l_linestatus = 'O') AS n_o,
       CAST(sum(CAST(round(l_quantity * 1000000) AS BIGINT)) FILTER (WHERE l_linestatus = 'F') AS BIGINT) / 1000000.0 AS qty_f,
       CAST(sum(CAST(round(l_quantity * 1000000) AS BIGINT)) FILTER (WHERE l_linestatus = 'O') AS BIGINT) / 1000000.0 AS qty_o
FROM lineitem GROUP BY l_returnflag
""",
    doc=(
        "PIVOT (wide conditional aggregation). Values are enumerated "
        "explicitly — at scale an un-enumerated pivot needs a first pass to "
        "discover values, so production pivots always pin the value list."
    ),
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    scaled = F.round(F.col("l_quantity") * 1000000.0).cast("bigint")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)).alias("n"), (F.sum(scaled) / 1000000.0).alias("qty"))
    )
    return out.select(
        "l_returnflag",
        F.col("F_n").alias("n_f"),
        F.col("O_n").alias("n_o"),
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
    )


@register(
    "q_set_intersect_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    doc="INTERSECT ALL (bag semantics — multiplicity = min of the sides).",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersectAll(b)


@register(
    "q_set_except_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    doc="EXCEPT ALL (bag semantics — multiplicity subtraction).",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b)


@register(
    "q_win_nth_value",
    oracle="""
SELECT o_custkey, o_orderkey,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       first_value(o_totalprice) OVER w AS top_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    doc="nth_value / first_value over an unbounded frame (per-customer "
    "second-highest order price).",
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.first("o_totalprice").over(w).alias("top_price"),
    )


@register(
    "q_fn_struct",
    oracle="""
SELECT l_orderkey, l_linenumber,
       struct_pack(qty := l_quantity, price := l_extendedprice).qty AS s_qty,
       struct_pack(qty := l_quantity, price := l_extendedprice).price AS s_price
FROM lineitem
""",
    doc="Struct construction + field access (nested-type round trip; "
    "output flattened to scalars so the hash is representation-free).",
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = F.struct(F.col("l_quantity").alias("qty"), F.col("l_extendedprice").alias("price"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        s.getField("qty").alias("s_qty"),
        s.getField("price").alias("s_price"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
SELECT l_orderkey,
       l_orderkey & 255 AS b_and,
       l_orderkey | 7 AS b_or,
       xor(l_orderkey, 255) AS b_xor,
       l_orderkey << 2 AS b_shl,
       l_orderkey >> 3 AS b_shr
FROM lineitem
""",
    doc="Bitwise operators (and/or/xor/shifts) on bigint keys.",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(7)).alias("b_or"),
        k.bitwiseXOR(F.lit(255)).alias("b_xor"),
        F.expr("shiftleft(l_orderkey, 2)").alias("b_shl"),
        F.expr("shiftright(l_orderkey, 3)").alias("b_shr"),
    )


@register(
    "q_explode_posexplode",
    oracle="""
SELECT doc_id, CAST(r.range AS INT) AS pos,
       string_split(text, ' ')[r.range + 1] AS token
FROM documents, range(3) r
WHERE doc_id < 20 AND len(string_split(text, ' ')) > r.range
""",
    doc="Lateral explode with position (posexplode) — first 3 tokens per "
    "doc; the row-generating table-function surface.",
)
def q_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.slice(F.split("text", " "), 1, 3)).alias("pos", "token")
    )
