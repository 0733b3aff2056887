"""Shared helpers for query builders.

Oracle-parity rules used across all modules (SURVEY.md §7.6):

- Per-row scalar arithmetic on the same parquet values is bitwise identical
  between Spark and DuckDB (same IEEE-754 ops) — no rounding needed.
- Aggregation ORDER is engine-dependent, so double sums/avgs carry float
  association error ~1e-10 relative. Round sums of large magnitudes to 1 dp
  (quantum >> error), averages to 4-6 dp.
- DuckDB sums of integers produce HUGEINT — oracles must CAST(... AS BIGINT)
  to match Spark's LongType.
- Timestamps never appear raw in outputs: cast to epoch microseconds
  (Spark ``unix_micros`` under a UTC session == DuckDB ``epoch_us``) or to
  ISO date strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kse.catalog import load, register_views


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table for a query builder."""
    return load(spark, sf_dir, name)


def sql_q(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    """SQL-path entry (SURVEY.md §3.2): register the needed tables as temp
    views under their canonical names and run Spark SQL. Used where the
    DataFrame API lacks a construct (GROUPING SETS) or where SQL is simply
    the clearer expression; the text is kept DuckDB-compatible when the
    dialects agree so the oracle can be byte-identical."""
    register_views(spark, sf_dir, tables)
    return spark.sql(sql)


# the micro-unit device's own exactness bound (see dsum): a BIGINT sum
# of floor(x*1e6) values stays exact (and round-trips the final double
# division) while each |x| <= ~9e9 and the group total stays under 2^53
# micro-units. One row outside this domain (huge-but-finite, ±Inf, NaN)
# sends the whole group down the plain IEEE path.
_MICRO_SAFE = 9.0e9
MICRO_SAFE_SQL = "BETWEEN -9000000000.0 AND 9000000000.0"


def micro_exact(c: Column) -> Column:
    """True when x is exactly representable in the micro-unit device's
    domain, false for huge-magnitude/NaN/±Inf, NULL for NULL.

    ``between`` gives all three in one comparison: NaN fails ``>=`` so
    between is false, huge values and ±Inf fall outside the bound, and
    NULL propagates. The identical predicate spells the same in DuckDB
    (MICRO_SAFE_SQL), so oracle guards can mirror it textually."""
    return c.between(-_MICRO_SAFE, _MICRO_SAFE)


def dsum(c: Column, alias: str) -> Column:
    """Order-independent, cross-engine-exact sum of a double expression.

    Rounding a float sum is boundary-fragile: Spark and DuckDB accumulate
    in different orders, so sums differ by ~1e-9 relative and any rounding
    quantum occasionally straddles a boundary (observed in practice).
    Instead: scale each value to integer micro-units (floor(x*1e6+0.5), positive values — the
    testdata values are 2-dp-like, so products of up to three factors are
    exactly 6-dp and the scaling is exact), sum as BIGINT (exact, order-
    independent, and ~2x faster than DECIMAL aggregation — profiled), then
    divide back in double. Bit-for-bit equal on both engines while the
    integer sum stays under 2^53 (~9e9 in value terms — true at every test
    sf; at genuine 100 TB scale switch the scale factor or report DECIMAL).

    The micro-unit path is defined only on FINITE doubles: Spark's
    ``floor(double)`` is a silent saturating java cast, so ``floor(Inf)``
    becomes Long.MAX and ``floor(NaN)`` becomes **0** — NaN rows would
    silently vanish from the sum (found by the ``--extreme`` parity
    battery). Guard: rows are micro-quantized only when finite, and if the
    group contains ANY non-finite value the plain IEEE double sum is
    returned instead (Inf/NaN propagation is order-independent, so the
    determinism device isn't needed there).

    Oracle twin: ``dsum_sql()`` below.
    """
    return dsum_expr(c).alias(alias)


def dsum_expr(c: Column) -> Column:
    """Unaliased ``dsum`` — for call sites that derive further columns
    from the exact sum (averages, ratios) before naming them."""
    n_unsafe = F.count(F.when(~micro_exact(c), F.lit(1)))
    micro = F.sum(F.when(micro_exact(c), F.floor(c * 1000000.0 + 0.5))) / 1000000.0
    return F.when(n_unsafe > 0, F.sum(c)).otherwise(micro)


def dsum_sql(x: str) -> str:
    """DuckDB twin of ``dsum``: micro-unit BIGINT sum on finite input,
    plain IEEE sum when the group contains any non-finite value (the
    unguarded CAST throws in DuckDB where Spark's floor silently
    saturates — same totality gap, opposite failure mode)."""
    return (
        f"CASE WHEN count(CASE WHEN NOT ({x} {MICRO_SAFE_SQL}) THEN 1 END) > 0 "
        f"THEN sum({x}) "
        f"ELSE CAST(sum(CASE WHEN ({x} {MICRO_SAFE_SQL}) THEN "
        f"CAST(floor({x} * 1000000 + 0.5) AS BIGINT) END) AS BIGINT) "
        f"/ 1000000.0 END"
    )


def r4(c: Column, alias: str) -> Column:
    """Average-scale double aggregate: round to 4 dp."""
    return F.round(c, 4).alias(alias)


def r6(c: Column, alias: str) -> Column:
    """Small-magnitude double (ratios, correlations): round to 6 dp."""
    return F.round(c, 6).alias(alias)


def ts_us(c: Column) -> Column:
    """Timestamp-NTZ -> epoch microseconds (bigint), matching DuckDB
    ``epoch_us``. Session timezone is pinned to UTC (kse.session) so the
    NTZ -> instant interpretation is identical."""
    return F.unix_micros(c.cast("timestamp"))
