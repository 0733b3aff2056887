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
# micro-units. Finite values beyond that take the wide DECIMAL/HUGEINT
# band (see dsum); only non-finite or absorption-band (> ~9e15) rows
# send the whole group down the plain IEEE path.
_MICRO_SAFE = 9.0e9
MICRO_SAFE_SQL = "BETWEEN -9000000000.0 AND 9000000000.0"

# wide-band bounds (see dsum): |x| <= 9e12 keeps floor(x*1e6) inside
# BIGINT (9.0000005e18 < 2^63-1 = 9.223e18), |x| <= 9e15 keeps the
# unit-scale floor(x) inside BIGINT with 1e6 headroom for the decimal
# re-scale. Spelled as literals so oracle guards mirror them textually.
_MID_SAFE = 9.0e12
MID_SAFE_SQL = "BETWEEN -9000000000000.0 AND 9000000000000.0"
_WIDE_SAFE = 9.0e15
WIDE_SAFE_SQL = "BETWEEN -9000000000000000.0 AND 9000000000000000.0"
_TWO53 = 9007199254740992  # 2^53 — the decimal->double split quantum


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
    battery). Three bands:

    - ``|x| <= 9e9``: the hot path above — BIGINT micro units.
    - ``9e9 < |x| <= 9e15`` finite: the wide band. A plain IEEE fallback
      here would be order-dependent under Spark's partial aggregation
      (one 1e10 among small values rounds differently per association,
      flagged by the round-5 advisor), so these groups sum exactly in
      DECIMAL(38,0) micro units instead: ``floor(x*1e6+0.5)`` while that
      stays inside BIGINT (|x| <= 9e12), unit-scale ``floor(x+0.5)*1e6``
      above it (micro precision is already below one double ulp there).
    - any NaN/±Inf or ``|x| > 9e15`` in the group: plain IEEE double sum.
      Inf/NaN propagation is order-independent, and beyond ~9e15 a huge
      value absorbs small addends in any association order, so the
      remaining order sensitivity is confined to groups of multiple
      comparable >9e15 values — documented out-of-domain (report DECIMAL
      inputs if you genuinely sum astronomic doubles).

    Oracle twin: ``dsum_sql()`` below.
    """
    return dsum_expr(c).alias(alias)


def out_of_domain(c: Column) -> Column:
    """True when x forces the whole group onto the plain IEEE sum path:
    NaN, ±Inf (both fail BETWEEN on either engine), or absorption-band
    magnitude (|x| > 9e15)."""
    return ~c.between(-_WIDE_SAFE, _WIDE_SAFE)


def in_wide_band(c: Column) -> Column:
    """True for finite 9e9 < |x| <= 9e15 — the DECIMAL(38,0) band."""
    return c.between(-_WIDE_SAFE, _WIDE_SAFE) & ~micro_exact(c)


def wide_micro(c: Column) -> Column:
    """Per-row wide-band micro units as DECIMAL(38,0) (NULL outside the
    band): ``floor(x*1e6+0.5)`` while that stays inside BIGINT
    (|x| <= 9e12), unit-scale ``floor(x+0.5)*1e6`` above it (micro
    precision is already below one double ulp there)."""
    in_mid = c.between(-_MID_SAFE, _MID_SAFE) & ~micro_exact(c)
    in_unit = c.between(-_WIDE_SAFE, _WIDE_SAFE) & ~c.between(-_MID_SAFE, _MID_SAFE)
    return F.when(in_mid, F.floor(c * 1000000.0 + 0.5).cast("decimal(38,0)")).when(
        in_unit, F.floor(c + 0.5).cast("decimal(38,0)") * 1000000
    )


def dec_to_double(total: Column, scale: float = 1000000.0) -> Column:
    """Exact-decimal total -> double value (dividing by ``scale``).

    decimal -> double goes via a 2^53 quotient/remainder split: DuckDB's
    int128->double cast is not correctly rounded past 2^53 (measured:
    484000000001066500000 casts to ...66.56 there vs ...66.44 in the
    JVM), so a direct CAST(total AS DOUBLE) would diverge by 1 ulp.
    Both split parts are exactly representable doubles (remainder
    < 2^53; the complement has its low 53 bits zero), and the single
    IEEE add + divide round identically on both engines."""
    mod = total % _TWO53
    recon = (total - mod).cast("double") + mod.cast("double")
    return recon / scale if scale != 1.0 else recon


def dec_to_double_sql(total: str, scale: str = "1000000.0") -> str:
    """SQL twin of ``dec_to_double`` (dialect-shared)."""
    recon = (
        f"(CAST(({total}) - (({total}) % {_TWO53}) AS DOUBLE) "
        f"+ CAST(({total}) % {_TWO53} AS DOUBLE))"
    )
    return f"{recon} / {scale}" if scale else recon


def micro_total_to_double(fast: Column, wide: Column, scale: float = 1000000.0) -> Column:
    """Combine a BIGINT hot-band sum and a DECIMAL(38,0) wide-band sum
    (``wide`` non-NULL) into the final double value via the 2^53 split
    (see ``dec_to_double``). ``scale`` is the quantization factor (1e6
    for micro-unit devices, 1.0 for unit-scale devices)."""
    total = (
        F.coalesce(fast.cast("decimal(38,0)"), F.lit(0).cast("decimal(38,0)"))
        + wide
    )
    return dec_to_double(total, scale)


def dsum_expr(c: Column) -> Column:
    """Unaliased ``dsum`` — for call sites that derive further columns
    from the exact sum (averages, ratios) before naming them."""
    n_bad = F.count(F.when(out_of_domain(c), F.lit(1)))
    n_wide = F.count(F.when(in_wide_band(c), F.lit(1)))
    fast = F.sum(F.when(micro_exact(c), F.floor(c * 1000000.0 + 0.5)))
    wide = F.sum(wide_micro(c))
    return (
        F.when(n_bad > 0, F.sum(c))
        .when(n_wide > 0, micro_total_to_double(fast, wide))
        .otherwise(fast / 1000000.0)
    )


def wide_micro_sql(x: str) -> str:
    """SQL twin of ``wide_micro`` (the per-row wide-band DECIMAL(38,0)
    CASE), dialect-shared."""
    return (
        f"CASE WHEN ({x} {MID_SAFE_SQL}) AND NOT ({x} {MICRO_SAFE_SQL}) "
        f"THEN CAST(floor({x} * 1000000 + 0.5) AS DECIMAL(38,0)) "
        f"WHEN ({x} {WIDE_SAFE_SQL}) AND NOT ({x} {MID_SAFE_SQL}) "
        f"THEN CAST(floor({x} + 0.5) AS DECIMAL(38,0)) * 1000000 END"
    )


def dsum_sql(x: str, filter_sql: str = "", over: str = "", distinct: bool = False) -> str:
    """SQL twin of ``dsum``, in the dialect SHARED by Spark and DuckDB so
    the same text serves both SQL-path queries and DuckDB oracles: BIGINT
    micro-unit sum on the hot band, DECIMAL(38,0)-combined micro/unit sum
    on the wide finite band, plain IEEE sum when the group contains any
    non-finite or absorption-band value (the unguarded CAST throws in
    DuckDB where Spark's floor silently saturates — same totality gap,
    opposite failure mode). ``filter_sql`` (e.g. ``"l_linestatus = 'F'"``)
    appends ``FILTER (WHERE ...)`` to every aggregate for pivot-style
    conditional cells; ``over`` (e.g. ``"w"``) appends ``OVER w`` for the
    window-frame form; ``distinct`` makes each band sum a DISTINCT sum
    (the bands partition the value space, so per-band distinct sums add
    up to the global distinct sum)."""
    f = f" FILTER (WHERE {filter_sql})" if filter_sql else ""
    f += f" OVER {over}" if over else ""
    d = "DISTINCT " if distinct else ""
    fast = (
        f"sum({d}CASE WHEN ({x} {MICRO_SAFE_SQL}) THEN "
        f"CAST(floor({x} * 1000000 + 0.5) AS BIGINT) END){f}"
    )
    wide = f"sum({d}{wide_micro_sql(x)}){f}"
    total = f"(COALESCE(CAST({fast} AS DECIMAL(38,0)), 0) + {wide})"
    combined = dec_to_double_sql(total)
    return (
        f"CASE WHEN count(CASE WHEN NOT ({x} {WIDE_SAFE_SQL}) THEN 1 END){f} > 0 "
        f"THEN sum({d}{x}){f} "
        f"WHEN count(CASE WHEN ({x} {WIDE_SAFE_SQL}) "
        f"AND NOT ({x} {MICRO_SAFE_SQL}) THEN 1 END){f} > 0 "
        f"THEN {combined} "
        f"ELSE CAST({fast} AS BIGINT) / 1000000.0 END"
    )


def dround(c: Column, n: int) -> Column:
    """Deterministic n-dp rounding of an ENGINE-IDENTICAL double.

    round(x, n) is a parity landmine even when both engines hold the
    identical double: Spark rounds via exact BigDecimal HALF_UP while
    DuckDB scales in floating point, so a value within an ulp of a
    halfway boundary flips between them (found twice by the seeded fuzz:
    q_fn_math's cents, then ratio roundings). floor(x*10^n + 0.5) is the
    same IEEE op sequence on both engines — deterministic, and exact
    while the scaled value stays under 2^53; outside that band (which
    also catches NaN/±Inf via BETWEEN) the double cannot resolve 10^-n
    anyway and the raw value passes through.

    Use ONLY where the input double is bit-identical across engines
    (per-row scalars on stored values, ratios of exact integer/decimal
    aggregates). Where the inputs may already differ by an ulp (IEEE
    aggregate averages, corr, libm transcendentals), keep ``F.round`` —
    no device can pin diverging inputs; the rounding quantum absorbs
    the difference instead. Oracle twin: ``dround_sql``."""
    scale = float(10**n)
    bound = 9.0e15 / scale
    return F.when(
        c.between(-bound, bound), F.floor(c * scale + 0.5) / scale
    ).otherwise(c)


def dround_sql(x: str, n: int) -> str:
    """SQL twin of ``dround`` (dialect-shared)."""
    scale = float(10**n)
    bound = 9.0e15 / scale
    return (
        f"CASE WHEN ({x}) BETWEEN -{bound!r} AND {bound!r} "
        f"THEN CAST(floor(({x}) * {scale!r} + 0.5) AS BIGINT) / {scale!r} "
        f"ELSE ({x}) END"
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


def grand_total_if_empty(
    src: DataFrame, out: DataFrame, literals: dict[str, Column]
) -> DataFrame:
    """SQL-standard empty-input grand total for grouping-sets shapes.

    ``GROUP BY GROUPING SETS (..., ())`` / ``ROLLUP`` / ``CUBE`` over an
    EMPTY relation must still emit the ``()`` grouping's row — the empty
    grouping set is a global aggregate, and a global aggregate over zero
    rows is one row (count 0, NULL sums). DuckDB and Postgres do; Spark's
    Expand-based implementation returns ZERO rows (zero-row parity battery
    find, round 6 — a rollup over a fully-filtered 100 TB partition would
    silently lose its grand-total row).

    The ``()`` row over empty input is fully determined a priori — NULL
    group keys, ``grouping() = 1`` flags, ``count = 0``, NULL sums — so no
    second pass over the data is needed: the guard aggregates ``count(1)``
    over a zero-column projection of ``src`` (column-pruned scan, footer
    row-counts only) and the WHERE filters the literal row away whenever
    the input is non-empty. ``literals`` supplies the non-NULL positions
    (grouping flags, zero counts, pinned scope labels); every other output
    column is a typed NULL.
    """
    guard = (
        src.groupBy()
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") == 0)
    )
    cols = [
        literals.get(f.name, F.lit(None)).cast(f.dataType).alias(f.name)
        for f in out.schema.fields
    ]
    return out.unionByName(guard.select(*cols))
