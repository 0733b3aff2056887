"""Adversarial-parity batteries: the differential harness over hostile data shapes.

The tiny-table pytest sweep (tests/test_edge_cases.py) proves every
registered query EXECUTES on adversarial data; this tool proves the
stronger property that Spark and the DuckDB oracle AGREE on it. It
plants every catalog table with n rows where every non-key column
alternates NULL (the shape heavily-filtered or late-arriving 100 TB
data actually has), then runs the full oracle comparison from
tools/check.py against the planted directory.

Run: python tools/null_parity.py [n_rows]          # NULL mode (default 8 rows)
     python tools/null_parity.py 0                 # zero-row mode: EVERY table
                                                   # empty — data-derived spines,
                                                   # empty aggregates, the SQL-
                                                   # standard () grand-total row
                                                   # (first run found Spark's
                                                   # Expand dropping it in all 4
                                                   # grouping-sets shapes)
     python tools/null_parity.py 1                 # singleton mode: one row per
                                                   # table (degenerate windows,
                                                   # self-joins, stddev of n=1)
     python tools/null_parity.py --empty=dims      # mixed cardinality: the named
     python tools/null_parity.py --empty=facts     # group (or --empty=a,b,...)
                                                   # planted EMPTY while the rest
                                                   # keep n_rows — one join side
                                                   # empty, the other populated
     python tools/null_parity.py --ties [n_rows]   # tie mode: every value column
                                                   # CONSTANT, so every ordering,
                                                   # arg-extreme, and top-k ties
     python tools/null_parity.py --nasty [n_rows]  # hostile-string mode: quotes,
                                                   # embedded newlines, unicode,
                                                   # regex metachars, edge spaces
     python tools/null_parity.py --dupkeys [n_rows] # duplicate-key mode: every key
                                                   # value appears twice — probes
                                                   # which pairs RELY on key
                                                   # identity (PK contracts)
     python tools/null_parity.py --neg [n_rows]    # negative-numerics mode: every
                                                   # value number negative — math
                                                   # domains, sign-dependent
                                                   # division/modulo

Every oracle-paired query must hold exact value parity except the
explicitly whitelisted divergences below — each with the reason the
divergence is the CORRECT behavior rather than a bug. The run fails
loudly if a non-whitelisted query diverges OR if a whitelisted one
unexpectedly starts passing (stale whitelist entries hide regressions).

This battery caught and drove the fixes for 23 real pair bugs in round
4: oracle ''-shingles from concat_ws over NULL tokens turning every
NULL document into a candidate duplicate of every other, DuckDB concat
null-skipping vs Spark null-propagation in URL canonicalization,
to_json field-dropping vs explicit nulls, pivot NULL cells where a
COUNT must be 0, NULL vectors entering k-means as centroids, and a
ragged-ndarray crash in the Arrow SemDeDup scorer.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query -> why Spark and the oracle legitimately disagree on NULL-riddled
# tiny data (each reason states why the divergence is correct, not a bug)
EXPECTED_DIVERGENCE: dict[str, str] = {
    # (q_agg_approx_percentile was whitelisted until r5: the old
    # check_oracle used quantile_cont, which interpolates between
    # elements where percentile_approx elects one. Fixed at the source —
    # the check oracle now uses quantile_disc, whose rank definition
    # matches Spark's GK element choice exactly on sketch-exact small
    # inputs (verified across n=1..16, NULLs, ties, negatives) — so the
    # pair holds parity under every battery.)
    # (q_agg_unpivot was whitelisted in all five modes until r5: the melt
    # reports only its pinned ['F','O'] columns while the oracle grouped
    # the full planted domain. Fixed at the source — the oracle now pins
    # the same domain with IN ('F','O'), which is what a pinned-column
    # melt MEANS — so the pair holds parity under every battery.)
}

# hostile-string mode found 4 real pair bugs on first run: the embedded-CSV
# round-trip garbled fields containing delimiters/quotes (now RFC-4180
# quoted at assembly, parsed with escape='"'); from_xml trims element-text
# whitespace (oracle now trims); the fingerprint oracle NULLed 2-token
# docs through '||' where concat_ws matches Spark; and the multimodal
# checksum oracle summed codepoints where the engine sums UTF-8 bytes.
NASTY_STRINGS = [
    "",  # empty string: distinct from NULL, splits to [''], len 0
    'quote " and comma,',
    "embedded\nnewline tok",
    "unicode \u6c49\u5b57 \u00e9\u00fc \u00df",
    "regex .* [a-z]+ (meta) $^",
    "back\\slash\ttab",
    "ALL CAPS MiXeD case",
    "trailing space ",
    " leading space",
]

# tie mode found real bugs on first run: Spark corr DIVIDE_BY_ZERO-threw
# under ANSI on zero-variance groups (now computed via try_divide of
# co-moments), and bare max_by/min_by elected DIFFERENT orderkeys per
# engine under price ties (now a lexicographic composite-struct extreme).
TIE_EXPECTED_DIVERGENCE: dict[str, str] = {}

NASTY_EXPECTED_DIVERGENCE: dict[str, str] = {}

# negative-numerics mode found 2 real pair gaps on first run: DuckDB
# sqrt/ln THROW on negative input where Spark yields NaN/NULL (both
# sides now define out-of-domain as NULL via CASE guards), and the
# sum-of-positives fold returned 0.0 (Spark, 0-init fold) vs NULL
# (DuckDB, list_sum of an empty list) when nothing is positive.
NEG_EXPECTED_DIVERGENCE: dict[str, str] = {}

# Numeric-extremes mode: every non-key double cycles through IEEE-754
# edge values (+-Inf, NaN, -0.0, 1.5e308 so any two-term sum overflows
# to Inf, the 5e-324 subnormal), embedding vectors cycle through
# all-Inf / all-NaN / mixed-sign-Inf / -0.0 patterns, and integers sit
# at +-2^40 / +-2^30 magnitudes (large enough to expose silent
# precision loss, small enough that an 8-row SUM stays in BIGINT).
# Contract for this mode only: a pair where BOTH engines reject the
# input (e.g. ANSI CAST(Inf AS BIGINT) throwing on each side) counts as
# parity — rejecting absurd input identically IS agreement; divergence
# means one side threw while the other answered, or both answered
# differently.
EXTREME_EXPECTED_DIVERGENCE: dict[str, str] = {}

# Timestamp-extremes mode: every non-key timestamp cycles through
# calendar and epoch edge cases — epoch zero, one microsecond past it,
# deep pre-1970 (negative epoch), year 0001 and 9999 (proleptic-
# Gregorian far range), the 32-bit 2038 rollover second, a leap day,
# and a sub-second-precision value. Probes: integer division of epoch
# micros on NEGATIVE values (DIV truncates toward zero, floor-division
# rounds down — off-by-one buckets pre-1970), sequence()/gapfill spines
# over absurd spans, year/month arithmetic far from the modern range,
# and microsecond round-tripping. Uses the extreme-mode both-reject
# contract: engines consistently rejecting an absurd span is parity.
TIMES_EXPECTED_DIVERGENCE: dict[str, str] = {}

# Seeded-random fuzz mode (--rand, optionally --seed=N): every non-key
# column drawn from a seeded hash of (seed, table, column, row) — finite,
# micro-exact doubles across ±1e6 plus a 1/16 wide-band/boundary slice
# (finite 9e9..9e15 magnitudes, exact band edges, micro-.5 halfway
# points — the three-band device and dround domains; round 6 addition),
# mixed-sign integers, random short
# token strings (incl. empty), millisecond-precision timestamps across
# 1990-2005, randomized vectors — with ~25% NULLs interleaved. Both
# engines rejecting an input identically-in-kind counts as parity (a
# wide draw can hit a legitimate reject line, e.g. INT casts). The
# structured modes each isolate ONE adversarial axis; this mode probes
# the INTERACTIONS (SQLancer-style differential fuzzing: random data,
# two engines, any disagreement is a bug in one of them). Different
# seeds draw different tables, so reruns with fresh seeds keep probing.
RAND_EXPECTED_DIVERGENCE: dict[str, str] = {}

_RAND_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "λämbda", "mu", "nu", "xi", "ömicron", "pi",
]


def _rand_value(dtype, r: int):
    """Deterministic pseudo-random value for ``dtype`` from hash draw ``r``.

    Domains are wide but SANE (finite doubles that stay micro-exact,
    years 1990-2005): the extreme/times modes own the reject-line edges;
    this generator owns combinatorial interaction coverage.
    """
    import pyspark.sql.types as T

    if isinstance(dtype, (T.LongType, T.IntegerType)):
        return (r % 2_000_001) - 1_000_000
    if isinstance(dtype, T.DoubleType):
        if r % 16 == 7:
            # wide/boundary slice (1/16 of draws): finite magnitudes in
            # the DECIMAL(38,0) wide band (9e9..9e15), its exact edges,
            # and micro-quantization halfway points — the domains the
            # three-band dsum devices and dround own. NaN/Inf stay the
            # extreme mode's property: here every value is finite, so a
            # divergence is a device bug, not a reject-line difference.
            sel = (r // 16) % 8
            m = (r // 128) % 1000 + 1
            return [
                9.0e9 * (1 + m / 1000.0),    # mid band, just above hot
                -(9.0e9 + m * 1.0e7),        # negative mid band
                9.0e12 * (1 + m / 1000.0),   # unit band, above mid bound
                -(9.0e12 + m * 1.0e10),      # negative unit band
                8.9e15 - m * 1.0e9,          # near the wide ceiling
                9.0e9,                       # exact hot/mid edge
                -9.0e12,                     # exact mid/unit edge
                m * 1000 + 0.0000005,        # micro .5 halfway point
            ][sel]
        # milli-precision in ±1e6: micro-unit quantization stays exact
        return ((r % 2_000_000_001) / 1e3) - 1_000_000.0
    if isinstance(dtype, T.StringType):
        n_words = r % 6  # 0 => empty string
        return " ".join(
            _RAND_WORDS[(r // (7 ** (k + 1))) % len(_RAND_WORDS)]
            for k in range(n_words)
        )
    if isinstance(dtype, (T.TimestampNTZType, T.TimestampType)):
        return dt.datetime(1990, 1, 1) + dt.timedelta(
            seconds=r % (16 * 365 * 86400), milliseconds=r % 1000
        )
    if isinstance(dtype, T.ArrayType):
        return [float(((r >> (j % 28)) + j * 2654435761) % 15 - 7) for j in range(64)]
    if isinstance(dtype, T.BinaryType):
        return bytes([(r >> (8 * k)) % 256 for k in range(4)])
    raise ValueError(f"no rand value for {dtype}")

_EXTREME_TIMES = [
    dt.datetime(1970, 1, 1, 0, 0, 0),                 # epoch zero
    dt.datetime(1970, 1, 1, 0, 0, 0, 1),              # +1 microsecond
    dt.datetime(1969, 12, 31, 23, 59, 59, 999999),    # -1 microsecond
    dt.datetime(1901, 2, 3, 4, 5, 6),                 # deep negative epoch
    dt.datetime(1, 1, 1, 0, 0, 0),                    # proleptic floor
    dt.datetime(9999, 12, 31, 23, 59, 59, 999999),    # far ceiling
    dt.datetime(2038, 1, 19, 3, 14, 7),               # 32-bit rollover
    dt.datetime(2000, 2, 29, 12, 30, 15, 250000),     # leap day + sub-second
]

_EXTREME_DOUBLES = [
    float("inf"), float("-inf"), float("nan"), -0.0,
    1.5e308, 5e-324, -2.5e-308, 987654.321,
]
_EXTREME_LONGS = [2**40, -(2**40), 0, 1, -1, 2**31, -(2**31), 42]
_EXTREME_INTS = [2**30, -(2**30), 0, 1, -1, 32767, -32768, 7]
_EXTREME_VECS = [  # float32 range: max finite ~3.4e38
    lambda j: float("inf"),
    lambda j: float("nan"),
    lambda j: float("inf") if j % 2 == 0 else float("-inf"),
    lambda j: -0.0,
    lambda j: 1e38,
    lambda j: float(j % 7),  # a normal vector so top-k isn't all-NaN
]

# Duplicate-key mode: the whitelist is a MAP of which queries rely on a
# key-identity contract (primary-key uniqueness — guaranteed by the
# schemas and by TPC-H's definitions). Under deliberately-corrupt
# duplicate keys each pair diverges exactly where that contract is used;
# documenting the reliance is the point (the r03 sliding-frame bug WAS an
# undocumented uniqueness assumption). Everything not listed here must
# hold parity even on duplicate keys.
_DOC_IDENTITY = (
    "per-document outputs key on doc_id identity (Spark groups the "
    "duplicate ids into one document, the oracle scores each row); "
    "duplicate doc_ids are contract-violating input"
)
_VEC_IDENTITY = (
    "centroid seeding (vec_id < k) and per-vector outputs key on vec_id "
    "identity; duplicate vector ids make 'the first k vectors' ambiguous "
    "and are contract-violating input"
)
DUP_EXPECTED_DIVERGENCE: dict[str, str] = {
    "q_tpch_q13": (
        "the aggregate-before-join rewrite is the standard aggregate-"
        "pushdown-through-PK-join rule: legal because c_custkey is a "
        "primary key (TPC-H contract); under duplicate customers the "
        "spec's join-then-count double-counts per duplicate row instead"
    ),
    "q_llm_fingerprint": _DOC_IDENTITY,
    "q_udf_simhash_arrow": _DOC_IDENTITY,
    "q_llm_kmeans": _VEC_IDENTITY,
    "q_llm_sim_ivf": _VEC_IDENTITY,
    "q_llm_sim_ann_recall": _VEC_IDENTITY,
    "q_llm_dedup_semantic": _VEC_IDENTITY,
    "q_llm_dedup_semantic_arrow": _VEC_IDENTITY,
}


def _synth_value(
    dtype, i: int, ties: bool = False, nasty: bool = False, neg: bool = False,
    extreme: bool = False, times: bool = False,
):
    # (dupkeys mode reuses the default generators; key duplication is
    # handled by the caller passing i // 2 for key columns)
    import pyspark.sql.types as T

    if isinstance(dtype, T.LongType) and extreme:
        return _EXTREME_LONGS[i % len(_EXTREME_LONGS)] + i
    if isinstance(dtype, T.IntegerType) and extreme:
        return _EXTREME_INTS[i % len(_EXTREME_INTS)]
    if isinstance(dtype, (T.LongType, T.IntegerType)):
        if neg:
            return -i
        return 7 if ties else i
    if isinstance(dtype, T.DoubleType):
        if extreme:
            return _EXTREME_DOUBLES[i % len(_EXTREME_DOUBLES)]
        if neg:
            return -(float(i) + 0.5)
        return 3.5 if ties else float(i) + 0.5
    if isinstance(dtype, T.StringType):
        if nasty:
            return NASTY_STRINGS[i % len(NASTY_STRINGS)]
        return "same same same" if ties else f"tok{i} alpha beta"
    if isinstance(dtype, (T.TimestampNTZType, T.TimestampType)):
        if times:
            return _EXTREME_TIMES[i % len(_EXTREME_TIMES)]
        if ties:
            return dt.datetime(1996, 6, 1)
        return dt.datetime(1996, 1, 1) + dt.timedelta(days=i)
    if isinstance(dtype, T.ArrayType):
        if extreme:
            gen = _EXTREME_VECS[i % len(_EXTREME_VECS)]
            return [gen(j) for j in range(64)]
        if neg:
            return [-float((i + j) % 7) for j in range(64)]
        if ties:
            return [1.0] * 64
        return [float((i + j) % 7) for j in range(64)]
    if isinstance(dtype, T.BinaryType):
        return b"\x01\x02" if ties else bytes([i % 256] * 4)
    raise ValueError(f"no synth value for {dtype}")


# --empty=facts|dims: the mixed-cardinality axis. All-empty (n_rows=0)
# probes every query's degenerate case at once, but join interactions
# need ONE side empty with the other populated: an empty dimension under
# a broadcast join, an empty fact under a left join's preserved side, a
# knn probe over zero vectors while documents exist. facts = the big
# tables a filter can fully drain; dims = the small broadcast sides.
EMPTY_GROUPS = {
    "facts": {"lineitem", "orders", "events", "documents", "embeddings"},
    "dims": {"region", "nation", "customer", "supplier", "part"},
}


def plant(
    spark, base: str, n_rows: int,
    ties: bool = False, nasty: bool = False, dupkeys: bool = False,
    neg: bool = False, extreme: bool = False, times: bool = False,
    rand: bool = False, seed: int = 1,
    empty_tables: frozenset[str] = frozenset(),
) -> str:
    """NULL mode: keys dense, non-key columns alternating NULL — the same
    shape as the pytest sweep's [n, True] parametrization (kept in
    lockstep with tests/test_edge_cases.py). Tie mode: keys dense, EVERY
    non-key column constant, so every ORDER BY, arg-extreme, and top-k
    in the registry ties on its whole input. Nasty mode: keys dense, no
    NULLs, every string column cycling through hostile content (RFC-
    breaking quotes/commas, newlines, multi-byte unicode, regex
    metacharacters, leading/trailing whitespace). Dupkeys mode: every
    KEY value appears twice (value columns stay distinct per row) —
    deliberately corrupt identity columns, probing which pairs rely on
    the primary-key contract. Neg mode: keys dense and positive, every
    value number NEGATIVE — math-function domains and sign-dependent
    integer semantics. Extreme mode: keys dense and sane, every value
    number an IEEE-754 edge case or magnitude extreme (see
    _EXTREME_* above) — probing NaN/Inf propagation, -0.0 identity,
    overflow-to-Inf folds, and each engine's reject-vs-answer line."""
    from kse.catalog import SCHEMAS

    if ties:
        mode = "tie"
    elif nasty:
        mode = "nasty"
    elif dupkeys:
        mode = "dup"
    elif neg:
        mode = "neg"
    elif extreme:
        mode = "xtreme"
    elif times:
        mode = "times"
    elif rand:
        mode = f"rand{seed}"
    else:
        mode = "null"
    if empty_tables:
        mode += "_e" + str(len(empty_tables))
    sf_dir = os.path.join(base, f"{mode}_sf_{n_rows}")
    os.makedirs(sf_dir, exist_ok=True)
    key_suffixes = ("key", "_id", "id")
    for name, schema in SCHEMAS.items():
        rows = []
        for i in range(0 if name in empty_tables else n_rows):
            row = []
            for j, f in enumerate(schema.fields):
                is_key = any(f.name.endswith(sfx) for sfx in key_suffixes)
                if dupkeys:
                    row.append(_synth_value(f.dataType, i // 2 if is_key else i))
                elif neg:
                    row.append(
                        _synth_value(f.dataType, i, neg=not is_key)
                    )
                elif extreme:
                    row.append(
                        _synth_value(f.dataType, i, extreme=not is_key)
                    )
                elif times:
                    row.append(_synth_value(f.dataType, i, times=True))
                elif rand and not is_key:
                    import hashlib

                    digest = hashlib.md5(
                        f"{seed}:{name}:{j}:{i}".encode()
                    ).hexdigest()
                    r = int(digest[:15], 16)
                    row.append(None if r % 4 == 0 else _rand_value(f.dataType, r))
                elif rand:
                    row.append(_synth_value(f.dataType, i))
                elif not ties and not nasty and not is_key and (i + j) % 2 == 0:
                    row.append(None)
                else:
                    row.append(
                        _synth_value(f.dataType, i, ties and not is_key, nasty)
                    )
            rows.append(tuple(row))
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return sf_dir


def main() -> int:
    import check  # tools/check.py — same directory

    from kse import registry
    from kse.session import get_session

    args = [a for a in sys.argv[1:]]
    ties = "--ties" in args
    nasty = "--nasty" in args
    dupkeys = "--dupkeys" in args
    neg = "--neg" in args
    extreme = "--extreme" in args
    times = "--times" in args
    rand = "--rand" in args
    seed = 1
    empty_tables: frozenset[str] = frozenset()
    for a in args:
        if a.startswith("--seed="):
            seed = int(a.split("=", 1)[1])
        if a.startswith("--empty="):
            spec = a.split("=", 1)[1]
            empty_tables = frozenset(
                EMPTY_GROUPS.get(spec, set(spec.split(",")))
            )
    args = [a for a in args if not a.startswith("--")]
    # non-numeric positional args filter the run to named queries
    # (triage loops: `... --times q_ts_gapfill q_fn_date`)
    only = {a for a in args if not a.isdigit()}
    args = [a for a in args if a.isdigit()]
    n_rows = int(args[0]) if args else 8
    if ties:
        expected = TIE_EXPECTED_DIVERGENCE
    elif nasty:
        expected = NASTY_EXPECTED_DIVERGENCE
    elif dupkeys:
        expected = DUP_EXPECTED_DIVERGENCE
    elif neg:
        expected = NEG_EXPECTED_DIVERGENCE
    elif extreme:
        expected = EXTREME_EXPECTED_DIVERGENCE
    elif times:
        expected = TIMES_EXPECTED_DIVERGENCE
    elif rand:
        expected = RAND_EXPECTED_DIVERGENCE
    else:
        expected = EXPECTED_DIVERGENCE
    spark = get_session("kse-null-parity")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="kse-null-parity-")
    try:
        sf_dir = plant(
            spark, base, n_rows, ties, nasty, dupkeys, neg, extreme, times,
            rand, seed, empty_tables,
        )
        con = check.duck_connect(sf_dir)
        qs = registry.all_queries()
        unexpected, stale, n_pass, n_skip, n_both_reject = [], [], 0, 0, 0
        for name, q in qs.items():
            if only and name not in only:
                continue
            if q.oracle is None and q.check_oracle is None:
                n_skip += 1
                continue
            oracle = q.oracle or q.check_oracle
            if extreme or times or rand:
                # extreme/times/rand contract: both engines rejecting the
                # input identically-in-kind (each raises) is parity —
                # under rand, a wide-band draw can legitimately hit a
                # reject line (e.g. an INT cast of a 1e13 quantity throws
                # on both engines); a ONE-sided throw is still a failure
                s_exc = d_exc = None
                spark_pdf = duck_pdf = None
                try:
                    spark_pdf = q.fn(spark, sf_dir).toPandas()
                except Exception as exc:  # noqa: BLE001
                    s_exc = f"{type(exc).__name__}: {str(exc)[:120]}"
                try:
                    duck_pdf = con.execute(oracle).df()
                except Exception as exc:  # noqa: BLE001
                    d_exc = f"{type(exc).__name__}: {str(exc)[:120]}"
                if s_exc and d_exc:
                    print(f"OK(both-reject)  {name}: spark={s_exc.split(':')[0]} duck={d_exc.split(':')[0]}")
                    n_both_reject += 1
                    errs = []
                elif s_exc or d_exc:
                    errs = [f"one-side throw: spark={s_exc!r} duck={d_exc!r}"]
                elif q.oracle is not None:
                    errs = check.compare(spark_pdf, duck_pdf)
                else:
                    errs = check.compare_tol(
                        spark_pdf, duck_pdf, q.check_rel_tol or 0.01
                    )
            else:
                try:
                    spark_pdf = q.fn(spark, sf_dir).toPandas()
                    duck_pdf = con.execute(oracle).df()
                    if q.oracle is not None:
                        errs = check.compare(spark_pdf, duck_pdf)
                    else:
                        errs = check.compare_tol(
                            spark_pdf, duck_pdf, q.check_rel_tol or 0.01
                        )
                except Exception as exc:  # noqa: BLE001 — report, don't abort
                    errs = [f"{type(exc).__name__}: {str(exc)[:120]}"]
            diverged = bool(errs)
            if diverged and name not in expected:
                unexpected.append((name, errs[:3]))
                print(f"FAIL  {name}: {errs[:3]}")
            elif not diverged and name in expected:
                stale.append(name)
                print(f"STALE WHITELIST  {name}: now passes — remove the entry")
            elif diverged:
                print(f"OK(whitelisted)  {name}")
                n_pass += 1
            else:
                n_pass += 1
        mode_name = (
            "tie" if ties else "nasty" if nasty else "dup" if dupkeys
            else "neg" if neg else "xtreme" if extreme
            else "times" if times else f"rand(seed={seed})" if rand else "null"
        )
        extra = f", {n_both_reject} both-reject" if (extreme or times or rand) else ""
        print(
            f"\n== {mode_name}-parity: "
            f"{n_pass} ok, {len(unexpected)} unexpected "
            f"divergences, {len(stale)} stale whitelist entries, "
            f"{n_skip} rows-only skipped{extra} =="
        )
        return 1 if (unexpected or stale) else 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
        from kse import catalog

        catalog._RELATION_CACHE.clear()
        registry.invalidate_plans(None, spark)


if __name__ == "__main__":
    sys.exit(main())
