"""In-suite guard for the adversarial-parity bug classes.

tools/null_parity.py runs the FULL registry over four adversarial data
shapes (~5 min per mode); this test keeps a fast representative slice of
it inside the normal pytest loop: the queries whose pairs were actually
fixed by the batteries, compared against their oracles on freshly
planted null / all-ties / hostile-string / numeric-extreme data. A regression in any of
the fixed classes (concat null semantics, pivot zero-fill, CSV/XML/JSON
round-trips, UTF-8 checksums, zero-variance corr, tie-broken argmax,
NULL vectors in k-means) fails here within seconds instead of waiting
for the next full battery run.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import check  # noqa: E402  — tools/check.py
import null_parity  # noqa: E402  — tools/null_parity.py

# the pairs the batteries fixed, grouped by the data shape that broke them
REPRESENTATIVES = {
    "null": [
        "q_agg_collect",        # '' vs NULL for all-NULL collect_set groups
        "q_agg_pivot",          # COUNT cells zero-fill
        "q_agg_boolean",        # None-vs-NaN comparison layer
        "q_fn_array",           # NULL-array position mirror
        "q_fn_to_json",         # explicit JSON nulls
        "q_fn_json",            # try_ parse on malformed props
        "q_llm_dedup_minhash",  # no ''-shingle phantom candidates
        "q_llm_kmeans",         # NULL is not a vector
        "q_llm_dedup_semantic_arrow",  # ragged-ndarray crash class
    ],
    "ties": [
        "q_agg_stats",          # corr must not throw on zero variance
        "q_agg_minmax_by",      # total-order argmax tie-break
        "q_topk_per_group",     # deterministic top-k under ties
    ],
    "nasty": [
        "q_fn_from_csv",        # RFC-quoted round-trip incl. '' vs NULL
        "q_fn_xml",             # element-text whitespace trim mirror
        "q_fn_string",          # concat_ws on both engines
        "q_llm_fingerprint",    # concat_ws degenerate shingles
        "q_llm_multimodal",     # UTF-8 byte-sum checksum
        "src_csv",              # file round-trip with the \\N sentinel
    ],
    # --extreme battery fix classes (r5): the micro-unit sum device must
    # not silently zero NaN / saturate Inf (Spark floor is a saturating
    # java cast), np.round must not overflow where SQL round() doesn't,
    # pandas median skips NaN where DuckDB quantiles count it, and the
    # banded theta join must cover the FP-rounded band boundary
    "extreme": [
        "q_agg_groupby",          # dsum guard: NaN/Inf propagate via plain sum
        "q_agg_distinct",         # distinct micro-sum guard
        "q_agg_pivot",            # FILTER-variant guard
        "q_tpch_q1",              # guarded sum_qty + micro avgs
        "q_win_sliding_frame",    # windowed frame-sum guard
        "q_join_theta_banded",    # 3-band FP-boundary coverage
        "q_udf_pandas_grouped_agg",  # np.round overflow + NaN-skip median
    ],
    # --times battery fix class (r5): dates past year 9999 serialize with
    # an ISO-8601 expanded-year sign in Spark ('+10000-01-30') but not in
    # DuckDB — the engine side strips the sign explicitly
    "times": [
        "q_fn_date",
    ],
    # --rand fuzz battery fix classes (r5): window ORDER BYs must pin
    # NULL placement explicitly (Spark ASC defaults NULLS FIRST, DuckDB
    # NULLS LAST — a NULL sort key silently reorders a lag chain /
    # elects NULL as a tie-broken mode), and corr-from-moments must use
    # SQL corr's pairwise deletion (mask each stddev by the OTHER
    # column's non-nullness)
    "rand": [
        "q_win_pct_change",
        "q_agg_mode",
        "q_agg_stats",
        "q_agg_minmax_by",        # struct-extreme must mask NULL order values
        "q_win_ntile_percent",    # window ORDER BY NULL placement pinned
        "q_llm_dedup_incremental",  # NULL-preserving dedup key
        "q_ts_downsample",        # OHLC close skips NULL values (arg_max)
    ],
}


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """One planted directory per adversarial mode."""
    from kse import catalog, registry

    base = tmp_path_factory.mktemp("adversarial")
    dirs = {
        "null": null_parity.plant(spark, str(base), 6),
        "ties": null_parity.plant(spark, str(base), 6, ties=True),
        "nasty": null_parity.plant(spark, str(base), 6, nasty=True),
        "extreme": null_parity.plant(spark, str(base), 8, extreme=True),
        "times": null_parity.plant(spark, str(base), 8, times=True),
        "rand": null_parity.plant(spark, str(base), 8, rand=True, seed=1),
    }
    yield dirs
    for sf_dir in dirs.values():
        for tbl in catalog.SCHEMAS:
            catalog._RELATION_CACHE.pop((id(spark), sf_dir, tbl), None)
        registry.invalidate_plans(sf_dir, spark)


@pytest.mark.parametrize(
    "mode,name",
    [(m, n) for m, names in REPRESENTATIVES.items() for n in names],
)
def test_pair_holds_adversarial_parity(spark, planted, mode, name):
    from kse import registry

    q = registry.all_queries()[name]
    sf_dir = planted[mode]
    con = check.duck_connect(sf_dir)
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    duck_pdf = con.execute(q.oracle or q.check_oracle).df()
    if q.oracle is not None:
        errs = check.compare(spark_pdf, duck_pdf)
    else:
        errs = check.compare_tol(spark_pdf, duck_pdf, q.check_rel_tol or 0.01)
    assert not errs, f"{name} under {mode} data: {errs}"


@pytest.mark.parametrize("name", ["q_ts_gapfill", "q_sql_recursive"])
def test_corrupt_spine_both_reject(spark, planted, name):
    """Data-derived grids under millennia-wide corrupt timestamps must be
    rejected by BOTH engines (the times-mode both-reject contract): the
    gapfill spine guard (Spark raise_error / DuckDB error() on the same
    200k-bucket test) and the recursive quarter spine's byte-identical
    poison-CAST stop bound. One-sided rejection is the bug class: Spark
    raising while DuckDB silently materializes an 87M-row year-1..9999
    spine (or the reverse: Spark OOMing the executor, reproduced in r4).
    """
    from kse import registry

    q = registry.all_queries()[name]
    sf_dir = planted["times"]
    con = check.duck_connect(sf_dir)
    with pytest.raises(Exception):
        q.fn(spark, sf_dir).toPandas()
    with pytest.raises(Exception):
        con.execute(q.oracle).df()
