"""Twin-equivalence tests: each *_dist / *_scaled scale twin must return
exactly what its canonical operator returns (the twins exist to change
the EXECUTION shape — bounded memory, bucketed parallelism, bounded
candidate sets — never the answer). The adversarial parity batteries
prove the same equivalence against DuckDB on hostile data; these pins
keep the pair glued together in-suite."""

from __future__ import annotations

from kse.queries.llm import (
    q_llm_dedup_simhash_hamming,
    q_llm_dedup_simhash_scaled,
)
from kse.queries.extras import (
    q_agg_pareto,
    q_agg_pareto_dist,
    q_agg_percentile_disc,
    q_agg_winsorize,
    q_agg_winsorize_dist,
)
from kse.queries.relational import (
    q_agg_percentile,
    q_agg_percentile_dist,
    q_agg_percentile_disc_dist,
)
from kse.queries.windows import q_win_ntile_percent, q_win_ntile_percent_dist

from .conftest import SF_SMOKE


def _rows(df, key_cols):
    return sorted(
        (tuple(r[c] for c in df.columns) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t[: len(key_cols)]),
    )


def test_ntile_percent_dist_matches_window_form(spark):
    a = q_win_ntile_percent(spark, SF_SMOKE)
    b = q_win_ntile_percent_dist(spark, SF_SMOKE)
    assert _rows(a, ["o_orderkey"]) == _rows(b, ["o_orderkey"])


def test_percentile_dist_matches_buffering_aggregate(spark):
    a = q_agg_percentile(spark, SF_SMOKE)
    b = q_agg_percentile_dist(spark, SF_SMOKE)
    assert _rows(a, ["l_returnflag"]) == _rows(b, ["l_returnflag"])


def test_percentile_disc_dist_matches_buffering_aggregate(spark):
    a = q_agg_percentile_disc(spark, SF_SMOKE)
    b = q_agg_percentile_disc_dist(spark, SF_SMOKE)
    assert _rows(a, ["l_linestatus"]) == _rows(b, ["l_linestatus"])


def test_pareto_dist_matches_global_window(spark):
    a = q_agg_pareto(spark, SF_SMOKE)
    b = q_agg_pareto_dist(spark, SF_SMOKE)
    assert _rows(a, ["n_top_customers"]) == _rows(b, ["n_top_customers"])


def test_winsorize_dist_matches_buffering_bounds(spark):
    a = q_agg_winsorize(spark, SF_SMOKE)
    b = q_agg_winsorize_dist(spark, SF_SMOKE)
    assert _rows(a, ["event_type"]) == _rows(b, ["event_type"])


def test_simhash_scaled_matches_4x15_pigeonhole(spark):
    a = q_llm_dedup_simhash_hamming(spark, SF_SMOKE)
    b = q_llm_dedup_simhash_scaled(spark, SF_SMOKE)
    assert _rows(a, ["doc_id"]) == _rows(b, ["doc_id"])
