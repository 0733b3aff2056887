"""Degenerate-input robustness: every pipeline operator must plan and
execute over EMPTY and near-empty tables without raising — the shapes a
partitioned 100 TB run actually produces (empty partitions, a filter
that eliminates a whole source, a first incremental batch with three
rows)."""

from __future__ import annotations

import pandas as pd
import pytest


def _plant(tmp_path, n_docs: int, n_vecs: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = tmp_path / f"edge_sf_{n_docs}_{n_vecs}"
    sf_dir.mkdir()
    # explicit schemas: empty list-columns otherwise infer as plain double
    doc_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(n_docs)),
                "text": [f"alpha beta gamma delta epsilon w{i}" for i in range(n_docs)],
                "lang": ["en"] * n_docs,
                "source": ["src0"] * n_docs,
                "n_chars": [34] * n_docs,
            },
            schema=doc_schema,
        ),
        sf_dir / "documents.parquet",
    )
    vec_schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": list(range(n_vecs)),
                "embedding": [[float(i % 7) / 7.0] * 64 for i in range(n_vecs)],
                "label": [i % 3 for i in range(n_vecs)],
            },
            schema=vec_schema,
        ),
        sf_dir / "embeddings.parquet",
    )
    return str(sf_dir)


_DOC_OPS = [
    "q_llm_dedup_exact",
    "q_llm_dedup_minhash",
    "q_llm_dedup_simhash",
    "q_llm_dedup_cluster",
    "q_llm_dedup_url",
    "q_llm_domain_cap",
    "q_llm_containment",
    "q_llm_chunk",
    "q_llm_length_filter",
    "q_llm_text_stats",
    "q_llm_quality_filter",
]
_VEC_OPS = ["q_llm_kmeans", "q_llm_sim_knn", "q_llm_embed_stats"]


@pytest.mark.parametrize("n_docs,n_vecs", [(0, 0), (1, 1), (3, 3)])
def test_pipeline_ops_survive_degenerate_inputs(spark, tmp_path, n_docs, n_vecs):
    from kse import catalog, registry

    sf_dir = _plant(tmp_path, n_docs, n_vecs)
    qs = registry.all_queries()
    try:
        for name in _DOC_OPS + _VEC_OPS:
            rows = qs[name].fn(spark, sf_dir).collect()
            assert isinstance(rows, list)  # executed without raising
            if n_docs == 0:
                # nothing fabricated from nothing
                if name in _DOC_OPS:
                    assert len(rows) == 0 or name in ("q_llm_text_stats",)
    finally:
        for tbl in ("documents", "embeddings"):
            catalog._RELATION_CACHE.pop((id(spark), sf_dir, tbl), None)
        registry.invalidate_plans(sf_dir, spark)


def _synth_value(dtype, i: int):
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    if isinstance(dtype, (T.IntegerType,)):
        return i
    if isinstance(dtype, T.LongType):
        return i
    if isinstance(dtype, T.DoubleType):
        return float(i) + 0.5
    if isinstance(dtype, T.StringType):
        return f"tok{i} alpha beta"
    if isinstance(dtype, (T.TimestampNTZType, T.TimestampType)):
        return datetime(2024, 1, 1) + timedelta(minutes=i)
    if isinstance(dtype, T.ArrayType):
        return [float(i + 1) / 7.0] * 64
    raise AssertionError(f"unhandled type {dtype}")


def _plant_full(tmp_path, spark, n_rows: int, nulls: bool = False) -> str:
    from kse.catalog import SCHEMAS

    sf_dir = tmp_path / f"edge_full_{n_rows}_{int(nulls)}"
    sf_dir.mkdir()
    key_suffixes = ("key", "_id", "id")
    for name, schema in SCHEMAS.items():
        rows = []
        for i in range(n_rows):
            row = []
            for j, f in enumerate(schema.fields):
                is_key = any(f.name.endswith(sfx) for sfx in key_suffixes)
                if nulls and not is_key and (i + j) % 2 == 0:
                    row.append(None)
                else:
                    row.append(_synth_value(f.dataType, i))
            rows.append(tuple(row))
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(sf_dir / f"{name}.parquet"))
    return str(sf_dir)


@pytest.mark.parametrize("n_rows,nulls", [(0, False), (3, False), (4, True)])
def test_every_registered_query_survives_tiny_tables(spark, tmp_path, n_rows, nulls):
    """The whole registry must plan and execute on 0-row, 3-row, and
    NULL-riddled versions of every catalog table (keys non-null, every
    value column alternating NULL): empty partitions, empty groups,
    empty graphs, single-element frames, NULL payloads — the shapes any
    incremental or heavily-filtered 100 TB run produces. Found real
    bugs on first runs: zero-norm cosine divide-by-zero, and six Python
    UDF/mapInPandas sites that crashed on None where JVM expressions
    would have null-propagated."""
    from kse import catalog, registry

    sf_dir = _plant_full(tmp_path, spark, n_rows, nulls)
    failures = []
    try:
        for name, q in registry.all_queries().items():
            try:
                rows = q.fn(spark, sf_dir).collect()
                assert isinstance(rows, list)
            except Exception as exc:  # noqa: BLE001 — collecting a report
                failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:160]}")
    finally:
        for tbl in catalog.SCHEMAS:
            catalog._RELATION_CACHE.pop((id(spark), sf_dir, tbl), None)
        registry.invalidate_plans(sf_dir, spark)
    assert not failures, "\n".join(failures)


def test_file_sources_roundtrip_adversarial_strings(spark, tmp_path):
    """The CSV/JSONL ingest edges must round-trip RFC-hostile content:
    commas, embedded quotes, embedded NEWLINES (which silently split
    rows without multiLine — a real bug this test caught), backslashes,
    tabs, and non-ASCII. Compared field-for-field against the parquet
    source."""
    import pandas as pd

    from kse import catalog
    from kse.catalog import load
    from kse.queries.relational import src_csv, src_jsonl

    nasty = [
        "plain value",
        "comma, inside",
        'quote " inside',
        "embedded\nnewline",
        "backslash \\ and tab\t",
        "unicode 汉字 éü",
    ]
    sf_dir = tmp_path / "nasty_sf"
    sf_dir.mkdir()
    pd.DataFrame(
        {
            "n_nationkey": pd.array(range(6), dtype="int32"),
            "n_name": nasty,
            "n_regionkey": pd.array([0, 1, 2, 3, 4, 0], dtype="int32"),
        }
    ).to_parquet(sf_dir / "nation.parquet", index=False)
    pd.DataFrame(
        {
            "s_suppkey": pd.array(range(6), dtype="int64"),
            "s_name": nasty,
            "s_nationkey": pd.array(range(6), dtype="int32"),
            "s_acctbal": [1.5, -2.25, 0.0, 1e-7, 12345.678901234567, -0.1],
        }
    ).to_parquet(sf_dir / "supplier.parquet", index=False)
    sf = str(sf_dir)
    try:
        nat = {tuple(r) for r in load(spark, sf, "nation").collect()}
        assert {tuple(r) for r in src_csv(spark, sf).collect()} == nat
        sup = {
            tuple(r)
            for r in load(spark, sf, "supplier")
            .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
            .collect()
        }
        assert {tuple(r) for r in src_jsonl(spark, sf).collect()} == sup
    finally:
        for tbl in ("nation", "supplier"):
            catalog._RELATION_CACHE.pop((id(spark), sf, tbl), None)


def test_gapfill_guards_corrupt_time_spans(spark, tmp_path):
    """One corrupt far-future (or ancient) timestamp must not OOM the
    data-derived hourly spine: the year-1..9999 span below killed the
    JVM before the guard existed (reproduced), and an equal-branch
    if(assert_true(...)) version of the guard was silently constant-
    folded away — this test pins the raise_error form that survives
    Catalyst and fails in seconds with the clamp instruction."""
    import datetime as dt

    from kse.catalog import SCHEMAS
    from kse.queries.extras import q_ts_gapfill

    sf_dir = tmp_path / "corrupt_ts"
    sf_dir.mkdir()
    rows = [
        (0, dt.datetime(1, 1, 1), 0, "click", 1.0, "{}"),
        (1, dt.datetime(9999, 12, 31), 1, "view", 2.0, "{}"),
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(sf_dir / "events.parquet")
    )
    with pytest.raises(Exception, match="gapfill spine"):
        q_ts_gapfill(spark, str(sf_dir)).collect()


def test_gapfill_all_null_ts_yields_empty_spine(spark, tmp_path):
    """All-NULL ts (empty-after-filter / late-arriving batches, the
    degenerate-input contract) must yield an EMPTY spine, not trip the
    corrupt-span guard: timestampdiff(HOUR, NULL, NULL) is NULL, and
    without an explicit NULL branch the CASE fell through to
    raise_error with a misleading 'corrupt timestamp' message. The
    DuckDB oracle returns zero rows here; so must we."""
    import datetime as dt  # noqa: F401

    from kse.catalog import SCHEMAS
    from kse.queries.extras import q_ts_gapfill

    sf_dir = tmp_path / "all_null_ts"
    sf_dir.mkdir()
    rows = [(0, None, 0, "click", 1.0, "{}"), (1, None, 1, "view", 2.0, "{}")]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(sf_dir / "events.parquet")
    )
    assert q_ts_gapfill(spark, str(sf_dir)).count() == 0


def test_ewma_null_ts_fold_order_aligned_across_all_three(spark, tmp_path):
    """Multi-row users with NULL timestamps — the one shape NO parity
    battery reaches (user_id is a dense key in every planted table, so
    per-user windows only ever see single-row partitions there). The
    three EWMA implementations must fold in the SAME order for NULL ts:
    Spark's array_sort struct comparator puts NULL fields FIRST
    (measured — note aggregate min/max order NULL struct fields LAST,
    so this is not derivable from one observation), pandas defaults
    NaN LAST, and the engines' window defaults disagree; all three are
    pinned to NULLS FIRST, tie-broken by event_id."""
    import datetime as dt
    import os
    import sys

    from kse.catalog import SCHEMAS
    from kse.queries.extras import q_ts_ewma, q_ts_ewma_pandas, _EWMA_ORACLE

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    import check

    sf_dir = tmp_path / "null_ts_multirow"
    sf_dir.mkdir()
    t0 = dt.datetime(2024, 1, 1)
    rows = [  # user 7: two NULL-ts rows interleaved with real ones
        (1, None, 7, "click", 10.0, "{}"),
        (2, t0, 7, "view", 20.0, "{}"),
        (3, dt.datetime(2024, 1, 2), 7, "click", 30.0, "{}"),
        (4, None, 7, "view", 40.0, "{}"),
        (5, t0, 8, "click", 50.0, "{}"),
        (6, None, 8, "view", None, "{}"),
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(sf_dir / "events.parquet")
    )
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    jvm = q_ts_ewma(spark, str(sf_dir)).toPandas()
    pan = q_ts_ewma_pandas(spark, str(sf_dir)).toPandas()
    duck = con.execute(_EWMA_ORACLE).df()
    assert not check.compare(jvm, duck), check.compare(jvm, duck)
    assert not check.compare(pan, duck), check.compare(pan, duck)


def test_grouping_sets_emit_grand_total_on_empty_input(spark, tmp_path):
    """SQL-standard (): GROUPING SETS/ROLLUP/CUBE over an EMPTY relation
    still emit the empty grouping set's row — GROUP BY () is a global
    aggregate, and a global aggregate over zero rows is one row (count 0,
    NULL sums). DuckDB and Postgres do; Spark's Expand-based plan returns
    zero rows (zero-row parity battery find, round 6). The
    grand_total_if_empty guard appends the fully-determined () row; this
    pin asserts both legs: exactly one all-NULL-keys row on empty input,
    and NO phantom extra row on non-empty input."""
    from kse.catalog import SCHEMAS
    from kse.queries.relational import (
        q_agg_cube,
        q_agg_grouping_sets,
        q_agg_rollup,
        q_agg_sketch_merge_exact,
    )

    sf_dir = tmp_path / "gs_empty"
    sf_dir.mkdir()
    for name in ("orders", "lineitem", "events"):
        spark.createDataFrame([], SCHEMAS[name]).write.parquet(
            str(sf_dir / f"{name}.parquet")
        )

    gs = q_agg_grouping_sets(spark, str(sf_dir)).collect()
    assert len(gs) == 1
    assert (gs[0]["o_orderstatus"], gs[0]["o_orderpriority"]) == (None, None)
    assert (gs[0]["g_status"], gs[0]["g_prio"], gs[0]["n"]) == (1, 1, 0)
    assert gs[0]["sum_price"] is None

    ru = q_agg_rollup(spark, str(sf_dir)).collect()
    assert len(ru) == 1
    assert (ru[0]["g_flag"], ru[0]["g_status"], ru[0]["n"]) == (1, 1, 0)
    assert ru[0]["sum_qty"] is None

    cu = q_agg_cube(spark, str(sf_dir)).collect()
    assert len(cu) == 1 and cu[0]["n"] == 0 and cu[0]["sum_price"] is None

    sm = q_agg_sketch_merge_exact(spark, str(sf_dir)).collect()
    assert len(sm) == 1
    assert (sm[0]["scope"], sm[0]["n_users"]) == ("__all__", 0)

    # non-empty leg: the guard row must filter away (3 orders rows ->
    # cube over 2 distinct statuses x 2 priorities has no extra NULL row
    # beyond the genuine subtotal ones; total row count pins exactness)
    import datetime as dt

    sf2 = tmp_path / "gs_nonempty"
    sf2.mkdir()
    orows = [
        (1, 1, "O", 10.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        (2, 2, "F", 20.0, dt.datetime(2024, 1, 2), "1-URGENT"),
        (3, 3, "O", 30.0, dt.datetime(2024, 1, 3), "2-HIGH"),
    ]
    spark.createDataFrame(orows, SCHEMAS["orders"]).write.parquet(
        str(sf2 / "orders.parquet")
    )
    cu2 = q_agg_cube(spark, str(sf2)).collect()
    # groups: (O,1U) (F,1U) (O,2H) + rollups (O,·)(F,·)(·,1U)(·,2H) + (·,·)
    assert len(cu2) == 8
    totals = [r for r in cu2 if r["o_orderstatus"] is None and r["o_orderpriority"] is None]
    assert len(totals) == 1 and totals[0]["n"] == 3
