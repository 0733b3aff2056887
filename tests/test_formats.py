"""Batch source/sink format coverage (SURVEY.md §2.1): the engine's tables
survive round trips through the interchange formats a pipeline actually
ingests — JSON lines (the Kafka payload image), CSV, and ORC — with the
catalog's declared schema applied on read (schema-on-read is explicit,
never inferred; SURVEY.md §1.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kse.catalog import SCHEMAS, load

from .conftest import SF_SMOKE


def _docs(spark):
    return load(spark, SF_SMOKE, "documents")


def _assert_same_rows(a_df, b_df, key="doc_id"):
    a = {r[key]: r.asDict() for r in a_df.collect()}
    b = {r[key]: r.asDict() for r in b_df.collect()}
    assert a == b


def test_jsonl_round_trip_with_declared_schema(spark, tmp_path):
    out = str(tmp_path / "docs_json")
    _docs(spark).write.mode("overwrite").json(out)
    back = spark.read.schema(SCHEMAS["documents"]).json(out)
    assert back.schema == SCHEMAS["documents"]
    _assert_same_rows(_docs(spark), back)


def test_csv_round_trip_with_declared_schema(spark, tmp_path):
    out = str(tmp_path / "docs_csv")
    # documents.text contains no commas/newlines in testdata, but quote
    # anyway — a real corpus needs it
    _docs(spark).write.mode("overwrite").option("header", True).option(
        "quoteAll", True
    ).csv(out)
    back = spark.read.schema(SCHEMAS["documents"]).option("header", True).csv(out)
    assert back.schema == SCHEMAS["documents"]
    _assert_same_rows(_docs(spark), back)


def test_orc_round_trip(spark, tmp_path):
    out = str(tmp_path / "events_orc")
    ev = load(spark, SF_SMOKE, "events")
    ev.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert {f.name: f.dataType.simpleString() for f in back.schema} == {
        f.name: f.dataType.simpleString() for f in ev.schema
    }
    a = ev.agg(F.count("*"), F.sum("value"), F.max("ts")).collect()[0]
    b = back.agg(F.count("*"), F.sum("value"), F.max("ts")).collect()[0]
    assert tuple(a) == tuple(b)


def test_src_csv_jsonl_sources_match_parquet(spark):
    """The registered CSV/JSONL ingest edges round-trip the catalog tables
    bit-exactly, including doubles through shortest-repr JSON."""
    from kse.queries.relational import src_csv, src_jsonl

    nation = {tuple(r) for r in load(spark, SF_SMOKE, "nation").collect()}
    got_csv = {tuple(r) for r in src_csv(spark, SF_SMOKE).collect()}
    assert got_csv == nation

    sup = {
        tuple(r)
        for r in load(spark, SF_SMOKE, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .collect()
    }
    got_jsonl = {tuple(r) for r in src_jsonl(spark, SF_SMOKE).collect()}
    assert got_jsonl == sup
