"""Live Kafka / Elasticsearch smoke tests — env-gated activation paths.

This container has no Kafka broker, no spark-sql-kafka jar, and no
Elasticsearch cluster (verified at survey time; SURVEY.md §2.1), so the
production legs of src_kafka and sink_es are exercised through their
deterministic twins (file/Python-DataSource streams, JsonlIndexer).
These tests document — and keep permanently runnable — the LIVE paths:
the day an endpoint exists, set the env var and the same assertions the
twins pass run against the real system. Until then they skip, loudly,
with the activation recipe in the skip reason.

    SPARK_GRAFT_KAFKA=broker1:9092   # needs spark-sql-kafka on the cluster
    SPARK_GRAFT_ES=http://es:9200

No fakes here by design: every assertion talks to the real endpoint.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
import uuid

import pytest
from pyspark.sql import functions as F

KAFKA = os.environ.get("SPARK_GRAFT_KAFKA")
ES = os.environ.get("SPARK_GRAFT_ES")

kafka_required = pytest.mark.skipif(
    not KAFKA,
    reason=(
        "live Kafka path: export SPARK_GRAFT_KAFKA=<bootstrap.servers> on a "
        "cluster with org.apache.spark:spark-sql-kafka-0-10 on the classpath "
        "(no broker/jar in this container — twins in test_streaming.py cover "
        "the semantics)"
    ),
)
es_required = pytest.mark.skipif(
    not ES,
    reason=(
        "live Elasticsearch path: export SPARK_GRAFT_ES=<http://host:9200> "
        "(no cluster/network in this container — the JsonlIndexer twin in "
        "test_streaming.py covers the semantics)"
    ),
)


@kafka_required
def test_kafka_roundtrip_matches_file_source_semantics(spark, tmp_path):
    """Batch-produce events to a fresh topic, stream them back with
    kafka_events, and assert the same schema + row contract the
    file-source twin passes."""
    from kse.streaming.sources import EVENT_SCHEMA, kafka_events

    topic = f"kse-smoke-{uuid.uuid4().hex[:8]}"
    n = 100
    events = spark.range(n).select(
        F.to_json(
            F.struct(
                F.col("id").alias("event_id"),
                F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("id")).alias("ts"),
                (F.col("id") % 7).alias("user_id"),
                F.lit("click").alias("event_type"),
                (F.col("id") * 0.5).alias("value"),
                F.concat(F.lit('{"k": '), F.col("id") % 9, F.lit("}")).alias("props"),
            )
        ).alias("value")
    )
    (
        events.write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("topic", topic)
        .save()
    )

    stream = kafka_events(
        spark, bootstrap_servers=KAFKA, topic=topic, starting_offsets="earliest"
    )
    assert [f.name for f in stream.schema.fields] == [f.name for f in EVENT_SCHEMA.fields]
    q = (
        stream.writeStream.format("memory")
        .queryName(f"kafka_smoke_{topic.replace('-', '_')}")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM kafka_smoke_{topic.replace('-', '_')}")
    assert got.count() == n
    # spot-check one payload survived the JSON round-trip with types intact
    row = got.filter(F.col("event_id") == 3).collect()[0]
    assert row.user_id == 3 and row.event_type == "click" and row.props == '{"k": 3}'


def _es_get(url: str) -> dict:
    with urllib.request.urlopen(url) as resp:
        return json.loads(resp.read())


@es_required
def test_es_bulk_index_roundtrip(spark):
    """Index a small batch through the production EsBulkIndexer (real
    urllib transport) and read it back via _search — the same
    last-write-wins upsert contract the JsonlIndexer twin asserts."""
    from kse.sinks.indexer import EsBulkIndexer, write_batch_to_index

    index = f"kse-smoke-{uuid.uuid4().hex[:8]}"
    idx = EsBulkIndexer(base_url=ES, bulk_size=50)
    df = spark.range(25).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    write_batch_to_index(df, idx, index=index, id_col="doc_id")
    # re-index doc 7 with new content: at-least-once replay must upsert
    df7 = spark.range(7, 8).select(
        F.col("id").alias("doc_id"), F.lit("doc 7 v2").alias("text")
    )
    write_batch_to_index(df7, idx, index=index, id_col="doc_id")

    urllib.request.urlopen(
        urllib.request.Request(f"{ES}/{index}/_refresh", method="POST")
    )
    for _ in range(10):  # refresh is near-sync; retry briefly anyway
        total = _es_get(f"{ES}/{index}/_count")["count"]
        if total == 25:
            break
        time.sleep(1)
    assert total == 25, f"expected 25 docs after upsert, got {total}"
    doc7 = _es_get(f"{ES}/{index}/_doc/7")["_source"]
    assert doc7["text"] == "doc 7 v2"
    urllib.request.urlopen(urllib.request.Request(f"{ES}/{index}", method="DELETE"))
