"""Streaming sources (SURVEY.md §2.1 / §2.9).

The reference pipeline reads a Kafka topic of JSON events
(sekaiamber/KSE-Sample — reconstructed [R], SURVEY.md §0.1; mount empty at
survey time). Here every source yields the SAME event schema so the rest of
the pipeline is source-agnostic:

    event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
    event_type STRING, value DOUBLE, props STRING(JSON)

- ``kafka_events``: the production source. Requires the
  spark-sql-kafka package on the cluster (NOT present in this container —
  verified; gated behind an option, code-complete).
- ``file_events``: test/offline stand-in — a directory of JSON/parquet
  chunks replayed in order; with ``availableNow`` triggers this gives
  deterministic micro-batches.
- ``rate_events``: synthetic load generator mapped onto the event schema
  (the batch twin is src_producer in kse/queries/relational.py).

Explicit schemas everywhere: a stream never infers (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# the JSON payload schema inside props — {"k": int} per FIXTURES.md
PROPS_SCHEMA = "k INT"


def kafka_events(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source → event-schema stream.

    Wire schema is Kafka's (key/value binary, topic, partition, offset,
    timestamp); the JSON value is parsed with the explicit EVENT_SCHEMA.
    Scale: source parallelism = topic partitions; size the topic at
    ~2-3x executor cores. minPartitions can oversubscribe if consumers
    outnumber partitions.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e"),
        F.col("timestamp").alias("kafka_ts"),
    )
    return parsed.select("e.*")


def file_events(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "json",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-source stand-in for Kafka (deterministic replay in tests).

    Each file dropped into ``path`` becomes (part of) a micro-batch;
    ``maxFilesPerTrigger=1`` + chronologically-named chunks reproduce an
    ordered stream. Pass ``max_files_per_trigger=None`` to drain the whole
    directory in one batch (throughput benchmarking — per-trigger overhead
    would otherwise dominate)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "json":
        return reader.json(path)
    if fmt == "parquet":
        return reader.parquet(path)
    raise ValueError(f"unsupported stream format {fmt!r}")


def rate_events(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Rate source mapped to the event schema — synthetic benchmark load."""
    types = F.array(*[F.lit(s) for s in ["click", "view", "purchase", "signup", "error"]])
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 100).alias("user_id"),
        F.element_at(types, (F.col("value") % 5).cast("int") + 1).alias("event_type"),
        ((F.col("value") * 37 % 1000).cast("double") / 100.0).alias("value"),
        F.concat(F.lit('{"k": '), (F.col("value") % 100).cast("string"), F.lit("}")).alias(
            "props"
        ),
    )


def parse_props(events: DataFrame) -> DataFrame:
    """The core KSE transform: JSON payload → typed column (explicit
    schema, never inferred — works identically on batch and stream)."""
    return events.withColumn("k", F.from_json("props", PROPS_SCHEMA)["k"])
