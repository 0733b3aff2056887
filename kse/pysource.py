"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference's ingest edge is a Kafka producer feeding the pipeline
(SURVEY.md §0.1); ``src_producer`` images it as a spark.range expression.
This module images it at the SOURCE layer instead: a pure-Python
``DataSource`` registered under ``format("kse_events")``, showing the
engine can grow new ingest formats without JVM code — the same API a
production deployment would use for a REST paginator, a proprietary blob
layout, or a message-queue snapshot.

Scale posture: ``partitions()`` declares the split set up front, every
partition generates independently on executors (no driver data path), and
rows are emitted as pyarrow RecordBatches (one per partition, vectorized
NumPy generation) — the Arrow fast path through the Python worker.
Generation is pure modular arithmetic on the row id, so the DuckDB oracle
recomputes the identical rows from ``range()``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

SCHEMA = (
    "event_id bigint, ts_us bigint, user_id bigint, "
    "event_type string, value double, props string"
)


class EventsPythonDataSource(DataSource):
    """``spark.read.format("kse_events").option("rows", n).load()``.

    Options: ``rows`` (default 1000), ``partitions`` (default 8).
    """

    @classmethod
    def name(cls) -> str:
        return "kse_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "EventsReader":
        return EventsReader(self.options)

    def simpleStreamReader(self, schema) -> "EventsStreamReader":
        return EventsStreamReader(self.options)


class EventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "8"))

    def partitions(self):
        # contiguous id ranges; the split set is declared up front so the
        # scheduler fans partitions across executors like any file scan
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        import numpy as np
        import pyarrow as pa

        i = partition.value
        lo = self.rows * i // self.n_parts
        hi = self.rows * (i + 1) // self.n_parts
        ids = np.arange(lo, hi, dtype=np.int64)
        types = np.array(EVENT_TYPES)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids),
                pa.array(1704067200_000_000 + ids * 60_000_000),
                pa.array(ids % 97),
                pa.array(types[ids % 5]),
                pa.array((ids * 53 % 1000) / 10.0),
                pa.array(['{"k": %d}' % k for k in ids * 13 % 100]),
            ],
            names=["event_id", "ts_us", "user_id", "event_type", "value", "props"],
        )


def _gen_rows(lo: int, hi: int):
    """The same deterministic generator as the batch reader, row-at-a-time
    (micro-batches are small; the batch path uses vectorized Arrow)."""
    for i in range(lo, hi):
        yield (
            i,
            1704067200_000_000 + i * 60_000_000,
            i % 97,
            EVENT_TYPES[i % 5],
            (i * 53 % 1000) / 10.0,
            '{"k": %d}' % (i * 13 % 100),
        )


class EventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming replay of the same deterministic events — the pure-Python
    Kafka stand-in: each micro-batch advances a single offset cursor by
    ``batch_rows`` until ``rows`` have been emitted, then returns empty
    batches. Offsets are plain dicts checkpointed by the engine, so
    restart recovery and exactly-once accounting come from Structured
    Streaming, exactly as with a Kafka source."""

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", "1000"))
        self.batch = int(options.get("batch_rows", "100"))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.batch, self.rows)
        # materialized list, not a generator: the engine's prefetch cache
        # copies the iterator (generators aren't copyable), and a micro-
        # batch is bounded by batch_rows anyway
        return iter(list(_gen_rows(lo, hi))), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: regenerate the exact range
        return iter(list(_gen_rows(int(start["pos"]), int(end["pos"]))))

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up — generation is stateless


@dataclass
class _JsonlCommit(WriterCommitMessage):
    """One staged part file written by a task."""

    filename: str
    n_rows: int


class JsonlSinkDataSource(DataSource):
    """``df.write.format("kse_jsonl").option("path", dir).save()`` — the
    writer half of the Python DataSource API, mirroring the JSONL index
    sink. Tasks stage part files under uuid names (never overwriting),
    and only the driver-side ``commit`` publishes a ``_MANIFEST`` naming
    the part files of the successful attempt — readers that honor the
    manifest see task retries and aborted jobs atomically, the same
    two-phase contract a real ES/bulk sink gets from idempotent upserts.
    """

    @classmethod
    def name(cls) -> str:
        return "kse_jsonl"

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("kse_jsonl requires .option('path', <dir>)")
        return JsonlWriter(path, [f.name for f in schema.fields])


class JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list[str]) -> None:
        self.path = path
        self.columns = columns

    def write(self, iterator) -> _JsonlCommit:
        # runs on executors, one call per partition; stage under a unique
        # name so speculative/retried tasks never clobber each other
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.columns, row))) + "\n")
                n += 1
        return _JsonlCommit(filename=fname, n_rows=n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest = {
            "files": sorted(m.filename for m in messages if m is not None),
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        # atomic publish: a crash mid-write must never leave a truncated
        # manifest, so stage to a temp name and os.replace() into place
        final = os.path.join(self.path, "_MANIFEST")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


def read_jsonl_sink(path: str) -> list[dict]:
    """Read back a kse_jsonl directory through its manifest (committed
    part files only — staged files from failed attempts are ignored)."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST")) as f:
        manifest = json.load(f)
    rows: list[dict] = []
    for fname in manifest["files"]:
        with open(os.path.join(path, fname)) as f:
            rows.extend(json.loads(line) for line in f)
    return rows


def register_once(spark) -> None:
    """Idempotently register the formats on the given session."""
    if getattr(spark, "_kse_pysource_registered", False):
        return
    spark.dataSource.register(EventsPythonDataSource)
    spark.dataSource.register(JsonlSinkDataSource)
    spark._kse_pysource_registered = True
