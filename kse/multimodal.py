"""Multimodal ingestion (SURVEY.md §2.10 q_llm_multimodal's source half).

``binaryFile`` is Spark's built-in format for opaque media blobs: each file
becomes a row ``(path, modificationTime, length, content: binary)`` with
the bytes read lazily on executors — at 100 TB the pattern is either this
(many small media files) or parquet binary columns (pre-packed shards,
fewer files, the better layout). ``pathGlobFilter`` prunes by extension at
listing time; ``spark.sql.files.maxPartitionBytes`` has no effect here
(one file = one row) so small-file pressure is handled by compaction into
parquet — ``pack_to_parquet`` below.

The decode stage is a ``mapInPandas`` Arrow pass with a deterministic fake
decoder (media codecs are not installed in this container — SURVEY.md
§2.10); the schema, batch shape and partitioning are production-real, and
a real implementation only swaps the body of ``_decode_batch``.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = "path string, n_bytes bigint, mime string, width int, height int, checksum bigint"


def read_binary_dir(spark: SparkSession, path: str, *, glob: str = "*") -> DataFrame:
    """Load a directory of media files as (path, length, content) rows."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "length", "content")
    )


def _sniff_mime(payload: bytes) -> str:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    return "application/octet-stream"


def _decode_batch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode — replace with PIL/ffmpeg on a cluster.

    Magic-byte sniffing is real; width/height are derived from the payload
    deterministically so tests are stable without codecs.
    """
    for pdf in batches:
        content = pdf["content"]
        out = pd.DataFrame(
            {
                "path": pdf["path"],
                "n_bytes": content.map(len).astype("int64"),
                "mime": content.map(_sniff_mime),
                "width": content.map(lambda b: (len(b) % 64) + 16).astype("int32"),
                "height": content.map(lambda b: (sum(b[:16]) % 48) + 12).astype("int32"),
                "checksum": content.map(lambda b: sum(b) % (1 << 31)).astype("int64"),
            }
        )
        yield out


def extract_features(files: DataFrame) -> DataFrame:
    """binaryFile rows -> per-item features via Arrow batches."""
    return files.mapInPandas(_decode_batch, schema=FEATURE_SCHEMA)


def pack_to_parquet(files: DataFrame, out_dir: str, *, partitions: int = 8) -> None:
    """Compact many small media files into parquet binary-column shards —
    the 100 TB antidote to small-file listing pressure. Re-read with
    ``spark.read.parquet`` and feed the same ``extract_features``."""
    files.repartition(partitions).write.mode("overwrite").parquet(out_dir)
