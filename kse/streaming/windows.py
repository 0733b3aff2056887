"""Event-time windowed aggregation + watermarks (SURVEY.md §2.9).

These builders take any event-schema DataFrame — batch or streaming — and
return the same logical plan; Structured Streaming incrementalizes it per
micro-batch (the Structured Streaming model: one continuous logical plan,
not a per-window job). State size is bounded by the watermark: windows
older than (max event time - delay) are finalized and evicted.

Scale posture: groupBy(window, key) shuffles on (window, key) — at 100 TB
the key (event_type: 5 values) would be skew-prone alone, but the window
dimension fans it out; for genuinely hot keys add a salt column and
re-aggregate, or let AQE skew-split in batch mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    watermark: str = "15 minutes",
    key: str = "event_type",
) -> DataFrame:
    """Fixed (tumbling) windows per key — the canonical KSE aggregation
    ([R] high conf, SURVEY.md §2.9 st_tumbling)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), key)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
    key: str = "event_type",
) -> DataFrame:
    """Overlapping (sliding) windows: each event lands in window/slide
    windows — state multiplies accordingly, which is why slide should
    divide window and stay coarse at scale."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key,
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "15 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Gap-based session windows per user (st_session): a session closes
    when no event arrives for ``gap``. Merges are handled by the engine's
    session-window state store; the batch twin is q_win_sessionize
    (kse/queries/windows.py) with identical gap semantics."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), key)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key,
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, *, watermark: str = "15 minutes") -> DataFrame:
    """Exactly-once-per-event_id within the watermark horizon
    (st_dedup_stream): state holds one key per seen id and is evicted at
    the watermark — bounded by (arrival rate x watermark delay)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join (join_stream_static): the KSE 'enrich before
    indexing' step. The static side is (re)broadcast per micro-batch —
    keep dims small or snapshot them to a fast store."""
    return events.join(F.broadcast(dim), on, "left")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
    join_key: str = "user_id",
    time_bound: str = "INTERVAL 10 MINUTES",
) -> DataFrame:
    """Stream-stream inner join with watermarks on both sides and a
    time-range condition (join_stream_stream). Both sides buffer state
    bounded by (watermark + time bound); without the time-range condition
    state would grow forever — never ship that.
    """
    l_ = left.alias("l").withWatermark("ts", left_watermark)
    r_ = right.alias("r").withWatermark("ts", right_watermark)
    return l_.join(
        r_,
        F.expr(
            f"l.{join_key} = r.{join_key} AND "
            f"r.ts BETWEEN l.ts - {time_bound} AND l.ts + {time_bound} AND "
            "l.event_id < r.event_id"
        ),
        "inner",
    ).select(
        F.col("l.event_id").alias("left_event_id"),
        F.col("r.event_id").alias("right_event_id"),
        F.col(f"l.{join_key}").alias(join_key),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def stream_stream_left_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
    join_key: str = "user_id",
    time_bound: str = "INTERVAL 10 MINUTES",
) -> DataFrame:
    """Stream-stream LEFT OUTER join (join_stream_stream, outer leg):
    matched pairs emit like the inner form; an unmatched left row emits
    with null right columns only once BOTH watermarks guarantee no match
    can still arrive — i.e. the null verdict is delayed by
    (watermark + time bound), which is the price of it being correct
    rather than provisional. Same bounded state as the inner join; the
    engine's no-data micro-batches flush expired outer state even when
    no new rows arrive."""
    l_ = left.alias("l").withWatermark("ts", left_watermark)
    r_ = right.alias("r").withWatermark("ts", right_watermark)
    return l_.join(
        r_,
        F.expr(
            f"l.{join_key} = r.{join_key} AND "
            f"r.ts BETWEEN l.ts - {time_bound} AND l.ts + {time_bound} AND "
            "l.event_id < r.event_id"
        ),
        "leftOuter",
    ).select(
        F.col("l.event_id").alias("left_event_id"),
        F.col("r.event_id").alias("right_event_id"),
        F.col(f"l.{join_key}").alias(join_key),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def dedup_stream_within_watermark(
    events: DataFrame, *, watermark: str = "15 minutes"
) -> DataFrame:
    """dropDuplicatesWithinWatermark (st_dedup_stream, bounded-horizon
    leg): unlike dropDuplicates — whose state holds every key until
    eviction and whose guarantee silently weakens once a key expires —
    this variant promises exactly: two events with the same id whose
    event times are within the watermark delay of each other dedup to
    one, and state for a key is GUARANTEED droppable once the watermark
    passes its event time + delay. The right tool when ids recycle or
    the at-least-once source only replays within a bounded window."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
