"""Custom stateful streaming operators (SURVEY.md §2.9 st_stateful_custom).

``applyInPandasWithState``: per-key arbitrary state with timeout-driven
eviction — the escape hatch when built-in windows can't express the
semantics. State lives in the executor-local state store (RocksDB/HDFS
backed on a cluster), checkpointed for exactly-once; each key's state must
fit in memory, which holds for per-user profiles at any corpus size.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_type string"
_STATE_SCHEMA = "n bigint, total double, last string"


def _whole_group(pdfs: Iterable[pd.DataFrame]) -> pd.DataFrame:
    """Materialize a key's micro-batch as ONE event-time-ordered frame.

    A group's rows within a micro-batch can arrive split across multiple
    Arrow chunks (``spark.sql.execution.arrow.maxRecordsPerBatch``) in
    arbitrary chunk order, so sorting each chunk independently does NOT give
    event-time order across the batch. Memory is already bounded by the
    micro-batch, so concatenating before the fold is safe and restores the
    ordering guarantee the folds below rely on.
    """
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return pd.DataFrame(columns=["ts", "event_id", "user_id", "event_type", "value"])
    whole = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
    return whole.sort_values(["ts", "event_id"])


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user profile: event count, value total, last event type.

    Emits the updated profile once per micro-batch per active key — the
    'user state table' the reference's ES index effectively materializes.
    """
    n, total, last = state.get if state.exists else (0, 0.0, None)
    pdf = _whole_group(pdfs)
    n += len(pdf)
    total += float(pdf["value"].sum())
    if len(pdf):
        last = str(pdf["event_type"].iloc[-1])
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_type": [last],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Stateful per-user running profile over the event stream."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_SCHEMA = "user_id bigint, stage int, converted boolean"
_FUNNEL_STATE = "stage int"
_FUNNEL_STEPS = ["click", "view", "purchase"]


def _update_funnel(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Streaming funnel state machine: per-user progress through
    click → view → purchase (gaps allowed), advanced event by event in
    event-time order within each micro-batch. State is ONE int per user
    (the stage reached) — constant-size regardless of stream length, and
    the streaming twin of the batch q_win_funnel: both report whether the
    ordered subsequence has been completed."""
    (stage,) = state.get if state.exists else (0,)
    for etype in _whole_group(pdfs)["event_type"]:
        if stage < len(_FUNNEL_STEPS) and etype == _FUNNEL_STEPS[stage]:
            stage += 1
    state.update((stage,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "stage": [stage],
            "converted": [stage >= len(_FUNNEL_STEPS)],
        }
    )


def funnel_progress(events: DataFrame) -> DataFrame:
    """Stateful per-user funnel progression over the event stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_SCHEMA = "user_id bigint, n_events bigint, ewma double"
_EWMA_STATE = "n bigint, acc double"
_EWMA_ALPHA = 0.3


def _update_ewma(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Streaming EWMA per user — the stateful twin of the batch
    ``q_ts_ewma``: the fold `0.7*acc + 0.3*v` continues across
    micro-batches from two numbers of state (count + current accumulator),
    so an unbounded stream needs constant per-user memory. Same literal
    arithmetic as the batch op and its oracle, so all three agree
    bit-for-bit on ordered input."""
    n, acc = state.get if state.exists else (0, None)
    for v in _whole_group(pdfs)["value"]:
        acc = v if acc is None else (1 - _EWMA_ALPHA) * acc + _EWMA_ALPHA * v
        n += 1
    state.update((n, acc))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ewma": [acc]})


def ewma_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user EWMA over the event stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TTL_SCHEMA = "user_id bigint, n_events bigint, expired boolean"
_TTL_STATE = "n bigint"


def _update_with_ttl(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user event counting with EVENT-TIME state eviction: when the
    watermark passes a user's timeout, the state is emitted once as
    ``expired`` and removed — the mechanism that keeps total state bounded
    by the ACTIVE population at 100 TB instead of growing with every user
    ever seen. Timeout = watermark + 1 minute of event time."""
    if state.hasTimedOut:
        (n,) = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "expired": [True]})
        return
    (n,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 60_000)
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "expired": [False]})


def counts_with_ttl(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Stateful per-user counts whose state expires via event-time TTL."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_with_ttl,
            outputStructType=TTL_SCHEMA,
            stateStructType=_TTL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas — the successor API (SPARK-49770):
# named state variables (value/list/map), TTL, timers, and schema evolution,
# backed by the RocksDB state store. Same operator semantics as
# user_profiles above, so the test suite asserts both APIs agree.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class ProfileProcessor(StatefulProcessor):
    """Running per-user profile as a StatefulProcessor.

    One ValueState row per user — fixed-size state regardless of stream
    length, mergeable across restarts via the checkpointed store. At 100 TB
    of events the state is bounded by |distinct users|, and a TTL
    (``ttlDurationMs``) would cap even that for churning populations.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total, last = self._state.get() if self._state.exists() else (0, 0.0, None)
        pdf = _whole_group(rows)
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = str(pdf["event_type"].iloc[-1])
        self._state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "last_type": [last],
            }
        )

    def close(self) -> None:
        pass


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """Stateful per-user profile via transformWithStateInPandas.

    Requires the RocksDB state store provider (set by the caller/test:
    ``spark.sql.streaming.stateStore.providerClass`` →
    ``...state.RocksDBStateStoreProvider``) — the provider TWS is built on —
    and the ``protobuf`` package in the Python workers (TWS's state protocol
    is protobuf-framed; absent here, so the pytest is importorskip-gated,
    while ``user_profiles`` above covers the same semantics on the
    always-available applyInPandasWithState API).
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        ProfileProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
