"""Seeded-random streaming state fuzz (round-7 verdict item: fuzz the
streaming state surface like the batch surface).

Each seed draws a random multi-micro-batch event stream with the three
hazard classes a production Kafka topic actually exhibits:

- **intra-batch disorder** — every chunk's rows are shuffled before the
  write (the watermark only advances at batch boundaries, so arrival
  order inside a micro-batch must not matter);
- **cross-batch out-of-order WITHIN the watermark** — chunk k+1 carries
  events whose timestamps jump back into chunk k's tail, but never past
  the watermark, so they must be absorbed, not dropped;
- **duplicate event_ids** across adjacent chunks (state still alive when
  the duplicate arrives, so dedup must drop it) and **deep-late events**
  far beyond the watermark (state evicted, so every stateful operator
  must drop them).

The oracle is a plain Python batch fold over exactly the rows the
watermark contract says survive — stream result ≡ batch fold, the same
equivalence discipline as the batch side's nine parity modes. The
generator pins each chunk's max timestamp so the watermark trajectory is
deterministic per seed, and keeps every non-deep-late row ≥10 minutes
clear of any eviction boundary so the expected set never depends on
tie-breaking at the watermark edge.
"""

from __future__ import annotations

import datetime as dt
import random
import uuid

import pytest

from kse.streaming import windows as W
from kse.streaming.sources import file_events

from .conftest import ev, write_event_chunk
from .test_streaming import _run_to_memory

ETYPES = ["click", "view", "purchase"]
VALUES = [0.25, 0.5, 1.0, 2.5]  # exact binary fractions: sums hash clean
WM_MIN = 15  # watermark delay (minutes) used by every op under test


def _iso(minutes: float) -> str:
    b = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    return (b + dt.timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%SZ")


def _gen_stream(seed: int):
    """Three 60-minute chunks + hazards. Returns (chunks, kept, dups,
    late): chunks is a list of row-tuple lists (arrival order), kept the
    (eid, minute, user, etype, value) tuples the watermark contract keeps
    (one per unique event), dups the duplicate-id copies (ordinary rows to
    an aggregation, dropped by dedup), and late the deep-late tuples
    every operator must drop."""
    rng = random.Random(seed)
    eid = 0

    def nxt() -> int:
        nonlocal eid
        eid += 1
        return eid

    chunks: list[list] = [[], [], []]
    kept: list[tuple] = []
    late: list[tuple] = []
    dup_pool: list[tuple[int, tuple]] = []  # (chunk_idx, row) dup candidates

    def add(k: int, m: int, *, is_late: bool = False):
        e, u = nxt(), rng.randint(1, 3)
        ety, v = rng.choice(ETYPES), rng.choice(VALUES)
        row = (e, m, u, ety, v)
        chunks[k].append(row)
        (late if is_late else kept).append(row)
        return row

    for k in range(3):
        base = 60 * k
        add(k, base + 45)  # pinned chunk max: watermark after chunk k = base+30
        for _ in range(rng.randint(15, 25)):
            m = base + rng.randint(0, 44)
            row = add(k, m)
            # originals in the chunk tail stay above the NEXT batch's
            # watermark (base+30), so their dedup state is still alive
            if k < 2 and base + 35 <= m <= base + 44:
                dup_pool.append((k, row))
        if k > 0:
            # within-watermark backjumps: ts in previous chunk's tail,
            # >= prev_base+41 > watermark prev_base+30
            for _ in range(rng.randint(2, 5)):
                add(k, 60 * (k - 1) + rng.randint(41, 50))
        if k == 2:
            # deep-late: watermark is 90 by now; windows ending <= 40
            # were evicted long ago and ts < watermark for dedup
            for _ in range(rng.randint(2, 4)):
                add(k, rng.randint(0, 30), is_late=True)

    # duplicate event_ids: the copy lands in the NEXT chunk, a few
    # minutes after the original — same id, state alive, must dedup
    rng.shuffle(dup_pool)
    dups = []
    for k, row in dup_pool[:4]:
        cp = (row[0], row[1] + rng.randint(0, 5), *row[2:])
        chunks[k + 1].append(cp)
        dups.append(cp)

    for c in chunks:
        rng.shuffle(c)  # intra-batch disorder
    return chunks, kept, dups, late


def _write_stream(tmp_events_dir, chunks) -> None:
    for k, rows in enumerate(chunks):
        write_event_chunk(
            tmp_events_dir,
            f"{k:03d}.json",
            [ev(e, _iso(m), user_id=u, etype=ety, value=v) for e, m, u, ety, v in rows],
        )
    # far-future probe: watermark passes everything => all windows emit
    write_event_chunk(
        tmp_events_dir,
        f"{len(chunks):03d}.json",
        [ev(999_999, _iso(10**5), user_id=999, etype="probe")],
    )


@pytest.mark.parametrize("seed", [11, 17])
def test_fuzz_tumbling_matches_batch_fold(spark, tmp_events_dir, tmp_path, seed):
    chunks, kept, dups, late = _gen_stream(seed)
    agg_rows = kept + dups  # dup event_ids are ordinary rows to an aggregation
    _write_stream(tmp_events_dir, chunks)
    name = f"fz_tum_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        W.tumbling_counts(file_events(spark, tmp_events_dir), watermark=f"{WM_MIN} minutes"),
        name, tmp_path, mode="append",
    )
    got = {
        (r.window_start.strftime("%Y-%m-%dT%H:%M:%SZ"), r.event_type,
         r.n_events, float(r.sum_value))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.event_type != "probe"
    }
    folds: dict[tuple, list] = {}
    for _, m, _, ety, v in agg_rows:
        folds.setdefault((m // 10 * 10, ety), []).append(v)
    expect = {
        (_iso(w), ety, len(vs), round(sum(vs), 4)) for (w, ety), vs in folds.items()
    }
    assert got == expect
    assert late, "generator must plant deep-late rows"


@pytest.mark.parametrize("seed", [11, 17])
def test_fuzz_sliding_matches_batch_fold(spark, tmp_events_dir, tmp_path, seed):
    chunks, kept, dups, late = _gen_stream(seed)
    agg_rows = kept + dups
    _write_stream(tmp_events_dir, chunks)
    name = f"fz_sli_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        W.sliding_counts(file_events(spark, tmp_events_dir), watermark=f"{WM_MIN} minutes"),
        name, tmp_path, mode="append",
    )
    got = {
        (r.window_start.strftime("%Y-%m-%dT%H:%M:%SZ"), r.event_type, r.n_events)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.event_type != "probe"
    }
    folds: dict[tuple, int] = {}
    for _, m, _, ety, _ in agg_rows:
        # 10-min windows sliding by 5: starts s with s <= m < s+10, s % 5 == 0
        for s in (m // 5 * 5 - 5, m // 5 * 5):
            if s >= 0 or m < s + 10:  # s may be -5 for m in [0,5)
                folds[(s, ety)] = folds.get((s, ety), 0) + 1
    expect = {(_iso(s), ety, n) for (s, ety), n in folds.items()}
    assert got == expect


@pytest.mark.parametrize("seed", [11, 17])
def test_fuzz_dedup_drops_dups_and_late(spark, tmp_events_dir, tmp_path, seed):
    chunks, kept, dups, late = _gen_stream(seed)
    _write_stream(tmp_events_dir, chunks)
    name = f"fz_ddp_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        W.dedup_stream(file_events(spark, tmp_events_dir), watermark=f"{WM_MIN} minutes"),
        name, tmp_path, mode="append",
    )
    rows = [r for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r.event_type != "probe"]
    got_ids = sorted(r.event_id for r in rows)
    expect_ids = sorted(e for e, *_ in kept)  # dups share ids; late dropped
    assert got_ids == expect_ids  # sorted lists: equal AND emitted exactly once
    assert dups, "generator must plant duplicate event_ids"


@pytest.mark.parametrize("seed", [29, 43])
def test_fuzz_session_matches_batch_fold(spark, tmp_events_dir, tmp_path, seed):
    """Bursty random gaps (including zero-gap same-minute bursts) across
    THREE chunk boundaries, rows shuffled inside each chunk: sessions
    spanning boundaries must merge in the state store and equal the
    per-user batch gap-fold."""
    rng = random.Random(seed)
    gap_min = 30
    events, t = [], {}
    for eid in range(60):
        u = rng.randint(1, 4)
        t[u] = t.get(u, 0) + rng.choice([0, 1, 5, 29, 30, 31, 90, 200])
        events.append((eid, u, t[u]))
    events.sort(key=lambda e: (e[2], e[0]))  # global time order across chunks
    third = len(events) // 3
    parts = [events[:third], events[third : 2 * third], events[2 * third :]]
    for k, part in enumerate(parts):
        rows = [ev(eid, _iso(m), user_id=u) for eid, u, m in part]
        rng.shuffle(rows)  # intra-batch disorder is free under the watermark
        write_event_chunk(tmp_events_dir, f"{k:03d}.json", rows)
    write_event_chunk(
        tmp_events_dir, "003.json", [ev(999_999, _iso(10**6), user_id=999)]
    )
    name = f"fz_ses_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        W.session_counts(file_events(spark, tmp_events_dir), gap=f"{gap_min} minutes"),
        name, tmp_path, mode="append",
    )
    got = {
        (r.user_id, r.session_start.strftime("%Y-%m-%dT%H:%M:%SZ"), r.n_events)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.user_id != 999
    }
    expect = set()
    by_user: dict[int, list] = {}
    for _, u, m in events:
        by_user.setdefault(u, []).append(m)
    for u, ms in by_user.items():
        ms.sort()
        start, n, prev = ms[0], 1, ms[0]
        for m in ms[1:]:
            if m - prev > gap_min:
                expect.add((u, _iso(start), n))
                start, n = m, 1
            else:
                n += 1
            prev = m
        expect.add((u, _iso(start), n))
    assert got == expect
