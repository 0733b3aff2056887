"""Profile the offline KSE streaming pipeline micro-batch breakdown.

Answers "where do the ~1.4 s of the bench's streaming drain go?" with
Spark's own instrumentation instead of wall-clock guesswork: after the
availableNow drain finishes, every micro-batch's progress event carries
``durationMs`` (addBatch = execute+sink, getBatch = source planning,
triggerExecution = whole trigger, walCommit/commitOffsets = checkpoint
bookkeeping) and ``stateOperators`` metrics (rows, state store commit
time). The split is recorded in DESIGN.md's round notes.

Usage: python tools/stream_profile.py [events_dir] [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kse.session import get_session  # noqa: E402
from kse.streaming.pipeline import run_offline  # noqa: E402


def profile_once(spark, events_dir: str) -> dict:
    workdir = tempfile.mkdtemp(prefix="kse-stream-prof-")
    try:
        t0 = time.perf_counter()
        q = run_offline(
            spark,
            events_dir,
            os.path.join(workdir, "index"),
            os.path.join(workdir, "ckpt"),
            fmt="parquet",
            max_files_per_trigger=None,
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    batches = []
    for p in progress:
        d = p.get("durationMs", {})
        so = (p.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "triggerExecution": d.get("triggerExecution"),
                "addBatch": d.get("addBatch"),
                "getBatch": d.get("getBatch"),
                "latestOffset": d.get("latestOffset"),
                "queryPlanning": d.get("queryPlanning"),
                "walCommit": d.get("walCommit"),
                "commitOffsets": d.get("commitOffsets"),
                "stateRows": so.get("numRowsTotal"),
                "stateCommitMs": so.get("commitTimeMs"),
            }
        )
    total_trigger = sum(b["triggerExecution"] or 0 for b in batches)
    return {
        "wall_s": round(wall, 3),
        "n_batches": len(batches),
        "sum_triggerExecution_ms": total_trigger,
        "startup_overhead_ms": round(wall * 1000 - total_trigger),
        "batches": batches,
    }


def main() -> None:
    events_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kse-layout-0.1/events_bucketed"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session(
        "kse-stream-profile",
        shuffle_partitions=2,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_events = spark.read.parquet(events_dir).count()
    print(f"events={n_events} dir={events_dir}")
    for i in range(runs):
        r = profile_once(spark, events_dir)
        thr = int(n_events / r["wall_s"])
        print(f"\n== run {i}: wall={r['wall_s']}s throughput={thr}/s "
              f"batches={r['n_batches']} "
              f"trigger_sum={r['sum_triggerExecution_ms']}ms "
              f"startup_overhead={r['startup_overhead_ms']}ms")
        for b in r["batches"]:
            print("  " + json.dumps(b))


if __name__ == "__main__":
    main()
