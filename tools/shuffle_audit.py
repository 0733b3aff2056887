"""Runtime shuffle audit — the measured companion to tools/plan_audit.py.

plan_audit asserts what the PLAN says (no Exchange, partial aggregation,
broadcast); this tool asserts what EXECUTION did: actual shuffle-write
bytes and spill per query, read from the Spark UI REST API
(/api/v1/applications/<app>/stages) by diffing the completed-stage set
around each query. The point is scale evidence — a query whose docstring
claims "only partial-aggregate states shuffle" should move kilobytes at
sf0.1, and a claimed map-only query should move ZERO bytes. Bounds are
calibrated ~3x above the measured value at sf0.1 so ambient variance
passes but a regression to a row-shuffle (orders of magnitude larger)
fails loudly.

Run: python tools/shuffle_audit.py [sf_dir]   (default /root/testdata/sf0.1)
Writes SHUFFLES.md at the repo root and exits non-zero on any violation.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kse import registry  # noqa: E402
from kse.session import get_session  # noqa: E402

KB = 1024
MB = 1024 * 1024

# query -> (max shuffle-write bytes, the scale claim being measured)
BOUNDS: dict[str, tuple[int, str]] = {
    # map-only claims: literally zero shuffle
    "q_llm_chunk": (0, "RAG chunking is map-only — zero Exchange, zero bytes"),
    "q_llm_quality_classifier": (0, "quality scoring is map-only"),
    "q_llm_dedup_semantic_arrow": (
        4 * MB,
        "only the groupBy(cid) forming clusters shuffles — vectors once, pairs never",
    ),
    # partial-aggregation claims: shuffle = per-partition aggregate states
    "q_tpch_q6": (64 * KB, "one-row partial sums only"),
    "q_tpch_q1": (256 * KB, "six groups' partial states per partition"),
    "q_agg_groupby": (256 * KB, "flagship aggregate combines map-side"),
    "q_llm_dedup_exact": (
        8 * MB,
        "duplicates collapse map-side; only distinct texts' states shuffle",
    ),
    "q_agg_percentile_dist": (
        8 * MB,
        "bucket-count states + only the target buckets' rows shuffle — "
        "the value->count buffer the builtin percentile would build "
        "never exists",
    ),
    "q_agg_percentile_disc_dist": (
        8 * MB,
        "same rank-selection machinery as the continuous twin; the "
        "value->count buffer percentile_disc would build never exists",
    ),
    "q_agg_winsorize_dist": (
        8 * MB,
        "rank-selection bounds + clipped partial-agg states shuffle; "
        "the per-group percentile buffer never exists",
    ),
    "q_win_ntile_percent_dist": (
        16 * MB,
        "rows shuffle once on (status, value-bucket); bucket offsets "
        "and group totals are metadata-sized",
    ),
    "q_join_theta_cdf": (
        4 * MB,
        "only distinct-price counts + two boundary rows per supplier "
        "shuffle — no candidate pair ever materializes",
    ),
    # bounded-shuffle claims: keys/signatures move, never payloads
    "q_llm_dedup_substring": (
        24 * MB,
        "16-byte gram hashes shuffle, the gram text never does",
    ),
    "q_llm_dedup_minhash": (
        24 * MB,
        "band signatures + candidate ids shuffle, not documents",
    ),
    "q_topk_per_group": (
        8 * MB,
        "WindowGroupLimit prunes per partition before the exchange",
    ),
    "q_tpch_q3": (
        8 * MB,
        "dims broadcast; only the surviving fact rows + partials shuffle",
    ),
    "q_join_broadcast": (
        64 * KB,
        "fact side never shuffles — broadcast join, then partial-agg states",
    ),
    "q_join_skew_salted": (
        64 * KB,
        "salting spreads the hot key; the exchange carries states, not rows",
    ),
    "q_llm_sim_lsh_ann": (
        64 * KB,
        "queries broadcast into the buckets; only per-query top-k states move",
    ),
    "q_llm_dedup_minhash_fast": (
        24 * MB,
        "xxhash64 band signatures + candidate ids shuffle, not documents",
    ),
    "q_llm_dedup_simhash_scaled": (
        64 * MB,
        "20 block-triple keys + fingerprint per doc shuffle (24-byte "
        "rows), never document text; candidates are ids only",
    ),
    "q_llm_pack_sequences": (
        512 * KB,
        "dist_prefix_sum: only bucket METADATA crosses the global exchange",
    ),
    "q_agg_bitmap_distinct": (
        64 * KB,
        "roaring bitmaps build map-side; only merged bitmap states shuffle",
    ),
    "q_sql_scd2_incremental": (
        512 * KB,
        "only open versions + the change batch shuffle, never the dimension",
    ),
    "q_graph_triangles": (
        1 * MB,
        "edge keys shuffle; adjacency payloads never materialize",
    ),
    "q_tpch_q2": (
        42 * MB,
        "lineitem shuffles once to build ps partials; dims broadcast, "
        "min-cost join-back stays on partkey",
    ),
    "q_tpch_q11": (
        48 * MB,
        "same single ps build; per-part value re-shuffle carries states",
    ),
    "q_tpch_q20": (
        2 * MB,
        "semi-join-pruned fact rows shuffle once into ONE conditional "
        "aggregate (both period sums share the pass)",
    ),
    "q_udf_pandas_grouped_agg": (
        512 * KB,
        "GROUPED_AGG UDAF has no partial agg: the full acctbal column "
        "(not the full row) ships per group",
    ),
    "q_udf_pandas_window_agg": (
        640 * KB,
        "window UDAF shuffles the projected rows once on the partition key",
    ),
}


def _stages(base: str) -> list[dict]:
    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        return json.load(r)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(
        "kse-shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    qs = registry.all_queries()
    rows = []
    failures = []
    for name, (bound, claim) in BOUNDS.items():
        fn = qs[name].fn
        # warm once so scan-side setup (schema inference, file listing)
        # does not attribute to the measured run
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        seen = {s["stageId"] for s in _stages(base)}
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        new = [s for s in _stages(base) if s["stageId"] not in seen]
        shuffle_w = sum(s.get("shuffleWriteBytes", 0) for s in new)
        spill = sum(
            s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
            for s in new
        )
        ok = shuffle_w <= bound and spill == 0
        rows.append((name, shuffle_w, bound, spill, ok, claim))
        if not ok:
            failures.append(name)
        print(
            f"{'PASS' if ok else 'FAIL'}  {name}: shuffle {shuffle_w:,} B "
            f"(bound {bound:,}), spill {spill:,} B"
        )

    out = [
        "# SHUFFLES.md — measured shuffle bytes per query",
        "",
        f"Runtime evidence at `{sf_dir}` (Spark UI REST, completed-stage",
        "diff around each query; regenerate with `python",
        "tools/shuffle_audit.py`). plan_audit.py asserts the plan SHAPE;",
        "this table asserts the bytes that actually moved. Bounds sit ~3x",
        "above the calibrated measurement — a regression to a row-shuffle",
        "is orders of magnitude, not percent.",
        "",
        "| query | shuffle write | bound | spill | claim |",
        "| --- | --- | --- | --- | --- |",
    ]
    for name, w, bound, spill, ok, claim in rows:
        mark = "" if ok else " **VIOLATED**"
        out.append(
            f"| {name} | {w:,} B | {bound:,} B | {spill:,} B | {claim}{mark} |"
        )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SHUFFLES.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote SHUFFLES.md ({len(rows)} queries)")
    if failures:
        print(f"VIOLATIONS: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
