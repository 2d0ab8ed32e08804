"""Scaling evidence: time representative queries at sf0.01 and sf0.1
(10× the relational/event tables; 10× documents, 4× embeddings between
the two points) and report time-growth vs data-growth.

The honest reading at these toy sizes: time ratios far below the data
ratio mean FIXED COSTS (job scheduling, codegen, py4j) dominate — i.e.
the engine has throughput headroom, and the per-row work visible at
sf0.1 is the quantity that extrapolates. A time ratio ABOVE the data
ratio would flag a super-linear formulation (the thing the plan tests
exist to prevent). Run: ``python scripts/scale_sweep.py`` — prints one
JSON line per query plus a markdown block for DESIGN.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from iceberg_examples_spark.registry import QUERIES  # noqa: E402
from iceberg_examples_spark.session import get_spark  # noqa: E402

SMALL, LARGE = "/root/testdata/sf0.01", "/root/testdata/sf0.1"
RUNS = 3

# (query, table whose growth drives it, small→large data ratio)
SWEEP = [
    ("tpch_q1", "lineitem", 10),
    ("agg_sum_by_key", "lineitem", 10),
    ("tpch_q3", "lineitem+orders", 10),
    ("dedup_latest", "events", 10),
    ("window_hourly", "events", 10),
    ("funnel_stages", "events", 10),
    ("dedup_exact", "documents", 10),
    ("dedup_minhash_lsh", "documents", 10),
    ("llm_prep_pipeline", "documents", 10),
    ("epoch_shuffle", "documents", 10),
    ("kmeans_large", "embeddings", 4),
    ("embedding_stats", "embeddings", 4),
    # round-7 additions: the sf-scaled full-sync MERGE (by-source
    # clauses on thousands of rows) and the Arrow-axis watch item
    ("merge_by_source_exec", "customer", 10),
    ("dedup_simhash", "documents", 10),
    # round-7 addition: the heaviest stateful streaming scenario — with
    # state partitions sized to input (streaming/rollup.py
    # sized_state_partitions), its cost should be micro-batch fixed
    # machinery, near-flat under 10× events
    ("stream_late_data", "events", 10),
    # round-9 additions: the format layer — avro write+read per-file
    # parallel decode, and the Iceberg native scan + MOR paths (table
    # creation dominates these scenario queries; the scaling question
    # is whether the metadata machinery stays amortized as data grows)
    ("avro_roundtrip", "customer", 10),
    ("iceberg_native_scan", "orders", 10),
    ("iceberg_native_mor", "customer", 10),
    # round-10 additions: atomic row-delta upsert, both-mode DML, the
    # changelog diff (restricted to changed files), and hybrid RRF
    # retrieval (two bounded top-k rankings + a <=100-row fusion join)
    ("iceberg_native_upsert", "customer", 10),
    ("iceberg_delete_modes", "orders", 10),
    ("iceberg_update_modes", "orders", 10),
    ("iceberg_changelog", "events", 10),
    ("hybrid_rrf_search", "documents+embeddings", 10),
    # round-10 second session: partition-scoped MOR debt, deletion
    # vectors (upgrade + merge/supersede), add_files registration, the
    # executor-parallel streaming read, row lineage through rewrites,
    # and the two new exact-integer LLM ops (clustered pair search /
    # 256-bucket broadcast model — both should be near-flat)
    ("iceberg_partition_debt", "orders", 10),
    ("iceberg_deletion_vectors", "orders", 10),
    ("iceberg_add_files", "customer", 10),
    ("stream_from_iceberg_bulk", "events", 10),
    ("iceberg_row_lineage", "orders", 10),
    ("semantic_dedup", "embeddings", 4),
    ("dsir_weights", "documents", 10),
    # round-11 additions: lineage-keyed CDC (changed-file diffs +
    # replace-skip — should scale with the CHANGE, not the table),
    # NDV/HLL statistics (one grouped agg), the listing seam
    # (file-count-shaped), bounded streaming admission (fixed batch
    # count by construction — near-flat), default-value reads, and the
    # targeted rewrite (cost follows the rewritten debt)
    ("iceberg_changelog_lineage", "orders", 10),
    ("iceberg_table_statistics", "orders", 10),
    # object_store_listing is deliberately NOT swept: its object census
    # is pinned by construction (13 objects at every sf), so a 1x data
    # ratio makes any timing jitter read as "super-linear" — fixed-work
    # scenarios have no scaling axis to measure
    ("stream_admission_control", "events", 10),
    ("iceberg_default_values", "customer", 10),
    ("iceberg_rewrite_datafiles", "orders", 10),
]


def main() -> None:
    spark = get_spark(app_name="scale-sweep")
    for name, _, _ in SWEEP:  # warmup at the tiny sf
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass
    results = []
    for name, table, ratio in SWEEP:
        med = {}
        for sf_dir in (SMALL, LARGE):
            runs = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            med[sf_dir] = statistics.median(runs)
        r = {
            "query": name,
            "driver_table": table,
            "data_ratio": ratio,
            "t_small": round(med[SMALL], 3),
            "t_large": round(med[LARGE], 3),
            "time_ratio": round(med[LARGE] / med[SMALL], 2),
        }
        results.append(r)
        print(json.dumps(r))

    print("\n--- DESIGN.md block ---\n")
    print("| query | driver table | data × | t(sf0.01) | t(sf0.1) | time × |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['query']} | {r['driver_table']} | {r['data_ratio']}× "
            f"| {r['t_small']} s | {r['t_large']} s | {r['time_ratio']}× |"
        )
    sup = [r["query"] for r in results if r["time_ratio"] > r["data_ratio"]]
    print(
        f"\nsuper-linear (time× > data×): {sup or 'none'} — "
        "anything listed needs a formulation review."
    )
    spark.stop()


if __name__ == "__main__":
    main()
