"""Plan-assertion tests: lock in the scale invariants PLANS.md documents.

For every headline query (the bench set plus a few plan-interesting
extras) the FINAL adaptive physical plan must satisfy:

- no row-at-a-time Python UDF stages (``BatchEvalPython``) — the only
  Python on the hot path is Arrow-batched (``MapInPandas`` /
  ``FlatMapGroupsInPandas``), which these assertions deliberately allow;
- no ``CartesianProduct`` outside the brute-force kNN baseline
  (``knn_cosine`` is the *documented* all-pairs reference; its IVF twin
  must NOT be cartesian — that's the point of IVF);

plus targeted per-query expectations (calibrated against PLANS.md):

- filter pushdown reaches the parquet scan (non-empty PushedFilters);
- joins expected to broadcast do broadcast (BroadcastHashJoin present);
- the partitioned read actually prunes (non-empty PartitionFilters).

The plan is captured AFTER executing the query, so AQE's final decisions
(not the tentative static plan) are what get asserted.
"""

from __future__ import annotations

import re

import pytest

from bench import HEADLINE
from iceberg_examples_spark.registry import QUERIES

# queries allowed a CartesianProduct: the documented brute-force baseline
CARTESIAN_OK = {"knn_cosine"}

# non-empty PushedFilters must reach a FileScan
PUSHDOWN_EXPECTED = {
    "agg_sum_by_key",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q21",
    "window_hourly",
    "filter_conj",
}

# a BroadcastHashJoin must be present (small dims / index sides broadcast)
BROADCAST_EXPECTED = {
    "tpch_q3",
    "tpch_q5",
    "tpch_q21",
    "dedup_minhash_lsh",
    "stratified_sample_lang",
    "bloom_prune_join",
    "epoch_shuffle",  # the 32-row offset table must broadcast
}

# the OR-join rewrite must hash/broadcast-join — a surviving nested-loop
# or cartesian node means the rewrite regressed to the O(n*m) fallback
NO_NESTED_LOOP = {"or_join_union"}

# the global-enumeration queries must NOT collapse a window to one
# partition (the exact anti-pattern their bucket formulation exists to
# avoid; "Window" + "SinglePartition" adjacency is the plan smell)
NO_GLOBAL_WINDOW = {"epoch_shuffle"}

# embedding_stats: columnar per-dim aggregation — the ONLY Generate
# (explode) allowed is the final 64-row unpack of the 1-row aggregate,
# never an explode of the input relation (which would multiply the
# shuffle by the dimensionality)
SINGLE_GENERATE = {"embedding_stats"}

# non-empty PartitionFilters (directory-level pruning on the read-back)
PARTITION_PRUNE_EXPECTED = {"partition_prune", "dynamic_partition_prune"}

# a dynamicpruning subquery must reach the fact scan (runtime partition
# pruning from the dim's selective filter — the query's entire point)
DPP_EXPECTED = {"dynamic_partition_prune"}

# bench pseudo-entries (curation_incremental_cold/_warm wrap the same
# registry query with artifact-state setup) aren't separate plans
PLAN_SET = sorted(
    (set(HEADLINE) | {"filter_conj", "knn_cosine", "knn_cosine_ivf"})
    & set(QUERIES)
)

_PUSHED_NONEMPTY = re.compile(r"PushedFilters: \[[^\]]")
_PART_NONEMPTY = re.compile(r"PartitionFilters: \[[^\]]")


def _final_plan(df) -> str:
    # execute first so an AdaptiveSparkPlan reports its FINAL shape
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", PLAN_SET)
def test_plan_invariants(name, spark, sf_dir):
    plan = _final_plan(QUERIES[name](spark, sf_dir))

    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF stage in the plan"
    )
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, (
            f"{name}: unexpected CartesianProduct"
        )
    if name in PUSHDOWN_EXPECTED:
        assert _PUSHED_NONEMPTY.search(plan), (
            f"{name}: no pushed filters reached the scan"
        )
    if name in BROADCAST_EXPECTED:
        assert "BroadcastHashJoin" in plan, (
            f"{name}: expected broadcast join is not broadcast"
        )
    if name in PARTITION_PRUNE_EXPECTED:
        assert _PART_NONEMPTY.search(plan), (
            f"{name}: partitioned read-back shows no partition pruning"
        )
    if name in NO_GLOBAL_WINDOW:
        assert "Window" in plan and "SinglePartition" not in plan, (
            f"{name}: window collapsed to a single partition"
        )
    if name in SINGLE_GENERATE:
        assert plan.count("Generate") <= 1, (
            f"{name}: input-relation explode leaked into the plan"
        )
    if name in NO_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join leaked back in"
        )
    if name in DPP_EXPECTED:
        assert "dynamicpruning" in plan.lower(), (
            f"{name}: no dynamic partition pruning subquery in the plan"
        )


def test_localtable_partition_pruning_survives_append(spark, tmp_path):
    """The read-path benefit the round-8 partition-spec fix exists for:
    after an append, a filter on the partition column still reaches the
    scan as a PartitionFilter (directory pruning), not a post-scan
    DataFilter. Before the fix the appended snapshot was written
    unpartitioned and the filter could only prune row groups."""
    import re

    from pyspark.sql import functions as F

    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "tbl_prune"))
    t.create(
        spark.createDataFrame(
            [(i, f"p{i % 3}") for i in range(30)], "k long, p string"
        ),
        partition_by=["p"],
    )
    t.append(spark.createDataFrame([(99, "p1")], "k long, p string"))
    plan = (
        t.read()
        .filter(F.col("p") == "p1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "= p1" in m.group(0), plan[:2000]
