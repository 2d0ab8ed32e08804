"""End-to-end CDC pipeline (the reference's raison d'être, composed):
sequential change batches merged into a snapshot-versioned dimension with
the monotonic-timestamp guard, every step committed as a table snapshot.

This is `IcebergSQLMergeAsDeleteInsert.java` scaled from a 3-row demo to a
real pipeline shape: initial load → N CDC batches → conditional MERGE per
batch (stale updates rejected by the ts guard) → snapshot log shows the
lineage. The declared query returns the final dimension state; the oracle
recomputes it in closed form from the same deterministic batch definitions.

Scale: each batch is one broadcast-merge against the dimension (the CDC
batch is the small side); commits are atomic snapshot swaps. At 100 TB the
only change is the sink (Iceberg MoR via sources/iceberg_compat.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import LocalTable, load_table, scratch_dir
from iceberg_examples_spark.operators.mutations import merge_upsert


def _initial_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.lit(1).alias("change_ts"),
    )


def _batch(dim_src: DataFrame, mod: int, delta: float, ts: int) -> DataFrame:
    """Deterministic CDC batch: customers whose key ≡ 0 (mod ``mod``) get
    ``delta`` added to their balance at change time ``ts``."""
    return dim_src.filter(F.col("c_custkey") % mod == 0).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + F.lit(delta)).alias("c_acctbal"),
        F.lit(ts).alias("change_ts"),
    )


def cdc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial load + three CDC batches (one deliberately STALE and
    rejected by the guard), each merged and committed as a snapshot:

    - batch ts=3: +100.00 for custkey % 7 == 0
    - batch ts=2: +999.00 for custkey % 3 == 0 — the guard is PER-ROW:
      rows still at ts=1 accept it, but %21 rows (already at ts=3 from
      the first batch) reject it as stale — out-of-order CDC handled
    - batch ts=2 (again, +555.00 for custkey % 3 == 0): rejected for every
      row already at ts>=2 (not strictly newer) — the CDC dedup guarantee.

    Returns the final dimension (custkey, name, balance, change_ts)."""
    base = _initial_dim(spark, sf_dir)
    table = LocalTable(spark, scratch_dir(sf_dir, "cdc_pipeline", fresh=True))
    table.create(base)

    guard = F.col("t.change_ts") < F.col("s.change_ts")
    batches = [
        _batch(base, 7, 100.0, 3),
        _batch(base, 3, 999.0, 2),
        _batch(base, 3, 555.0, 2),  # stale: every target row already ts>=2
    ]
    for batch in batches:
        merged = merge_upsert(
            table.read(), batch, ["c_custkey"], matched_condition=guard
        )
        table.overwrite(merged)

    lineage = [s["operation"] for s in table.snapshots()]
    if lineage != ["create", "overwrite", "overwrite", "overwrite"]:
        raise RuntimeError(
            f"cdc_pipeline: unexpected snapshot lineage {lineage} — stale "
            "table state survived the scratch reset"
        )
    return table.read()
