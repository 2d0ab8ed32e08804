"""Table-maintenance scenario (Iceberg maintenance-procedure analogues).

The reference demonstrates Iceberg's snapshot lifecycle (appends creating
snapshots — ``IcebergJavaApiAppend.java:92-94``; history/metadata tables —
``IcebergHadoopTables.java:44-47``). Production Iceberg tables also need
the maintenance procedures built on that lifecycle: ``rewrite_data_files``
(small-file compaction) and ``expire_snapshots`` (history pruning). This
module exercises the engine's analogues on :class:`catalog.LocalTable` as
one declared, oracle-checked scenario:

    create → append → append      (3 small snapshots, fragmented layout)
    compact                        (rewrite into one file, new snapshot)
    expire_snapshots(keep_last=2)  (metadata-only CAS commit; old data
                                    dirs deleted after publish)

The query output couples the *data* invariant (maintenance must not change
table contents — verified by grouped aggregates over the final read) with
the *metadata* invariant (deterministic final version, retained-snapshot
count, expired count — hardcoded in the oracle, so any drift in commit or
retention semantics breaks the hash).

Scale notes: compaction is ``read → coalesce(n) → write`` — a shuffle-free
rewrite that on a cluster runs per-partition (Iceberg's binpack strategy);
expiry is O(#snapshots) metadata work plus unreferenced-file deletion,
independent of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import LocalTable, load_table, scratch_dir


def table_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the compaction + snapshot-expiry lifecycle and report both the
    final table contents (grouped) and the metadata counters."""
    nat = load_table(spark, sf_dir, "nation")
    table = LocalTable(spark, scratch_dir(sf_dir, "maintenance", fresh=True))
    table.create(nat.filter("n_nationkey < 8"))
    table.append(nat.filter("n_nationkey >= 8 AND n_nationkey < 16"))
    table.append(nat.filter("n_nationkey >= 16"))
    table.compact(target_files=1)
    n_expired = table.expire_snapshots(keep_last=2)

    final = table.read()
    return (
        final.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
        .withColumn(
            "current_version", F.lit(table.current_version).cast("bigint")
        )
        .withColumn(
            "n_snapshots", F.lit(len(table.snapshots())).cast("bigint")
        )
        .withColumn("n_expired", F.lit(n_expired).cast("bigint"))
    )
