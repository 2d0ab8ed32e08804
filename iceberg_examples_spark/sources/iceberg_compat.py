"""Iceberg catalog integration (SURVEY Phase 3) — configuration, not code.

The reference's entire catalog surface is Spark *configuration*
(`Setup.java:38-43`): the Iceberg SQL extensions + a SparkSessionCatalog
over a hadoop warehouse. This module reproduces that surface verbatim for
PySpark and compiles the engine's mutation API to real ``MERGE INTO`` /
``DELETE FROM`` / ``ALTER TABLE`` SQL when the connector jar is present.

The iceberg-spark-runtime jar is NOT in this environment (and no network
installs are permitted), so everything is gated behind
:func:`iceberg_available`; the DataFrame-algebra mutations
(operators/mutations.py) are the always-available fallback with identical
observable semantics — that equivalence is exactly what the declared
mutation queries hash-verify against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CONFS = {
    # verbatim from the reference driver, Setup.java:38-43
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.spark_catalog": (
        "org.apache.iceberg.spark.SparkSessionCatalog"
    ),
    "spark.sql.catalog.spark_catalog.type": "hadoop",
}


def iceberg_confs(warehouse: str) -> dict[str, str]:
    """Session confs for an Iceberg-backed catalog at ``warehouse``
    (local path in tests, s3a:// in production — same keys either way)."""
    return {
        **ICEBERG_CONFS,
        "spark.sql.catalog.spark_catalog.warehouse": warehouse,
        "spark.sql.warehouse.dir": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the iceberg-spark-runtime jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkSessionCatalog"
        )
        return True
    except Exception:
        return False


class IcebergTable:
    """The engine mutation API compiled to Iceberg SQL (requires the jar).

    Mirrors operators/mutations.py one-to-one; each method is the SQL the
    reference executes, parameterized. Raising early when the connector is
    absent keeps failure modes obvious.
    """

    def __init__(self, spark: SparkSession, name: str):
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime jar not on classpath; use the "
                "DataFrame mutation operators (operators/mutations.py)"
            )
        self.spark = spark
        self.name = name

    def create(self, ddl_columns: str, partitioned_by: str | None = None) -> None:
        # IcebergSQLMerge.java:17-21 / IcebergPartitionedTable.java:25-33
        part = f" PARTITIONED BY ({partitioned_by})" if partitioned_by else ""
        self.spark.sql(
            f"CREATE TABLE {self.name} ({ddl_columns}) USING iceberg{part}"
        )

    def merge_upsert(
        self, source_view: str, keys: list[str], matched_condition: str | None = None
    ) -> None:
        # IcebergSQLMerge.java:29-46 / IcebergSQLMergeAsDeleteInsert.java:30-50
        on = " AND ".join(f"s.{k} = t.{k}" for k in keys)
        cond = f" AND {matched_condition}" if matched_condition else ""
        self.spark.sql(
            f"MERGE INTO {self.name} t USING {source_view} s ON {on} "
            f"WHEN MATCHED{cond} THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *"
        )

    def delete_where(self, predicate_sql: str) -> None:
        # IcebergSQLDelete.java:32
        self.spark.sql(f"DELETE FROM {self.name} WHERE {predicate_sql}")

    def add_column(self, name: str, dtype: str) -> None:
        # IcebergSQLMerge.java:69
        self.spark.sql(f"ALTER TABLE {self.name} ADD COLUMN {name} {dtype}")

    def drop_column(self, name: str) -> None:
        # IcebergSQLDelete.java:35
        self.spark.sql(f"ALTER TABLE {self.name} DROP COLUMN {name}")

    def refresh(self) -> None:
        # the cloneSession() cache-dodge (IcebergSQLMerge.java:48) done right
        self.spark.sql(f"REFRESH TABLE {self.name}")

    def read(self) -> DataFrame:
        return self.spark.table(self.name)

    def history(self) -> DataFrame:
        # metadata tables surface, IcebergHadoopTables.java:44-47
        return self.spark.read.format("iceberg").load(f"{self.name}.history")
