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

Since round 9 the FORMAT half no longer waits on the jar:
:mod:`iceberg_examples_spark.sources.iceberg_native` reads and writes
the Iceberg v2 table layout (metadata.json + Avro manifests + parquet)
from the public spec, including merge-on-read delete application —
see that module for the scan/export surface.
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


# ---------------------------------------------------------------------------
# SQL compilation (pure; no SparkSession, no jar).
#
# Every statement the reference executes against its Iceberg catalog is
# generated here as text, so the compile path is golden-testable offline
# (tests/test_iceberg_sql_golden.py checks the generated statements
# against the reference's literal SQL shapes) even though the connector
# jar is unobtainable in this environment. IcebergTable below is a thin
# executor over these compilers.
# ---------------------------------------------------------------------------


def compile_create(
    name: str, ddl_columns: str, partitioned_by: str | None = None
) -> str:
    """CREATE TABLE ... USING iceberg (IcebergSQLMerge.java:17-21;
    partitioned variant IcebergPartitionedTable.java:25-33)."""
    part = f" PARTITIONED BY ({partitioned_by})" if partitioned_by else ""
    return f"CREATE TABLE {name} ({ddl_columns}) USING iceberg{part}"


def compile_merge_star(
    name: str,
    source_view: str,
    keys: list[str],
    matched_condition: str | None = None,
) -> str:
    """Schema-tolerant star merge — ``UPDATE SET * / INSERT *``
    (IcebergSQLMerge.java:50-66, the mergev2/mergev3 statements)."""
    on = " AND ".join(f"s.{k} = t.{k}" for k in keys)
    cond = f" AND {matched_condition}" if matched_condition else ""
    return (
        f"MERGE INTO {name} t USING {source_view} s ON {on} "
        f"WHEN MATCHED{cond} THEN UPDATE SET * "
        f"WHEN NOT MATCHED THEN INSERT *"
    )


def compile_merge_explicit(
    name: str,
    source_view: str,
    keys: list[str],
    update_cols: list[str],
    insert_cols: list[str],
    matched_condition: str | None = None,
) -> str:
    """Explicit-column merge — ``UPDATE SET t.c = s.c ... INSERT(cols)
    VALUES(s.cols)`` (IcebergSQLMerge.java:29-46, the first merge)."""
    on = " AND ".join(f"s.{k} = t.{k}" for k in keys)
    cond = f" AND {matched_condition}" if matched_condition else ""
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    ins = ", ".join(insert_cols)
    vals = ", ".join(f"s.{c}" for c in insert_cols)
    return (
        f"MERGE INTO {name} t USING {source_view} s ON {on} "
        f"WHEN MATCHED{cond} THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT({ins}) VALUES({vals})"
    )


def compile_scd2_merge(
    name: str,
    staging: str,
    key: str,
    attr_cols: list[str],
    effective_col: str = "effective_date",
    end_col: str = "end_date",
    current_col: str = "current",
    open_end_literal: str = "to_date('9999-12-31', 'yyyy-MM-dd')",
) -> str:
    """The reference's SCD2 merge (IcebergSCD2.java:51-68): the source is
    a UNION ALL of (a) staging rows opened with the far-future end date
    and (b) the currently-open target rows re-keyed to close at the
    staging row's effective date; matching on (key, effective_date) makes
    (b) hit the MATCHED branch (close) and (a) the NOT MATCHED branch
    (insert-open)."""
    attrs = ", ".join(attr_cols)
    t_attrs = ", ".join(f"t.{c}" for c in attr_cols)
    ins_cols = f"{key}, {attrs}, {current_col}, {effective_col}, {end_col}"
    ins_vals = f"s.{key}, {', '.join(f's.{c}' for c in attr_cols)}, true, s.{effective_col}, s.{end_col}"
    return (
        f"MERGE INTO {name} t USING ( "
        f"SELECT {key}, {attrs}, {effective_col}, "
        f"{open_end_literal} AS {end_col} FROM {staging} "
        f"UNION ALL "
        f"SELECT t.{key}, {t_attrs}, t.{effective_col}, "
        f"s.{effective_col} AS {end_col} FROM {staging} s "
        f"INNER JOIN {name} t ON s.{key} = t.{key} "
        f"AND t.{current_col} = true "
        f") s ON s.{key} = t.{key} AND s.{effective_col} = t.{effective_col} "
        f"WHEN MATCHED THEN UPDATE SET t.{current_col} = false, "
        f"t.{end_col} = s.{end_col} "
        f"WHEN NOT MATCHED THEN INSERT({ins_cols}) VALUES({ins_vals})"
    )


def compile_delete(name: str, predicate_sql: str) -> str:
    """DELETE FROM ... WHERE (IcebergSQLDelete.java:32)."""
    return f"DELETE FROM {name} WHERE {predicate_sql}"


def compile_add_column(name: str, column: str, dtype: str) -> str:
    """ALTER TABLE ... ADD COLUMN (IcebergSQLMerge.java:69)."""
    return f"ALTER TABLE {name} ADD COLUMN {column} {dtype}"


def compile_drop_column(name: str, column: str) -> str:
    """ALTER TABLE ... DROP COLUMN (IcebergSQLDelete.java:35)."""
    return f"ALTER TABLE {name} DROP COLUMN {column}"


# ---------------------------------------------------------------------------
# Named refs DDL — the connector-SQL twins of LocalTable's tag/branch
# surface (catalog.create_tag/create_branch/fast_forward, demonstrated by
# the snapshot_refs and stream_wap_branch queries). CREATE/DROP TAG/BRANCH
# use Iceberg's SQL-extension grammar (parseable only with
# IcebergSparkSessionExtensions on the session — same jar gate as
# execution); VERSION AS OF and CALL are first-class in Spark 4's own
# parser and are parse-verified offline in the golden tests.
# ---------------------------------------------------------------------------


def compile_create_tag(
    name: str, tag: str, snapshot_id: int | None = None
) -> str:
    """ALTER TABLE ... CREATE TAG (Iceberg branching DDL; extension
    grammar). ``snapshot_id`` pins the tag to a snapshot, else head."""
    asof = f" AS OF VERSION {snapshot_id}" if snapshot_id is not None else ""
    return f"ALTER TABLE {name} CREATE TAG `{tag}`{asof}"


def compile_create_branch(
    name: str, branch: str, snapshot_id: int | None = None
) -> str:
    """ALTER TABLE ... CREATE BRANCH (extension grammar)."""
    asof = f" AS OF VERSION {snapshot_id}" if snapshot_id is not None else ""
    return f"ALTER TABLE {name} CREATE BRANCH `{branch}`{asof}"


def compile_drop_ref(name: str, ref: str, ref_type: str) -> str:
    """ALTER TABLE ... DROP TAG/BRANCH (extension grammar)."""
    kw = {"tag": "TAG", "branch": "BRANCH"}[ref_type]
    return f"ALTER TABLE {name} DROP {kw} `{ref}`"


def compile_read_ref(name: str, ref: str) -> str:
    """Read a named ref — ``VERSION AS OF 'ref'`` (vanilla Spark 4
    time-travel grammar; LocalTable.read(ref) is the engine twin)."""
    return f"SELECT * FROM {name} VERSION AS OF '{ref}'"


def compile_fast_forward(name: str, branch: str, to: str) -> str:
    """CALL catalog.system.fast_forward (Iceberg procedure; CALL is
    first-class in Spark 4's parser). LocalTable.fast_forward is the
    engine twin; stream_wap_branch's publish step compiles to this."""
    return f"CALL system.fast_forward('{name}', '{branch}', '{to}')"


def compile_write_branch_option(branch: str) -> str:
    """The write-to-branch conf the streaming WAP pattern sets —
    Iceberg's ``spark.wap.branch`` session conf (stream_wap_branch's
    overwrite_branch commits are the engine twin)."""
    return f"SET spark.wap.branch = {branch}"


class IcebergTable:
    """The engine mutation API compiled to Iceberg SQL (requires the jar).

    Mirrors operators/mutations.py one-to-one; each method executes the
    statement built by the matching ``compile_*`` function above (the SQL
    the reference runs, parameterized). Raising early when the connector
    is absent keeps failure modes obvious.
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
        self.spark.sql(compile_create(self.name, ddl_columns, partitioned_by))

    def merge_upsert(
        self, source_view: str, keys: list[str], matched_condition: str | None = None
    ) -> None:
        self.spark.sql(
            compile_merge_star(self.name, source_view, keys, matched_condition)
        )

    def merge_explicit(
        self,
        source_view: str,
        keys: list[str],
        update_cols: list[str],
        insert_cols: list[str],
        matched_condition: str | None = None,
    ) -> None:
        self.spark.sql(
            compile_merge_explicit(
                self.name, source_view, keys, update_cols, insert_cols,
                matched_condition,
            )
        )

    def scd2_merge(self, staging: str, key: str, attr_cols: list[str]) -> None:
        self.spark.sql(compile_scd2_merge(self.name, staging, key, attr_cols))

    def delete_where(self, predicate_sql: str) -> None:
        self.spark.sql(compile_delete(self.name, predicate_sql))

    def add_column(self, name: str, dtype: str) -> None:
        self.spark.sql(compile_add_column(self.name, name, dtype))

    def drop_column(self, name: str) -> None:
        self.spark.sql(compile_drop_column(self.name, name))

    def refresh(self) -> None:
        # the cloneSession() cache-dodge (IcebergSQLMerge.java:48) done right
        self.spark.sql(f"REFRESH TABLE {self.name}")

    def read(self) -> DataFrame:
        return self.spark.table(self.name)

    def history(self) -> DataFrame:
        # metadata tables surface, IcebergHadoopTables.java:44-47
        return self.spark.read.format("iceberg").load(f"{self.name}.history")
