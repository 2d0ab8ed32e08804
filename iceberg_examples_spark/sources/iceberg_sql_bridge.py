"""SQL-executor bridge onto the native Iceberg v2 layout.

The statement executor (sql_merge.execute_statement) was verified
against LocalTable since round 6; this adapter gives it the SAME
table interface backed by :class:`IcebergNativeTable`, so the
reference's verbatim SQL scripts (IcebergSQLMerge.java:17-92,
IcebergSQLDelete.java) commit REAL manifests / manifest lists /
metadata.json per statement — upgrading S4-S6/M1-M6 from "semantics
verified on LocalTable" to "semantics verified in the Iceberg layout".

Semantics notes:

- One snapshot per statement, copy-on-write: DML overwrites commit a
  REPLACE snapshot (fresh data files, old snapshots keep their manifest
  lists, time travel intact).
- ALTERs arrive from the executor as whole-table rewrites with a new
  column set; the adapter first commits a schema evolution derived by
  NAME diff (persisting names keep their field ids — and their column
  bounds — new names allocate fresh ids; a rename through this path is
  a drop+add, which is faithful to the copy-on-write rewrite the
  executor performs) and then the replace snapshot under the new
  schema.
- ``current_version`` is the current SNAPSHOT id (the executor only
  uses it relatively: read a base, commit against it); the optimistic
  check maps to CommitConflictError exactly like LocalTable's.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.sources.iceberg_native import (
    IcebergNativeTable,
    _spark_to_ice_type,
)


class IcebergNativeSqlTable:
    """The LocalTable interface subset execute_statement drives
    (create / read / overwrite / append / current_version), stored as a
    native Iceberg v2 table."""

    def __init__(
        self, spark: SparkSession, location: str, branch: str | None = None
    ):
        """``branch`` scopes EVERY executor operation (read, append,
        overwrite, version check) to that branch ref — write-audit-
        publish for DML: the executor's MERGE/DELETE statements commit
        real snapshots that only the branch can see until
        ``fast_forward`` publishes them to main."""
        self.spark = spark
        self.location = location
        self.branch = branch
        self.table = IcebergNativeTable(spark, location)

    # -- interface the executor calls -----------------------------------

    def _head(self, meta: dict) -> int:
        if self.branch is not None:
            return meta["refs"][self.branch]["snapshot-id"]
        return meta["current-snapshot-id"]

    @property
    def current_version(self) -> int:
        return self._head(self.table._metadata())

    def create(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        IcebergNativeTable.create(
            self.spark, self.location, df, partition_by=partition_by
        )

    def read(self, version: int | None = None) -> DataFrame:
        if version is None and self.branch is not None:
            return self.table.scan(ref=self.branch)
        return self.table.scan(snapshot_id=version)

    def append(self, df: DataFrame) -> None:
        self.table.append(df, branch=self.branch)

    def overwrite(
        self, df: DataFrame, expect_current: int | None = None
    ) -> None:
        from iceberg_examples_spark.catalog import CommitConflictError

        meta, _ = self.table._read_tree()
        head = self._head(meta)
        if expect_current is not None and head != expect_current:
            raise CommitConflictError(
                f"table advanced to snapshot {head} "
                f"since snapshot {expect_current} was read; re-read and retry"
            )
        self._sync_schema(df)
        self.table._commit(
            df,
            operation="overwrite",
            first=False,
            replace=True,
            branch=self.branch,
        )

    # -- maintenance passthroughs (CALL procedures) ----------------------

    def compact(self) -> None:
        self.table.compact()

    def expire_snapshots(self, keep_last: int = 1):
        return self.table.expire_snapshots(keep_last=keep_last)

    def remove_orphans(self, older_than_s: float | None = None):
        return self.table.remove_orphan_files(older_than_s=older_than_s)

    # -- schema sync ------------------------------------------------------

    def _sync_schema(self, df: DataFrame) -> None:
        """Commit a schema matching ``df``'s column set before a
        rewrite, if it differs: names that persist keep their field id
        (bounds and old-file resolution stay valid), new names allocate
        fresh ids, spec-legal type changes keep the id as promotions."""
        meta, version = self.table._read_tree()
        cur = IcebergNativeTable._current_schema(meta)
        want = [(f.name, _spark_to_ice_type(f.dataType)) for f in df.schema.fields]
        if want == [(f["name"], f["type"]) for f in cur["fields"]]:
            return
        spec_sources = {
            pf["source-id"]
            for spec in meta["partition-specs"]
            for pf in spec["fields"]
        }
        by_name = {f["name"]: f for f in cur["fields"]}
        missing_spec_src = spec_sources - {
            by_name[n]["id"] for n, _ in want if n in by_name
        }
        if missing_spec_src:
            raise ValueError(
                "rewrite drops partition-spec source column(s) "
                f"(ids {sorted(missing_spec_src)})"
            )
        last = meta["last-column-id"]
        fields = []
        for name, ice_t in want:
            old = by_name.get(name)
            if old is not None and old["type"] == ice_t:
                fields.append(old)
            elif (
                old is not None
                and (old["type"], ice_t) in IcebergNativeTable._PROMOTIONS
            ):
                fields.append({**old, "type": ice_t})
            else:
                last += 1
                fields.append(
                    {"id": last, "name": name, "required": False, "type": ice_t}
                )
        new_id = max(s["schema-id"] for s in meta["schemas"]) + 1
        meta["schemas"].append(
            {"type": "struct", "schema-id": new_id, "fields": fields}
        )
        meta["current-schema-id"] = new_id
        meta["last-column-id"] = last
        self.table._publish_metadata(meta, version)


# ---------------------------------------------------------------------------
# declared query
# ---------------------------------------------------------------------------


def iceberg_native_sql_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE IcebergSQLMerge.java script (IcebergSQLMerge.java:17-92)
    replayed from literal statement text AGAINST THE NATIVE ICEBERG
    LAYOUT: CREATE, two INSERT ... selects, the explicit-columns MERGE,
    the star MERGE with an EXTRA source column before ADD COLUMN (extra
    ignored), ALTER TABLE ADD COLUMN, the same star MERGE again (now
    matching rows 4/5 and populating the new column), and the star
    MERGE with FEWER source columns (absent column null-filled). Every
    statement commits a real snapshot (Avro manifests + metadata.json);
    n_commits pins one snapshot per statement. The oracle is the
    closed-form final state the reference class prints."""
    from iceberg_examples_spark.catalog import scratch_dir
    from iceberg_examples_spark.sql_merge import execute_statement

    root = scratch_dir(sf_dir, "iceberg_native_sql_replay", fresh=True)
    t = IcebergNativeSqlTable(
        spark, os.path.join(root, f"t-{uuid.uuid4().hex[:8]}")
    )
    tables = {"default.test_table": t}
    merge1 = (
        "MERGE INTO default.test_table t USING ( "
        "SELECT 3 as customer_id, 'customer_c-insert(with merge sql)' as name, 'lastname-3-insert(with merge sql)' as lastname "
        "UNION ALL "
        "SELECT 2 as customer_id, 'customer_b-updated(with merge sql)' as name, 'lastname-2-updated(with merge sql)' as lastname "
        ") s ON s.customer_id = t.customer_id "
        "WHEN MATCHED THEN UPDATE SET t.name = s.name, t.lastname = s.lastname "
        "WHEN NOT MATCHED THEN INSERT(customer_id, name, lastname) "
        "VALUES(s.customer_id, s.name, s.lastname);"
    )
    mergev2 = (
        "MERGE INTO default.test_table t USING ( "
        "SELECT 4 as customer_id, 'customer_c-insert(with merge *)' as name, 'lastname-3-insert(with merge *)' as lastname, 'a@b.com' as email "
        "UNION ALL "
        "SELECT 5 as customer_id, 'customer_b-updated(with merge *)' as name, 'lastname-2-updated(with merge *)' as lastname, 'b@c.com' as email "
        ") s ON s.customer_id = t.customer_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *;"
    )
    mergev3 = (
        "MERGE INTO default.test_table t USING ( "
        "SELECT 6 as customer_id, 'customer_c-insert(with merge *)' as name, 'a@b.com' as email "
        "UNION ALL "
        "SELECT 7 as customer_id, 'customer_b-updated(with merge *)' as name, 'b@c.com' as email "
        ") s ON s.customer_id = t.customer_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *;"
    )
    stmts = [
        "CREATE TABLE default.test_table ("
        "    customer_id bigint COMMENT 'unique id',"
        "    name string, "
        "    lastname string "
        ") USING iceberg",
        "INSERT INTO default.test_table select 1, 'customer_a', 'lastname-1';",
        "INSERT INTO default.test_table select 2, 'customer_b', 'lastname-2';",
        merge1,
        mergev2,
        "ALTER TABLE default.test_table ADD COLUMN email string",
        mergev2,
        mergev3,
    ]
    for s in stmts:
        execute_statement(spark, s, tables)
    n_commits = len(t.table._metadata()["snapshots"])
    return (
        t.table.scan()
        .withColumn("n_commits", F.lit(n_commits).cast("long"))
        .orderBy("customer_id")
    )


def iceberg_wap_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish for DML, not just appends: the reference's
    MERGE statement (IcebergSQLMerge.java:39-47) executes through the
    statement executor against an 'audit' BRANCH of the native table —
    its snapshot is real (Avro manifests committed) but main readers
    still see the pre-merge state; after the audit passes,
    fast_forward('main', 'audit') publishes the merge atomically.
    n_main_before = 2 pins the isolation; the final rows pin the merge
    semantics; both ride one oracle."""
    from iceberg_examples_spark.catalog import scratch_dir
    from iceberg_examples_spark.sql_merge import execute_statement

    root = scratch_dir(sf_dir, "iceberg_wap_dml", fresh=True)
    loc = os.path.join(root, f"t-{uuid.uuid4().hex[:8]}")
    main = IcebergNativeSqlTable(spark, loc)
    tables = {"default.test_table": main}
    for s in [
        "CREATE TABLE default.test_table ("
        "    customer_id bigint, name string, lastname string "
        ") USING iceberg",
        "INSERT INTO default.test_table select 1, 'customer_a', 'lastname-1';",
        "INSERT INTO default.test_table select 2, 'customer_b', 'lastname-2';",
    ]:
        execute_statement(spark, s, tables)
    main.table.create_branch("audit")
    audit = IcebergNativeSqlTable(spark, loc, branch="audit")
    execute_statement(
        spark,
        "MERGE INTO default.test_table t USING ( "
        "SELECT 3 as customer_id, 'customer_c-insert(with merge sql)' as name, 'lastname-3-insert(with merge sql)' as lastname "
        "UNION ALL "
        "SELECT 2 as customer_id, 'customer_b-updated(with merge sql)' as name, 'lastname-2-updated(with merge sql)' as lastname "
        ") s ON s.customer_id = t.customer_id "
        "WHEN MATCHED THEN UPDATE SET t.name = s.name, t.lastname = s.lastname "
        "WHEN NOT MATCHED THEN INSERT(customer_id, name, lastname) "
        "VALUES(s.customer_id, s.name, s.lastname);",
        tables={"default.test_table": audit},
    )
    # audit invisible: 2 — manifest-statistics count, no scan job (§5)
    n_main_before = main.table.count_rows()
    main.table.fast_forward("main", "audit")
    return (
        main.table.scan()
        .withColumn("n_main_before", F.lit(n_main_before).cast("long"))
        .orderBy("customer_id")
    )
