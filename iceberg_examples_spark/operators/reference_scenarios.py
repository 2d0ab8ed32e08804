"""The reference's example scenarios as declared queries (SURVEY §2.7).

Each function replays one reference example end-to-end — build the example's
seed table(s) as in-memory DataFrames (deterministic literals cited from the
reference), apply the engine's mutation operators, return the final table
state. The DuckDB oracle (see ``iceberg_examples_spark/oracles.py``)
recomputes the same final state in pure ANSI SQL from the same literals, so
the driver's hash comparison verifies the merge algebra itself.

Fixture provenance:
- A1 test_table:        IcebergSQLMerge.java:17-24 / IcebergSQLDelete.java:17-27
- A2 cdc_table:         IcebergSQLMergeAsDeleteInsert.java:17-25
- A3 scd2 dim+staging:  IcebergSCD2.java:18-44
- A5 sample_json:       Setup.java:56-58, IcebergJavaApiUpsert.java:40-45,66-70
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_examples_spark.catalog import load_table
from iceberg_examples_spark.functions.exact import money_sum_sql
from iceberg_examples_spark.operators import mutations as M
from iceberg_examples_spark.sources.json_source import read_json_lines


def _d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


# ---------------------------------------------------------------- fixtures
A1_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("lastname", T.StringType()),
    ]
)


def a1_target(spark: SparkSession) -> DataFrame:
    """IcebergSQLMerge.java:23-24."""
    return spark.createDataFrame(
        [(1, "customer_a", "lastname-1"), (2, "customer_b", "lastname-2")],
        A1_SCHEMA,
    )


def a1_delete_seed(spark: SparkSession) -> DataFrame:
    """IcebergSQLDelete.java:23-27."""
    return spark.createDataFrame(
        [
            (1, "customer_a-V1", "ln1"),
            (1, "customer_a-V2", "ln2"),
            (1, "customer_a-V3", "ln3"),
            (1, "customer_a-V3", "ln4"),
            (2, "customer_b-V1", "ln5"),
        ],
        A1_SCHEMA,
    )


SCD2_DIM_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("current", T.BooleanType()),
        T.StructField("effective_date", T.DateType()),
        T.StructField("end_date", T.DateType()),
    ]
)

SCD2_STG_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("effective_date", T.DateType()),
    ]
)


def a3_dim(spark: SparkSession) -> DataFrame:
    """IcebergSCD2.java:26-31."""
    return spark.createDataFrame(
        [
            (1, "customer_a-V1", False, _d("2020-01-01"), _d("2020-01-12")),
            (1, "customer_a-V2", True, _d("2020-01-12"), _d("9999-12-31")),
            (2, "customer_b-V1", True, _d("2020-01-01"), _d("9999-12-31")),
        ],
        SCD2_DIM_SCHEMA,
    )


def a3_staging(spark: SparkSession) -> DataFrame:
    """IcebergSCD2.java:39-44."""
    return spark.createDataFrame(
        [
            (1, "customer_a-V3", _d("2020-02-15")),
            (2, "customer_b-V2", _d("2020-02-15")),
            (3, "customer_c-V1", _d("2020-02-15")),
        ],
        SCD2_STG_SCHEMA,
    )


CDC_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("record_change_timestamp", T.IntegerType()),
    ]
)


def a2_cdc_target(spark: SparkSession) -> DataFrame:
    """IcebergSQLMergeAsDeleteInsert.java:23-25."""
    return spark.createDataFrame(
        [(1, "customer_a", 1), (2, "customer_b", 1), (3, "customer_b", 2)],
        CDC_SCHEMA,
    )


def a2_cdc_source(spark: SparkSession) -> DataFrame:
    """IcebergSQLMergeAsDeleteInsert.java:33-39."""
    return spark.createDataFrame(
        [
            (1, "customer_c-insert(with merge sql)", 1),
            (2, "customer_b-updated(with merge sql)", 2),
            (3, "customer_b-updated(with merge sql)", 2),
        ],
        CDC_SCHEMA,
    )


# ------------------------------------------------------- declared queries

def merge_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — explicit-column MERGE upsert, IcebergSQLMerge.java:29-46."""
    target = a1_target(spark)
    source = spark.createDataFrame(
        [
            (3, "customer_c-insert(with merge sql)", "lastname-3-insert(with merge sql)"),
            (2, "customer_b-updated(with merge sql)", "lastname-2-updated(with merge sql)"),
        ],
        A1_SCHEMA,
    )
    return M.merge_upsert(target, source, ["customer_id"])


def merge_star_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 — the full schema-tolerant star-merge chain,
    IcebergSQLMerge.java:29-92: merge1 (explicit) → merge2 with EXTRA
    source column pre-evolution (extra col ignored; rows 4,5 insert) →
    ADD COLUMN email → merge2 again (4,5 now matched; email populated) →
    merge3 with MISSING source column (rows 6,7 insert, lastname null)."""
    state = merge_upsert_query(spark, sf_dir)

    star_schema = T.StructType(
        [
            T.StructField("customer_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("lastname", T.StringType()),
            T.StructField("email", T.StringType()),
        ]
    )
    merge2_src = spark.createDataFrame(
        [
            (4, "customer_c-insert(with merge *)", "lastname-3-insert(with merge *)", "a@b.com"),
            (5, "customer_b-updated(with merge *)", "lastname-2-updated(with merge *)", "b@c.com"),
        ],
        star_schema,
    )
    state = M.merge_star(state, merge2_src, ["customer_id"])  # email ignored
    state = M.evolve_add_column(state, "email", "string")  # ALTER TABLE ADD COLUMN
    state = M.merge_star(state, merge2_src, ["customer_id"])  # email now lands

    merge3_schema = T.StructType(
        [
            T.StructField("customer_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
        ]
    )
    merge3_src = spark.createDataFrame(
        [
            (6, "customer_c-insert(with merge *)", "a@b.com"),
            (7, "customer_b-updated(with merge *)", "b@c.com"),
        ],
        merge3_schema,
    )
    return M.merge_star(state, merge3_src, ["customer_id"])


def merge_cdc_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — conditional merge with monotonic-timestamp guard,
    IcebergSQLMergeAsDeleteInsert.java:30-50 (key 1 must NOT update)."""
    return M.merge_upsert(
        a2_cdc_target(spark),
        a2_cdc_source(spark),
        ["customer_id"],
        matched_condition=F.col("t.record_change_timestamp")
        < F.col("s.record_change_timestamp"),
    )


def scd2_final_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — SCD2 single-merge, IcebergSCD2.java:51-68. Expected final
    state: 6 rows (old current rows closed at 2020-02-15, three new
    current rows open to 9999-12-31)."""
    return M.scd2_merge(a3_dim(spark), a3_staging(spark), key="customer_id")


def delete_pred_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 — DELETE with conjunctive predicate, IcebergSQLDelete.java:32."""
    seed = a1_delete_seed(spark)
    return M.delete_where(
        seed, (F.col("customer_id") == 1) & (F.col("name") == "customer_a-V3")
    )


def schema_evolution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — ADD COLUMN then DROP COLUMN on live data,
    IcebergSQLMerge.java:69 + IcebergSQLDelete.java:35."""
    state = a1_target(spark)
    state = M.evolve_add_column(state, "email", "string")
    return M.evolve_drop_column(state, "lastname")


def upsert_by_key_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — equality-delete upsert, IcebergJavaApiUpsert.java:66-115 flow:
    SQL INSERT (10,'spark sql-insert') → DataFrame append of the inferred
    JSON sample (Setup.java:56-58) → Java-API append of (29,a),(43,b) →
    equality-delete upsert keyed on ``name`` to (129,a),(123,b)."""
    schema = T.StructType(
        [
            T.StructField("age", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    table = spark.createDataFrame([(10, "spark sql-insert")], schema)
    sample = read_json_lines(spark).select("age", "name")
    table = table.unionByName(sample)
    table = table.unionByName(
        spark.createDataFrame(
            [(29, "JavaAPI User-a"), (43, "JavaAPI User-b")], schema
        )
    )
    changes = spark.createDataFrame(
        [(129, "JavaAPI User-a"), (123, "JavaAPI User-b")], schema
    )
    return M.upsert_by_key(table, changes, ["name"])


def json_infer_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — JSON schema inference, Setup.java:56-60."""
    return read_json_lines(spark)


def merge_upsert_scale_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The M1/M7 mutation algebra at DATA scale (the reference's literal
    seeds prove semantics; this proves the same `upsert_by_key` holds on
    the sf-sized fact table): change batch = every 10th order (md5-hash
    selected, deterministic) with its totalprice bumped, plus a disjoint
    band of brand-new orders (o_orderkey + 10_000_000). Final state =
    anti-join + union — one broadcast anti join of the target when the
    batch is small, exactly the 100 TB merge-on-read posture.

    Output: per-status row count + exact totalprice sum of the final
    state (the full post-merge table is sf-sized — the declared result
    aggregates it so the driver compare stays bounded)."""
    from iceberg_examples_spark.functions.texthash import md5_int_hash

    orders = load_table(spark, sf_dir, "orders")
    h = md5_int_hash("cast(o_orderkey as string)")
    updates = orders.filter(F.expr(f"({h}) % 10 = 0")).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    # new keys = -(k+1): the negative keyspace is disjoint from the
    # non-negative real keys at EVERY scale factor (a fixed +N offset
    # would silently collide once the key domain outgrows N, turning
    # inserts into deletes-and-replaces)
    inserts = orders.filter(F.expr(f"({h}) % 10 = 1")).withColumn(
        "o_orderkey", -(F.col("o_orderkey") + F.lit(1))
    )
    changes = updates.unionByName(inserts)
    final = M.upsert_by_key(orders, changes, keys=["o_orderkey"])
    return final.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(money_sum_sql("o_totalprice", scale=100)).alias("total"),
    )


def merge_sql_exec_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 via SQL-TEXT EXECUTION: the reference's literal MERGE statement
    (IcebergSQLMerge.java:29-46 — the same text the golden suite pins
    byte-equivalent via compile_merge_explicit) parsed, validated
    against Spark's own parser, and EXECUTED against a snapshot-
    committing LocalTable by the connector-less MERGE executor
    (sql_merge.execute_merge). Where merge_upsert verifies the algebraic
    path, this query verifies the full SQL path: text → parse →
    clause semantics → snapshot commit — the closest an offline
    environment gets to the Iceberg executor hop, and hash-checked
    against the identical closed-form oracle."""
    import os
    import shutil
    import uuid

    from iceberg_examples_spark.catalog import LocalTable, scratch_dir
    from iceberg_examples_spark.sources.iceberg_compat import (
        compile_merge_explicit,
    )
    from iceberg_examples_spark.sql_merge import execute_merge

    root = scratch_dir(sf_dir, "merge_sql_exec", fresh=True)
    table = LocalTable(spark, os.path.join(root, f"t-{uuid.uuid4().hex[:8]}"))
    table.create(a1_target(spark))
    src = (
        "(SELECT 3 as customer_id, "
        "'customer_c-insert(with merge sql)' as name, "
        "'lastname-3-insert(with merge sql)' as lastname "
        "UNION ALL "
        "SELECT 2 as customer_id, "
        "'customer_b-updated(with merge sql)' as name, "
        "'lastname-2-updated(with merge sql)' as lastname)"
    )
    stmt = compile_merge_explicit(
        "default.test_table",
        src,
        keys=["customer_id"],
        update_cols=["name", "lastname"],
        insert_cols=["customer_id", "name", "lastname"],
    )
    execute_merge(spark, stmt, {"default.test_table": table})
    rows = table.read().collect()
    out = spark.createDataFrame(rows, table.read().schema)
    shutil.rmtree(root, ignore_errors=True)
    return out


def sql_script_replay_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IcebergSQLDelete.java replayed from STATEMENT TEXT under the
    driver gate: CREATE → INSERT VALUES → DELETE WHERE → DROP COLUMN
    through sql_merge.execute_statement, one snapshot per statement.
    Output: the final table rows plus the snapshot version each row's
    state reflects — so the oracle pins both the end state AND that the
    script produced exactly four commits (v0..v3)."""
    import os
    import shutil
    import uuid

    from iceberg_examples_spark.catalog import LocalTable, scratch_dir
    from iceberg_examples_spark.sources.iceberg_compat import (
        compile_delete,
        compile_drop_column,
    )
    from iceberg_examples_spark.sql_merge import execute_statement

    root = scratch_dir(sf_dir, "sql_script_replay", fresh=True)
    table = LocalTable(spark, os.path.join(root, f"t-{uuid.uuid4().hex[:8]}"))
    tables = {"default.test_table": table}
    stmts = [
        """CREATE TABLE default.test_table (
               customer_id bigint COMMENT 'unique id',
               name string,
               lastname string
           ) USING iceberg""",
        "INSERT INTO default.test_table VALUES "
        "(1, 'customer_a-V3', 'lastname-a'), "
        "(2, 'customer_b', 'lastname-b'), "
        "(3, 'customer_c', 'lastname-c')",
        compile_delete(
            "default.test_table", "customer_id=1 AND name='customer_a-V3'"
        ),
        compile_drop_column("default.test_table", "lastname"),
    ]
    for stmt in stmts:
        execute_statement(spark, stmt, tables)
    version = table.current_version
    rows = table.read().collect()
    out = spark.createDataFrame(
        [(r["customer_id"], r["name"], version) for r in rows],
        "customer_id long, name string, final_version long",
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def scd2_sql_exec_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 via SQL-TEXT EXECUTION: the reference's verbatim SCD2 MERGE
    (IcebergSCD2.java:51-68 — the golden-pinned statement produced by
    compile_scd2_merge: nested subquery source with a self-join against
    the target) executed by the connector-less MERGE executor; the final
    dimension state must hash against the same closed-form oracle that
    verifies the algebraic scd2 path (scd2_final)."""
    import os
    import shutil
    import uuid

    from iceberg_examples_spark.catalog import LocalTable, scratch_dir
    from iceberg_examples_spark.sources.iceberg_compat import (
        compile_scd2_merge,
    )
    from iceberg_examples_spark.sql_merge import execute_merge

    root = scratch_dir(sf_dir, "scd2_sql_exec", fresh=True)
    tag = uuid.uuid4().hex[:8]
    table = LocalTable(spark, os.path.join(root, f"t-{tag}"))
    table.create(a3_dim(spark))
    a3_staging(spark).createOrReplaceTempView(f"scd2_stg_{tag}")
    table.read().createOrReplaceTempView(f"scd2_tgt_{tag}")
    stmt = compile_scd2_merge(
        "default.scd2_table",
        "default.stg_scd2_table",
        key="customer_id",
        attr_cols=["name"],
    )
    execute_merge(
        spark,
        stmt,
        {"default.scd2_table": table},
        name_map={
            "default.stg_scd2_table": f"scd2_stg_{tag}",
            "default.scd2_table": f"scd2_tgt_{tag}",
        },
    )
    rows = table.read().collect()
    out = spark.createDataFrame(rows, table.read().schema)
    shutil.rmtree(root, ignore_errors=True)
    return out


def merge_by_source_exec_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL-SYNC MERGE shape through the SQL-text executor: WHEN
    MATCHED update + WHEN NOT MATCHED insert + WHEN NOT MATCHED BY
    SOURCE conditional-delete/update — the one MERGE clause family the
    reference's statements don't exercise but Spark's grammar (and any
    Iceberg user mirroring a dimension from a feed) does. Target =
    customers with c_custkey%10 < 5; source = custkey%10 in [3,7] with
    upper-cased names; rows matched update, new source rows insert,
    target rows that left the feed are deleted when custkey%3=0 and
    marked 'retired:' otherwise. Unlike the 2-6-row reference fixtures
    this runs at sf scale, so the by-source branch is exercised on
    thousands of rows, and the oracle recomputes the final state as a
    three-way UNION in DuckDB."""
    import os
    import shutil
    import uuid

    from iceberg_examples_spark.catalog import LocalTable, scratch_dir
    from iceberg_examples_spark.operators.relational import load_table
    from iceberg_examples_spark.sql_merge import execute_merge

    cust = load_table(spark, sf_dir, "customer")
    target = cust.filter(F.col("c_custkey") % 10 < 5).select(
        F.col("c_custkey").cast("long").alias("k"),
        F.col("c_name").alias("v"),
    )
    tag = uuid.uuid4().hex[:8]
    cust.filter(
        (F.col("c_custkey") % 10 >= 3) & (F.col("c_custkey") % 10 <= 7)
    ).select(
        F.col("c_custkey").cast("long").alias("k"),
        F.upper(F.col("c_name")).alias("v"),
    ).createOrReplaceTempView(f"bysrc_feed_{tag}")

    root = scratch_dir(sf_dir, "merge_by_source_exec", fresh=True)
    table = LocalTable(spark, os.path.join(root, f"t-{tag}"))
    table.create(target)
    stmt = (
        f"MERGE INTO default.sync_table t USING bysrc_feed_{tag} s "
        "ON s.k = t.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v) "
        "WHEN NOT MATCHED BY SOURCE AND t.k % 3 = 0 THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN "
        "UPDATE SET t.v = concat('retired:', t.v);"
    )
    execute_merge(spark, stmt, {"default.sync_table": table})
    # materialize JVM-side (staged parquet) so the scratch table can be
    # removed — the result is sf-scale (thousands of rows), so it must
    # NOT round-trip through the driver
    from iceberg_examples_spark.checkpointing import stage

    res = stage(table.read(), "bysrc-result")
    shutil.rmtree(root, ignore_errors=True)
    return res


def sql_lifecycle_replay_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table LIFECYCLE verbs the round-7 statement executor added,
    replayed as one script at sf scale: CTAS from the customer table,
    a predicated UPDATE, RENAME COLUMN, a lossless ALTER COLUMN TYPE
    widening (int -> bigint), and a predicated DELETE — one snapshot per
    statement (final_version pins the commit count), final state
    hash-checked against a DuckDB oracle that recomputes every step
    relationally. Extends sql_script_replay (the verbatim
    IcebergSQLDelete class) to the full Iceberg DML/DDL verb set."""
    import os
    import shutil
    import uuid

    from iceberg_examples_spark.catalog import LocalTable, scratch_dir
    from iceberg_examples_spark.operators.relational import load_table
    from iceberg_examples_spark.sql_merge import execute_statement

    tag = uuid.uuid4().hex[:8]
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        f"lc_customer_{tag}"
    )
    root = scratch_dir(sf_dir, "sql_lifecycle_replay", fresh=True)
    table = LocalTable(spark, os.path.join(root, f"t-{tag}"))
    tables = {"default.lc_table": table}
    stmts = [
        "CREATE TABLE default.lc_table USING iceberg AS "
        "SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS v, "
        "CAST(c_nationkey AS INT) AS n "
        f"FROM customer WHERE c_custkey % 7 < 5;",
        "UPDATE default.lc_table SET v = concat(v, ':flagged') "
        "WHERE n > 12;",
        "ALTER TABLE default.lc_table RENAME COLUMN v TO label;",
        "ALTER TABLE default.lc_table ALTER COLUMN n TYPE bigint;",
        "DELETE FROM default.lc_table WHERE k % 3 = 0;",
    ]
    for stmt in stmts:
        execute_statement(
            spark, stmt, tables, name_map={"customer": f"lc_customer_{tag}"}
        )
    version = table.current_version
    out = table.read().withColumn(
        "final_version", F.lit(version).cast("bigint")
    )
    # materialize JVM-side (staged parquet) so the scratch table can be
    # removed — sf-scale result, no driver round-trip
    from iceberg_examples_spark.checkpointing import stage

    res = stage(out, "lifecycle-result")
    shutil.rmtree(root, ignore_errors=True)
    return res
