"""The connector-less MERGE executor runs the REFERENCE'S LITERAL SQL.

Each test takes a statement the golden suite pins as byte-equivalent to
the reference's Java source, executes it with sql_merge.execute_merge
against snapshot-committing LocalTables, and compares the final table
state with the DataFrame-algebra mutation path (operators/mutations.py)
that the driver gate hash-verifies — so SQL-text execution and the
algebraic path are proven observably identical, which is exactly the
equivalence DESIGN.md has claimed since round 1.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import LocalTable
from iceberg_examples_spark.sources import iceberg_compat as IC
from iceberg_examples_spark.sql_merge import (
    execute_merge,
    parse_merge,
    spark_validates,
)
from tests.test_iceberg_sql_golden import (
    REF_MERGE_EXPLICIT,
    REF_MERGE_STAR,
    REF_SCD2_MERGE,
)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_reference_merge_explicit_executes(spark, tmp_path):
    from iceberg_examples_spark.operators.reference_scenarios import (
        A1_SCHEMA,
    )

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "c1", "l1"), (2, "c2", "l2")], A1_SCHEMA
        )
    )
    execute_merge(
        spark, REF_MERGE_EXPLICIT, {"default.test_table": t}
    )
    assert rows(t.read()) == sorted(
        [
            (1, "c1", "l1"),
            (2, "c-updated", "l-updated"),
            (3, "c-insert", "l-insert"),
        ]
    )


def test_reference_merge_star_executes(spark, tmp_path):
    from iceberg_examples_spark.operators.mutations import merge_star
    from iceberg_examples_spark.operators.reference_scenarios import (
        A1_SCHEMA,
    )

    t = LocalTable(spark, str(tmp_path / "t"))
    initial = spark.createDataFrame(
        [(1, "c1", "l1"), (2, "c2", "l2")], A1_SCHEMA
    )
    t.create(initial)
    src = spark.createDataFrame(
        [(2, "c2x", "l2x"), (9, "c9", "l9")], A1_SCHEMA
    )
    src.createOrReplaceTempView("ref_star_src")
    stmt = REF_MERGE_STAR.replace("USING src s", "USING ref_star_src s")
    execute_merge(spark, stmt, {"default.test_table": t})
    # algebraic twin on the same inputs
    expected = merge_star(initial, src, ["customer_id"])
    assert rows(t.read()) == rows(expected)


def test_reference_scd2_merge_executes(spark, tmp_path):
    from iceberg_examples_spark.operators.mutations import scd2_merge
    from iceberg_examples_spark.operators.reference_scenarios import (
        a3_dim,
        a3_staging,
    )

    t = LocalTable(spark, str(tmp_path / "t"))
    dim = a3_dim(spark)
    t.create(dim)
    staging = a3_staging(spark)
    staging.createOrReplaceTempView("ref_scd2_staging")
    t.read().createOrReplaceTempView("ref_scd2_target")
    execute_merge(
        spark,
        REF_SCD2_MERGE,
        {"default.scd2_table": t},
        name_map={
            "default.stg_scd2_table": "ref_scd2_staging",
            "default.scd2_table": "ref_scd2_target",
        },
    )
    expected = scd2_merge(dim, staging, key="customer_id")
    got = t.read().select(*expected.columns)
    assert rows(got) == rows(expected)


def test_conditional_cdc_merge_executes(spark, tmp_path):
    """The CDC guard (WHEN MATCHED AND s.ts > t.ts) — compiled by
    compile_merge_star's matched_condition — must leave stale rows
    untouched."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "old", 10), (2, "old", 10)], "k long, v string, ts long"
        )
    )
    spark.createDataFrame(
        [(1, "stale", 5), (2, "fresh", 20), (3, "new", 1)],
        "k long, v string, ts long",
    ).createOrReplaceTempView("cdc_src")
    stmt = IC.compile_merge_star(
        "default.t", "cdc_src", ["k"], matched_condition="s.ts > t.ts"
    )
    execute_merge(spark, stmt, {"default.t": t})
    assert rows(t.read()) == sorted(
        [(1, "old", 10), (2, "fresh", 20), (3, "new", 1)]
    )


def test_matched_delete_executes(spark, tmp_path):
    """WHEN MATCHED THEN DELETE (IcebergSQLMergeAsDeleteInsert's
    delete-shape): matched keys vanish, unmatched survive."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
    )
    spark.createDataFrame(
        [(2,)], "k long"
    ).createOrReplaceTempView("del_src")
    stmt = (
        "MERGE INTO default.t t USING del_src s ON s.k = t.k "
        "WHEN MATCHED THEN DELETE;"
    )
    execute_merge(spark, stmt, {"default.t": t})
    assert rows(t.read()) == sorted([(1, "a"), (3, "c")])


def test_cardinality_violation_raises(spark, tmp_path):
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    spark.createDataFrame(
        [(1, "x"), (1, "y")], "k long, v string"
    ).createOrReplaceTempView("dup_src")
    stmt = (
        "MERGE INTO default.t t USING dup_src s ON s.k = t.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v;"
    )
    with pytest.raises(ValueError, match="cardinality"):
        execute_merge(spark, stmt, {"default.t": t})


def test_rejects_what_spark_rejects(spark):
    assert not spark_validates(spark, "MERGE INTO t USING s ON WHEN")
    with pytest.raises(ValueError):
        parse_merge("SELECT 1")


def test_reference_delete_class_replays(spark, tmp_path):
    """IcebergSQLDelete.java end-to-end from statement TEXT: CREATE →
    INSERT seed rows → DELETE WHERE → DROP COLUMN, all through
    execute_statement — the reference class as a replayable script."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    tables = {"default.test_table": t}
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
        IC.compile_delete(
            "default.test_table", "customer_id=1 AND name='customer_a-V3'"
        ),
        IC.compile_drop_column("default.test_table", "lastname"),
    ]
    for stmt in stmts:
        execute_statement(spark, stmt, tables)
    assert rows(t.read()) == sorted(
        [(2, "customer_b"), (3, "customer_c")]
    )
    # one snapshot per statement (create=v0 .. drop-column=v3) — time
    # travel over the script's history, the lakehouse contract
    assert t.current_version == 3


def test_update_assignment_can_reference_target(spark, tmp_path):
    """Assignments mixing both sides (t.v + s.v) evaluate in the joined
    row context."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    spark.createDataFrame(
        [(1, 5)], "k long, v long"
    ).createOrReplaceTempView("mix_src")
    stmt = (
        "MERGE INTO default.t t USING mix_src s ON s.k = t.k "
        "WHEN MATCHED THEN UPDATE SET t.v = t.v + s.v;"
    )
    execute_statement(spark, stmt, {"default.t": t})
    assert rows(t.read()) == sorted([(1, 15), (2, 20)])


def test_not_matched_only_merge_appends(spark, tmp_path):
    """A MERGE with only WHEN NOT MATCHED leaves matched targets
    untouched and appends the rest (the append-dedup idiom)."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    spark.createDataFrame(
        [(1, "dup"), (2, "new")], "k long, v string"
    ).createOrReplaceTempView("nm_src")
    stmt = (
        "MERGE INTO default.t t USING nm_src s ON s.k = t.k "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v);"
    )
    execute_statement(spark, stmt, {"default.t": t})
    assert rows(t.read()) == sorted([(1, "a"), (2, "new")])


def test_name_map_respects_word_boundaries(spark, tmp_path):
    """Mapping default.t must not rewrite default.t2 inside the source
    subquery."""
    from iceberg_examples_spark.sql_merge import execute_merge

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    spark.createDataFrame(
        [(2, "b")], "k long, v string"
    ).createOrReplaceTempView("view_t2")
    stmt = (
        "MERGE INTO default.t t "
        "USING (SELECT k, v FROM default.t2) s ON s.k = t.k "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v);"
    )
    execute_merge(
        spark,
        stmt,
        {"default.t": t},
        # default.t maps to something bogus; default.t2 to the real view —
        # a prefix-greedy rewrite would corrupt default.t2 first
        name_map={"default.t": "does_not_exist", "default.t2": "view_t2"},
    )
    assert rows(t.read()) == sorted([(1, "a"), (2, "b")])


def test_parse_roundtrips_compiled_statements(spark):
    """Property-ish: every merge the compiler can emit must parse back
    to the spec that generated it (keys/aliases/clauses), across a grid
    of key and column shapes."""
    from iceberg_examples_spark.sql_merge import parse_merge

    for keys in (["k"], ["k1", "k2"]):
        for update_cols in (["v"], ["v", "w"]):
            stmt = IC.compile_merge_explicit(
                "db.tgt",
                "(SELECT 1 as k, 1 as k1, 1 as k2, 'x' as v, 'y' as w)",
                keys=keys,
                update_cols=update_cols,
                insert_cols=keys + update_cols,
            )
            assert spark_validates(spark, stmt), stmt
            spec = parse_merge(stmt)
            assert spec.target == "db.tgt"
            assert [c for c in spec.matched if c.action == "update"]
            upd = spec.matched[0]
            assert set(upd.assignments) == set(update_cols)
            assert spec.insert_cols == keys + update_cols
            # ON covers every key
            for k in keys:
                assert f"s.{k} = t.{k}" in spec.on

    star = IC.compile_merge_star("db.tgt", "srcview", ["k"])
    spec = parse_merge(star)
    assert spec.matched[0].star and spec.insert_star
    assert not spec.source_is_subquery and spec.source_sql == "srcview"

def test_delete_null_predicate_keeps_row(spark, tmp_path):
    """DELETE FROM t WHERE pred removes only rows where pred is TRUE;
    a row where the predicate evaluates to NULL (x > 5 with x NULL) is
    KEPT — SQL three-valued logic, the Spark/Iceberg DELETE contract."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, 10), (2, 3), (3, None)], "k long, x long"
        )
    )
    execute_statement(
        spark, "DELETE FROM default.t WHERE x > 5;", {"default.t": t}
    )
    assert rows(t.read()) == sorted([(2, 3), (3, None)])


def test_matched_clause_null_condition_is_not_satisfied(spark, tmp_path):
    """A WHEN MATCHED clause condition that evaluates to NULL counts as
    NOT satisfied: the row must not be deleted by a NULL-condition
    DELETE clause, and a later unconditional clause must still fire
    (NULL must not poison the first-satisfied-clause accumulator)."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "old", None), (2, "old", 10)], "k long, v string, ts long"
        )
    )
    spark.createDataFrame(
        [(1, "upd", 5), (2, "upd", 5)], "k long, v string, ts long"
    ).createOrReplaceTempView("nullcond_src")
    stmt = (
        "MERGE INTO default.t t USING nullcond_src s ON s.k = t.k "
        "WHEN MATCHED AND s.ts > t.ts THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v;"
    )
    execute_merge(spark, stmt, {"default.t": t})
    # k=1: s.ts > t.ts is NULL -> delete NOT satisfied, update fires;
    # k=2: 5 > 10 false -> delete not satisfied, update fires
    assert rows(t.read()) == sorted([(1, "upd", None), (2, "upd", 10)])


def test_null_update_condition_leaves_row_unchanged(spark, tmp_path):
    """With ONLY a conditional UPDATE clause, a NULL condition leaves
    the matched row exactly as it was (kept, not updated)."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "old", None)], "k long, v string, ts long"
        )
    )
    spark.createDataFrame(
        [(1, "upd", 5)], "k long, v string, ts long"
    ).createOrReplaceTempView("nullupd_src")
    stmt = (
        "MERGE INTO default.t t USING nullupd_src s ON s.k = t.k "
        "WHEN MATCHED AND s.ts > t.ts THEN UPDATE SET t.v = s.v;"
    )
    execute_merge(spark, stmt, {"default.t": t})
    assert rows(t.read()) == [(1, "old", None)]


def test_insert_only_merge_tolerates_duplicate_matches(spark, tmp_path):
    """Spark/Iceberg raise MERGE_CARDINALITY_VIOLATION only when WHEN
    MATCHED clauses exist; an insert-only merge with duplicate source
    matches is legal (matched duplicates insert nothing)."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k long, v string"
    ).createOrReplaceTempView("insonly_src")
    stmt = (
        "MERGE INTO default.t t USING insonly_src s ON s.k = t.k "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v);"
    )
    execute_merge(spark, stmt, {"default.t": t})
    assert rows(t.read()) == sorted([(1, "a"), (2, "z")])

def test_not_matched_by_source_delete(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: target rows absent from
    the source vanish (the full-sync MERGE shape); matched rows update."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
    )
    spark.createDataFrame(
        [(2, "b2"), (4, "d")], "k long, v string"
    ).createOrReplaceTempView("bys_src")
    stmt = (
        "MERGE INTO default.t t USING bys_src s ON s.k = t.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v) "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE;"
    )
    execute_merge(spark, stmt, {"default.t": t})
    assert rows(t.read()) == sorted([(2, "b2"), (4, "d")])


def test_not_matched_by_source_conditional_update(spark, tmp_path):
    """BY SOURCE conditional UPDATE: only unmatched target rows whose
    condition is TRUE change; NULL-evaluating conditions keep the row
    unchanged (three-valued logic, same rule as MATCHED clauses)."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "a", 5), (2, "b", None), (3, "c", 0)],
            "k long, v string, ts long",
        )
    )
    spark.createDataFrame(
        [(3, "c3", 9)], "k long, v string, ts long"
    ).createOrReplaceTempView("bys_cond_src")
    stmt = (
        "MERGE INTO default.t t USING bys_cond_src s ON s.k = t.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v, t.ts = s.ts "
        "WHEN NOT MATCHED BY SOURCE AND t.ts > 1 THEN "
        "UPDATE SET t.v = 'stale';"
    )
    execute_merge(spark, stmt, {"default.t": t})
    # k=1: unmatched, ts=5>1 -> 'stale'; k=2: NULL ts -> unchanged;
    # k=3: matched -> updated from source
    assert rows(t.read()) == sorted(
        [(1, "stale", 5), (2, "b", None), (3, "c3", 9)]
    )


def test_by_source_only_merge_tolerates_duplicate_matches(spark, tmp_path):
    """With ONLY by-source clauses no cardinality check runs (matched
    rows aren't touched); a target row matched by two source rows must
    still appear exactly once, unchanged."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame([(1, "a"), (9, "z")], "k long, v string")
    )
    spark.createDataFrame(
        [(1, "x"), (1, "y")], "k long, v string"
    ).createOrReplaceTempView("bys_dup_src")
    stmt = (
        "MERGE INTO default.t t USING bys_dup_src s ON s.k = t.k "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE;"
    )
    execute_merge(spark, stmt, {"default.t": t})
    assert rows(t.read()) == [(1, "a")]


def test_by_source_star_update_rejected(spark):
    with pytest.raises(ValueError, match="explicit"):
        parse_merge(
            "MERGE INTO default.t t USING src s ON s.k = t.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *;"
        )

def test_reference_scd2_class_replays_from_text(spark, tmp_path):
    """The WHOLE IcebergSCD2.java script (IcebergSCD2.java:18-68)
    replayed from literal statement text: two CREATEs, six
    INSERT INTO ... select statements (the reference's literal-select
    insert shape, now supported by execute_statement), then the
    golden-pinned SCD2 MERGE — final dimension state must equal the
    hand-derived SCD2 semantics."""
    import datetime

    from iceberg_examples_spark.sql_merge import execute_statement

    scd2 = LocalTable(spark, str(tmp_path / "scd2"))
    stg = LocalTable(spark, str(tmp_path / "stg"))
    tables = {
        "default.scd2_table": scd2,
        "default.stg_scd2_table": stg,
    }
    stmts = [
        "CREATE TABLE default.scd2_table ("
        "    customer_id bigint COMMENT 'unique id',"
        "    name string ,"
        "    current boolean,"
        "    effective_date date,"
        "    end_date date"
        ") USING iceberg",
        "INSERT INTO default.scd2_table "
        "select 1, 'customer_a-V1', false, to_date('2020-01-01', 'yyyy-MM-dd'), to_date('2020-01-12', 'yyyy-MM-dd');",
        "INSERT INTO default.scd2_table "
        "select 1, 'customer_a-V2', true, to_date('2020-01-12', 'yyyy-MM-dd'), to_date('9999-12-31', 'yyyy-MM-dd');",
        "INSERT INTO default.scd2_table "
        "select 2, 'customer_b-V1', true, to_date('2020-01-01', 'yyyy-MM-dd'), to_date('9999-12-31', 'yyyy-MM-dd');",
        "CREATE TABLE default.stg_scd2_table ("
        "    customer_id bigint COMMENT 'unique id',"
        "    name string ,"
        "    effective_date date"
        ") USING iceberg",
        "INSERT INTO default.stg_scd2_table "
        "select 1, 'customer_a-V3', to_date('2020-02-15', 'yyyy-MM-dd');",
        "INSERT INTO default.stg_scd2_table "
        "select 2, 'customer_b-V2', to_date('2020-02-15', 'yyyy-MM-dd');",
        "INSERT INTO default.stg_scd2_table "
        "select 3, 'customer_c-V1', to_date('2020-02-15', 'yyyy-MM-dd');",
    ]
    for s in stmts:
        execute_statement(spark, s, tables)

    scd2.read().createOrReplaceTempView("replay_scd2_tgt")
    stg.read().createOrReplaceTempView("replay_scd2_stg")
    execute_statement(
        spark,
        REF_SCD2_MERGE,
        tables,
        name_map={
            "default.stg_scd2_table": "replay_scd2_stg",
            "default.scd2_table": "replay_scd2_tgt",
        },
    )
    d = datetime.date.fromisoformat
    assert rows(scd2.read()) == sorted(
        [
            (1, "customer_a-V1", False, d("2020-01-01"), d("2020-01-12")),
            (1, "customer_a-V2", False, d("2020-01-12"), d("2020-02-15")),
            (1, "customer_a-V3", True, d("2020-02-15"), d("9999-12-31")),
            (2, "customer_b-V1", False, d("2020-01-01"), d("2020-02-15")),
            (2, "customer_b-V2", True, d("2020-02-15"), d("9999-12-31")),
            (3, "customer_c-V1", True, d("2020-02-15"), d("9999-12-31")),
        ]
    )
    # one snapshot per statement: 1 create + 3 inserts + the merge
    assert scd2.current_version == 4
    assert stg.current_version == 3

def test_reference_sqlmerge_class_replays_from_text(spark, tmp_path):
    """The WHOLE IcebergSQLMerge.java script (IcebergSQLMerge.java:17-92)
    replayed from literal statement text: CREATE, two INSERT ... selects,
    the explicit-columns MERGE, the star MERGE with an EXTRA source
    column before ADD COLUMN (extra ignored), ALTER TABLE ADD COLUMN,
    the same star MERGE again (now matching rows 4/5 and populating the
    new column), and the star MERGE with FEWER source columns (absent
    target column null-filled on insert)."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
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
    assert rows(t.read()) == sorted(
        [
            (1, "customer_a", "lastname-1", None),
            (2, "customer_b-updated(with merge sql)",
             "lastname-2-updated(with merge sql)", None),
            (3, "customer_c-insert(with merge sql)",
             "lastname-3-insert(with merge sql)", None),
            (4, "customer_c-insert(with merge *)",
             "lastname-3-insert(with merge *)", "a@b.com"),
            (5, "customer_b-updated(with merge *)",
             "lastname-2-updated(with merge *)", "b@c.com"),
            (6, "customer_c-insert(with merge *)", None, "a@b.com"),
            (7, "customer_b-updated(with merge *)", None, "b@c.com"),
        ]
    )
    assert t.current_version == 7  # one snapshot per statement


def test_reference_cdc_class_replays_from_text(spark, tmp_path):
    """IcebergSQLMergeAsDeleteInsert.java:17-50 replayed from text: the
    conditional CDC guard leaves stale rows (t.ts >= s.ts) untouched."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    tables = {"default.test_table": t}
    merge = (
        "MERGE INTO default.test_table t USING ( "
        "SELECT 1 as customer_id, 'customer_c-insert(with merge sql)' as name, 1 as record_change_timestamp "
        "UNION ALL "
        "SELECT 2 as customer_id, 'customer_b-updated(with merge sql)' as name, 2 as record_change_timestamp "
        "UNION ALL "
        "SELECT 3 as customer_id, 'customer_b-updated(with merge sql)' as name, 2 as record_change_timestamp "
        ") s ON s.customer_id = t.customer_id "
        "WHEN MATCHED and t.record_change_timestamp < s.record_change_timestamp "
        "THEN UPDATE SET t.name = s.name, t.record_change_timestamp = s.record_change_timestamp "
        "WHEN NOT MATCHED THEN INSERT(customer_id, name, record_change_timestamp) "
        "VALUES(s.customer_id, s.name, s.record_change_timestamp);"
    )
    stmts = [
        "CREATE TABLE default.test_table ("
        "    customer_id bigint COMMENT 'unique id',"
        "    name string, "
        "    record_change_timestamp integer "
        ") USING iceberg",
        "INSERT INTO default.test_table select 1, 'customer_a', 1;",
        "INSERT INTO default.test_table select 2, 'customer_b', 1;",
        "INSERT INTO default.test_table select 3, 'customer_b', 2;",
        merge,
    ]
    for s in stmts:
        execute_statement(spark, s, tables)
    assert rows(t.read()) == sorted(
        [
            (1, "customer_a", 1),
            (2, "customer_b-updated(with merge sql)", 2),
            (3, "customer_b", 2),
        ]
    )
    assert t.current_version == 4

def test_update_statement_executes(spark, tmp_path):
    """UPDATE t SET ... WHERE pred: TRUE rows rewritten (expressions may
    reference the row's own prior values), FALSE and NULL-evaluating
    rows untouched; one snapshot commit."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 3), (3, "c", None)],
            "k long, v string, ts long",
        )
    )
    v0 = t.current_version
    execute_statement(
        spark,
        "UPDATE default.t SET v = concat(v, '-hot'), ts = ts + 1 "
        "WHERE ts > 5;",
        {"default.t": t},
    )
    assert rows(t.read()) == sorted(
        [(1, "a-hot", 11), (2, "b", 3), (3, "c", None)]
    )
    assert t.current_version == v0 + 1


def test_update_statement_without_where_hits_all_rows(spark, tmp_path):
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    execute_statement(
        spark, "UPDATE default.t SET v = upper(v);", {"default.t": t}
    )
    assert rows(t.read()) == sorted([(1, "A"), (2, "B")])


def test_update_statement_rejects_unknown_column(spark, tmp_path):
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    with pytest.raises(ValueError, match="unknown columns"):
        execute_statement(
            spark, "UPDATE default.t SET nope = 1;", {"default.t": t}
        )

def test_ctas_truncate_drop_statements(spark, tmp_path):
    """CREATE TABLE ... AS SELECT materializes the query as snapshot v0;
    TRUNCATE TABLE commits an empty snapshot (schema kept, history
    intact); DROP TABLE removes the table root (PURGE semantics)."""
    import os

    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    tables = {"default.t": t}
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).createOrReplaceTempView("ctas_src")

    execute_statement(
        spark,
        "CREATE TABLE default.t USING iceberg AS "
        "SELECT k, upper(v) AS v FROM ctas_src WHERE k < 3;",
        tables,
    )
    assert rows(t.read()) == sorted([(1, "A"), (2, "B")])

    execute_statement(spark, "TRUNCATE TABLE default.t;", tables)
    assert t.read().count() == 0
    assert t.read().columns == ["k", "v"]
    assert t.current_version == 1  # truncate is a commit, not a reset

    root = t.root
    execute_statement(spark, "DROP TABLE default.t;", tables)
    assert "default.t" not in tables
    assert not os.path.exists(root)

def test_rename_and_widen_column_statements(spark, tmp_path):
    """ALTER TABLE RENAME COLUMN and ALTER COLUMN TYPE: renames commit
    a snapshot; type changes are allowed only for Iceberg's lossless
    promotions (int->bigint, float->double) and rejected otherwise."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    tables = {"default.t": t}
    t.create(
        spark.createDataFrame([(1, "a", 2)], "k int, v string, n int")
    )
    execute_statement(
        spark, "ALTER TABLE default.t RENAME COLUMN v TO label;", tables
    )
    assert t.read().columns == ["k", "label", "n"]
    execute_statement(
        spark, "ALTER TABLE default.t ALTER COLUMN n TYPE bigint;", tables
    )
    assert dict(t.read().dtypes)["n"] == "bigint"
    assert rows(t.read()) == [(1, "a", 2)]
    with pytest.raises(ValueError, match="lossless"):
        execute_statement(
            spark, "ALTER TABLE default.t ALTER COLUMN label TYPE int;",
            tables,
        )

def test_call_procedures_execute(spark, tmp_path):
    """CALL system.* dispatches to the LocalTable maintenance surface:
    rollback_to_snapshot (metadata-only restore), rewrite_data_files
    (compaction), expire_snapshots (retention), fast_forward (branch
    publish) — positional and name => value argument styles."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    tables = {"db.t": t}
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert t.read().count() == 3

    execute_statement(
        spark,
        "CALL spark_catalog.system.rollback_to_snapshot('db.t', 1);",
        tables,
    )
    assert t.read().count() == 2  # back to snapshot 1's state

    execute_statement(
        spark, "CALL system.rewrite_data_files(table => 'db.t');", tables
    )
    assert t.read().count() == 2  # data unchanged, layout rewritten

    execute_statement(
        spark,
        "CALL system.expire_snapshots(table => 'db.t', retain_last => 2);",
        tables,
    )
    data_snaps = [s for s in t.snapshots() if not s.get("staged")]
    assert len(data_snaps) <= 2
    assert t.read().count() == 2  # current snapshot always survives

    t.create_branch("audit")
    t.append_to_branch(
        "audit", spark.createDataFrame([(9, "z")], "k long, v string")
    )
    execute_statement(
        spark, "CALL system.fast_forward('db.t', 'main', 'audit');", tables
    )
    assert t.read().count() == 3  # branch head landed on main


def test_call_unknown_procedure_rejected(spark, tmp_path):
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    with pytest.raises(ValueError, match="unsupported procedure"):
        execute_statement(
            spark, "CALL system.cherrypick_snapshot('db.t', 5);", {"db.t": t}
        )


def test_delete_without_where_empties_table(spark, tmp_path):
    """DELETE FROM t with no WHERE deletes every row — valid Iceberg/
    Spark SQL — leaving a schema-preserving empty snapshot (and the
    prior snapshot intact for rollback, like TRUNCATE)."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, 10), (2, 3)], "k long, x long"))
    execute_statement(spark, "DELETE FROM default.t;", {"default.t": t})
    assert t.read().count() == 0
    assert t.read().columns == ["k", "x"]
    assert len(t.snapshots()) >= 2  # the delete is a commit, not a drop


def test_drop_table_purge_and_if_exists(spark, tmp_path):
    """DROP TABLE accepts the PURGE modifier; DROP TABLE IF EXISTS on an
    unregistered name is a no-op instead of a KeyError."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1,)], "k long"))
    tables = {"default.t": t}
    execute_statement(spark, "DROP TABLE default.t PURGE;", tables)
    assert "default.t" not in tables and not t.exists()
    # IF EXISTS on a missing table: silently nothing
    execute_statement(spark, "DROP TABLE IF EXISTS default.ghost;", tables)
    # plain DROP on a missing table still fails loudly
    with pytest.raises(KeyError):
        execute_statement(spark, "DROP TABLE default.ghost;", tables)


def test_create_table_parameterized_types_and_constraints(spark, tmp_path):
    """CREATE TABLE column parsing keeps the FULL type text — a
    parameterized type with an internal comma/space (decimal(10, 2))
    must survive — and strips NOT NULL / COMMENT without eating the
    type."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    execute_statement(
        spark,
        "CREATE TABLE default.t ("
        "id bigint NOT NULL COMMENT 'pk', "
        "price decimal(10, 2), "
        "tags array<string> COMMENT 'labels') USING iceberg;",
        {"default.t": t},
    )
    assert dict(t.read().dtypes) == {
        "id": "bigint",
        "price": "decimal(10,2)",
        "tags": "array<string>",
    }


def test_merge_insert_clause_qualified_columns(spark, tmp_path):
    """INSERT (t.k, t.v) VALUES (...) — qualified insert-clause columns
    must bind to the target columns, not silently miss the name match
    and NULL-fill."""
    from iceberg_examples_spark.sql_merge import execute_merge

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    spark.createDataFrame(
        [(2, "b")], "k long, v string"
    ).createOrReplaceTempView("qins_src")
    execute_merge(
        spark,
        "MERGE INTO default.t t USING qins_src s ON s.k = t.k "
        "WHEN NOT MATCHED THEN INSERT (t.k, t.v) VALUES (s.k, s.v);",
        {"default.t": t},
    )
    assert rows(t.read()) == sorted([(1, "a"), (2, "b")])

def test_conditional_insert_clause_honored(spark, tmp_path):
    """WHEN NOT MATCHED AND <cond> THEN INSERT: only unmatched source
    rows satisfying the condition insert; NULL-evaluating conditions are
    not satisfied (three-valued logic). Pre-r8 the parser silently
    DISCARDED the condition and inserted every unmatched row (ADVICE r7,
    medium)."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a", 5)], "k long, v string, q long"))
    spark.createDataFrame(
        [(2, "b", 10), (3, "c", 1), (4, "d", None)],
        "k long, v string, q long",
    ).createOrReplaceTempView("condins_src")
    stmt = (
        "MERGE INTO default.t t USING condins_src s ON s.k = t.k "
        "WHEN NOT MATCHED AND s.q > 5 THEN "
        "INSERT (k, v, q) VALUES (s.k, s.v, s.q);"
    )
    assert spark_validates(spark, stmt)  # real engines accept this text
    execute_merge(spark, stmt, {"default.t": t})
    # k=2: q=10>5 inserts; k=3: q=1 fails; k=4: NULL q not satisfied
    assert rows(t.read()) == sorted([(1, "a", 5), (2, "b", 10)])


def test_conditional_insert_star_honored(spark, tmp_path):
    """The condition applies to INSERT * exactly as to the explicit
    column form."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    spark.createDataFrame(
        [(2, "keep"), (3, "drop")], "k long, v string"
    ).createOrReplaceTempView("condins_star_src")
    execute_merge(
        spark,
        "MERGE INTO default.t t USING condins_star_src s ON s.k = t.k "
        "WHEN NOT MATCHED AND s.v = 'keep' THEN INSERT *;",
        {"default.t": t},
    )
    assert rows(t.read()) == sorted([(1, "a"), (2, "keep")])


def test_second_insert_clause_rejected(spark):
    """Spark evaluates multiple NOT MATCHED clauses first-match-wins;
    the restricted grammar supports one — a second clause must raise,
    not silently overwrite the first (ADVICE r7)."""
    with pytest.raises(ValueError, match="multiple WHEN NOT MATCHED"):
        parse_merge(
            "MERGE INTO default.t t USING src s ON s.k = t.k "
            "WHEN NOT MATCHED AND s.q > 5 THEN INSERT (k) VALUES (s.k) "
            "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k + 100);"
        )


def test_by_source_referencing_source_alias_rejected(spark):
    """Spark's analyzer rejects NOT MATCHED BY SOURCE clauses that
    reference source columns (there is no source row); evaluating them
    against all-NULL source values would silently diverge (ADVICE r7)."""
    with pytest.raises(ValueError, match="references source"):
        parse_merge(
            "MERGE INTO default.t t USING src s ON s.k = t.k "
            "WHEN NOT MATCHED BY SOURCE AND s.q > 1 THEN DELETE;"
        )
    with pytest.raises(ValueError, match="references source"):
        parse_merge(
            "MERGE INTO default.t t USING src s ON s.k = t.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.v = s.v;"
        )


def test_call_zero_valued_and_missing_args(spark, tmp_path):
    """CALL argument dispatch must treat 0 / missing explicitly, not by
    truthiness: snapshot_id => 0 is the legitimate create snapshot, and
    incomplete argument lists raise a clear error instead of IndexError
    (ADVICE r7)."""
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "t"))
    tables = {"db.t": t}
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    execute_statement(
        spark,
        "CALL system.rollback_to_snapshot(table => 'db.t', snapshot_id => 0);",
        tables,
    )
    assert t.read().count() == 1  # back to the create snapshot

    with pytest.raises(ValueError, match="missing argument 'snapshot_id'"):
        execute_statement(
            spark, "CALL system.rollback_to_snapshot('db.t');", tables
        )
    with pytest.raises(ValueError, match="missing argument 'to'"):
        execute_statement(
            spark,
            "CALL system.fast_forward(table => 'db.t', branch => 'main');",
            tables,
        )
    # named to => form works without positionals
    t.create_branch("audit")
    t.append_to_branch(
        "audit", spark.createDataFrame([(9, "z")], "k long, v string")
    )
    execute_statement(
        spark,
        "CALL system.fast_forward(table => 'db.t', branch => 'main', to => 'audit');",
        tables,
    )
    assert t.read().count() == 2  # rollback state + audit head

def test_keywords_inside_string_literals_do_not_shift_boundaries(
    spark, tmp_path
):
    """A string literal containing WHEN/THEN/WHERE/VALUES — text Spark
    accepts — must not terminate a clause early and execute with
    silently wrong results. Boundary regexes run on a quote-masked copy;
    substrings are sliced from the original (round-8 hardening of the
    ADVICE r7 bug class)."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "WHEN HOT", "a"), (2, "cold", "b")],
            "k long, tag string, v string",
        )
    )
    spark.createDataFrame(
        [(1, "up"), (2, "up2"), (3, "new")], "k long, v string"
    ).createOrReplaceTempView("kw_src")

    # literal 'WHEN HOT' inside the ON condition
    stmt = (
        "MERGE INTO default.t t USING kw_src s "
        "ON s.k = t.k AND t.tag = 'WHEN HOT' "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED AND s.v = 'x THEN y' THEN "
        "INSERT (k, tag, v) VALUES (s.k, 'a) WHEN b', s.v);"
    )
    assert spark_validates(spark, stmt)
    execute_merge(spark, stmt, {"default.t": t})
    # only k=1 matched (tag gate); insert condition matched nobody
    assert rows(t.read()) == sorted(
        [(1, "WHEN HOT", "up"), (2, "cold", "b")]
    )

    # UPDATE statement: ' WHERE ' inside the assignment literal
    from iceberg_examples_spark.sql_merge import execute_statement

    execute_statement(
        spark,
        "UPDATE default.t SET v = 'a WHERE b' WHERE k = 1;",
        {"default.t": t},
    )
    assert sorted(r["v"] for r in t.read().collect()) == ["a WHERE b", "b"]

    # DELETE: quoted semicolon + keyword in the predicate literal
    execute_statement(
        spark,
        "DELETE FROM default.t WHERE v = 'a WHERE b';",
        {"default.t": t},
    )
    assert sorted(r["k"] for r in t.read().collect()) == [2]

    # INSERT VALUES: literal containing 'VALUES' and parens
    execute_statement(
        spark,
        "INSERT INTO default.t VALUES (9, 'x', 'a VALUES (b)');",
        {"default.t": t},
    )
    assert sorted(r["k"] for r in t.read().collect()) == [2, 9]


def test_literal_internal_whitespace_survives_normalization(spark, tmp_path):
    """Action normalization collapses whitespace OUTSIDE literals only:
    an inserted value keeps its double space."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    spark.createDataFrame([(2, "b")], "k long, v string").createOrReplaceTempView(
        "ws_src"
    )
    execute_merge(
        spark,
        "MERGE INTO default.t t USING ws_src s ON s.k = t.k "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 'two  spaces');",
        {"default.t": t},
    )
    assert rows(t.read()) == sorted([(1, "a"), (2, "two  spaces")])

def test_name_map_never_rewrites_inside_literals(spark, tmp_path):
    """name_map rewrites qualified relation names in the source subquery
    — but a name appearing inside a string literal is data and must
    survive verbatim."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "x")], "k long, v string"))
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).createOrReplaceTempView("nm_src")
    execute_merge(
        spark,
        "MERGE INTO default.t t USING "
        "(SELECT k, 'from default.nm_src' AS v FROM default.nm_src) s "
        "ON s.k = t.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v);",
        {"default.t": t},
        name_map={"default.nm_src": "nm_src"},
    )
    # the literal kept the ORIGINAL qualified name; the relation resolved
    # through the mapped view
    assert rows(t.read()) == sorted(
        [(1, "from default.nm_src"), (2, "from default.nm_src")]
    )


def test_call_arg_quoted_arrow_is_positional(spark):
    """A string literal containing '=>' is a positional value, not a
    named argument."""
    from iceberg_examples_spark.sql_merge import _parse_call_args

    pos, named = _parse_call_args("'db.t', 'a=>b', retain_last => 3")
    assert pos == ["db.t", "a=>b"]
    assert named == {"retain_last": 3}

def test_escaped_quote_inside_literal(spark, tmp_path):
    r"""Spark's lexer (default non-ANSI mode) accepts backslash-escaped
    quotes inside literals; the masking scanners must not flip quote
    state on them (code-review r8: 'can\'t' used to unbalance the mask
    and reject a Spark-valid statement)."""
    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "x")], "k long, v string"))
    spark.createDataFrame(
        [(1, "up"), (2, "new")], "k long, v string"
    ).createOrReplaceTempView("esc_src")
    stmt = (
        "MERGE INTO default.t t USING esc_src s ON s.k = t.k "
        "WHEN MATCHED AND t.v != 'can\\'t' THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 'it\\'s');"
    )
    assert spark_validates(spark, stmt)
    execute_merge(spark, stmt, {"default.t": t})
    assert rows(t.read()) == sorted([(1, "up"), (2, "it's")])


def test_by_source_alias_inside_literal_not_rejected(spark, tmp_path):
    """An s-alias token INSIDE a string literal is data, not a source
    reference — the rejection must scan the quote mask (code-review r8:
    t.tag = 's.old' was falsely rejected)."""
    spec = parse_merge(
        "MERGE INTO default.t t USING src s ON s.k = t.k "
        "WHEN NOT MATCHED BY SOURCE AND t.tag = 's.old' THEN DELETE;"
    )
    assert spec.by_source[0].condition == "t.tag = 's.old'"


def test_mask_boundaries_match_lexer_in_both_modes(spark, tmp_path):
    r"""Round-8 ADVICE asked whether _mask_quotes diverges from Spark's
    lexer under spark.sql.parser.escapedStringLiterals=true. Probed:
    that config (and ANSI mode) changes only how a literal's VALUE is
    unescaped; the ANTLR STRING rule always consumes \<char> inside a
    literal, so TOKEN BOUNDARIES never move — which is all the mask
    models (values are sliced verbatim and evaluated by Spark itself).
    This test pins the empirical facts the docstring now states; if a
    future Spark changes the lexer grammar per-mode, it fails loudly."""
    from iceberg_examples_spark.sql_merge import _mask_quotes

    # 1) Both modes lex 'a\'b' as ONE literal (same token span)...
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        assert spark.sql(r"SELECT 'a\'b' AS x").count() == 1
        # ...and both REJECT 'c:\' as unterminated — boundaries identical
        assert not spark_validates(
            spark, r"SELECT 'c:\' AS x", "Project"
        )
        # 2) the executor still slices correctly under the mode, end to
        # end: the escaped quote stays inside the predicate literal
        t = LocalTable(spark, str(tmp_path / "t_escmode"))
        t.create(
            spark.createDataFrame(
                [(1, "a'b"), (2, "a\\'b"), (3, "plain")],
                "k long, note string",
            )
        )
        from iceberg_examples_spark.sql_merge import execute_statement

        # in escaped mode the literal's VALUE keeps the backslash, so
        # row 2 (raw a\'b) matches, row 1 (a'b) does not
        execute_statement(
            spark, r"DELETE FROM default.t WHERE note = 'a\'b';",
            {"default.t": t},
        )
        assert rows(t.read()) == [(1, "a'b"), (3, "plain")]
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
    # 3) the mask agrees with that boundary rule in one place, always:
    # escaped quote does not close the literal; the tail stays unmasked
    m = _mask_quotes(r"'a\'b' x")
    assert m.endswith(" x") and m.count("'") == 2
