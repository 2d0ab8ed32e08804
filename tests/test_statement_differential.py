"""Differential fuzz: execute_statement vs DuckDB on the SAME SQL text.

The statement executor's past bugs (rounds 7-8 ADVICE) were all
three-valued-logic and clause-slicing mistakes on UPDATE/DELETE — the
hand-written interpreter in test_merge_property.py can share a blind
spot with the executor because both were written here. DuckDB is an
INDEPENDENT engine: hypothesis generates statements from a
dialect-common grammar (comparisons, AND/OR/NOT, IS NULL, IN, BETWEEN,
arithmetic with NULL propagation, keyword-bearing string literals) and
both engines must land on the identical final table state.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_examples_spark.catalog import LocalTable
from iceberg_examples_spark.sql_merge import execute_statement

SCHEMA = "k long, v string, ts long"

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-3, max_value=9),  # k: collisions likely
        st.one_of(
            st.none(),
            st.sampled_from(["a", "b", "WHERE x", "it's", "NULL"]),
        ),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=50)),
    ),
    min_size=0,
    max_size=12,
)

# -- predicate grammar (valid + identical semantics in Spark and DuckDB) --

atoms = st.sampled_from(
    [
        "k > 2",
        "k <= 0",
        "ts = 10",
        "ts <> 7",
        "ts IS NULL",
        "ts IS NOT NULL",
        "v = 'a'",
        "v = 'WHERE x'",
        "v = 'it''s'",
        "v IS NULL",
        "v IN ('a', 'b')",
        "ts BETWEEN 0 AND 20",
        "k + ts > 12",       # NULL ts -> NULL predicate
        "ts * 2 = k",
    ]
)


def preds(depth: int):
    if depth == 0:
        return atoms
    sub = preds(depth - 1)
    return st.one_of(
        atoms,
        st.builds(lambda a, b: f"({a} AND {b})", sub, sub),
        st.builds(lambda a, b: f"({a} OR {b})", sub, sub),
        st.builds(lambda a: f"(NOT {a})", sub),
    )


set_clauses = st.sampled_from(
    [
        "v = 'z'",
        "ts = ts + 1",            # NULL-propagating assignment
        "v = v",                  # self-assignment
        "ts = k * 10",
        "v = 'WHERE ts = 1'",     # keyword inside the assigned literal
        "v = NULL",
        "ts = NULL, v = 'n'",
    ]
)


def _duck_state(rows, stmt_sql: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, v VARCHAR, ts BIGINT)")
    if rows:
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute(stmt_sql.replace("default.t", "t"))
    return sorted(
        con.execute("SELECT * FROM t").fetchall(),
        key=lambda r: (r[0], str(r[1]), str(r[2])),
    )


def _spark_state(spark, tmp_path_factory, rows, stmt_sql: str):
    t = LocalTable(spark, str(tmp_path_factory.mktemp("diff") / "t"))
    t.create(spark.createDataFrame(rows, SCHEMA))
    execute_statement(spark, stmt_sql, {"default.t": t})
    return sorted(
        (tuple(r) for r in t.read().collect()),
        key=lambda r: (r[0], str(r[1]), str(r[2])),
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy, pred=preds(2))
def test_delete_matches_duckdb(spark, tmp_path_factory, rows, pred):
    stmt = f"DELETE FROM default.t WHERE {pred};"
    assert _spark_state(spark, tmp_path_factory, rows, stmt) == _duck_state(
        rows, stmt
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy, pred=preds(2), sets=set_clauses)
def test_update_matches_duckdb(spark, tmp_path_factory, rows, pred, sets):
    stmt = f"UPDATE default.t SET {sets} WHERE {pred};"
    assert _spark_state(spark, tmp_path_factory, rows, stmt) == _duck_state(
        rows, stmt
    )


def test_update_without_where_matches_duckdb(spark, tmp_path_factory):
    rows = [(1, "a", None), (2, None, 5)]
    stmt = "UPDATE default.t SET ts = ts + 1;"
    assert _spark_state(spark, tmp_path_factory, rows, stmt) == _duck_state(
        rows, stmt
    )


@pytest.mark.parametrize(
    "pred",
    [
        "v = 'a' AND NOT (ts > 5)",      # NULL AND/NOT interaction
        "NOT (v = 'a' OR ts = 10)",      # De Morgan under NULLs
        "ts + k > 0 OR v IS NULL",       # NULL arithmetic feeding OR
    ],
)
def test_known_three_valued_shapes(spark, tmp_path_factory, pred):
    """The round-7 ADVICE bug class, pinned as explicit cases on a
    fixture where every row exercises a different truth value."""
    rows = [
        (1, "a", 10),
        (2, "a", None),
        (3, None, 10),
        (4, None, None),
        (5, "b", 3),
    ]
    stmt = f"DELETE FROM default.t WHERE {pred};"
    assert _spark_state(spark, tmp_path_factory, rows, stmt) == _duck_state(
        rows, stmt
    )
