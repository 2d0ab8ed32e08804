"""Property-based check of the connector-less MERGE executor.

Hypothesis generates small target/source tables (with NULLs in both the
value and the guard column) and a random WHEN-clause list from the
grammar the reference exercises — conditional/unconditional UPDATE and
DELETE (first-satisfied-clause-wins, in declaration order), an optional
NOT MATCHED INSERT, and NOT MATCHED BY SOURCE UPDATE/DELETE clauses
(target rows absent from the source) — and compares execute_merge's
final table state against a pure-Python reference interpreter that
implements the SQL contract directly:

- a clause condition evaluating to NULL (any NULL operand of ``s.ts >
  t.ts``) counts as NOT satisfied — the round-7 ADVICE semantics;
- the first satisfied clause wins; later clauses never fire;
- matched rows with no satisfied clause stay unchanged;
- INSERT applies to source rows matching no target row.

Source keys are generated unique, so no cardinality violation occurs
(that path has its own dedicated tests in test_sql_merge.py).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_examples_spark.catalog import LocalTable
from iceberg_examples_spark.sql_merge import execute_merge

ts_vals = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
val_vals = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))


def row_strategy(keys):
    return st.tuples(st.sampled_from(keys), val_vals, ts_vals)


def table_strategy(keys):
    # unique keys per table: MERGE requires <=1 source match per target
    return st.lists(
        row_strategy(keys), min_size=0, max_size=5, unique_by=lambda r: r[0]
    )


clause_strategy = st.lists(
    st.tuples(
        st.sampled_from(["update", "delete"]),
        st.booleans(),  # conditional on s.ts > t.ts?
    ),
    min_size=0,
    max_size=3,
)

# WHEN NOT MATCHED BY SOURCE clauses: act on target rows with no source
# match; conditions reference the target only ("t.ts > 1")
by_source_strategy = st.lists(
    st.tuples(
        st.sampled_from(["update", "delete"]),
        st.booleans(),  # conditional on t.ts > 1?
    ),
    min_size=0,
    max_size=2,
)


def interpret(target, source, clauses, has_insert, by_source=()):
    """The pure-Python reference semantics."""
    src_by_key = {r[0]: r for r in source}
    out = []
    for trow in target:
        srow = src_by_key.get(trow[0])
        if srow is None:
            fired = None
            for action, conditional in by_source:
                sat = (
                    trow[2] is not None and trow[2] > 1
                    if conditional
                    else True
                )
                if sat:
                    fired = action
                    break
            if fired == "delete":
                continue
            if fired == "update":
                out.append((trow[0], "stale", trow[2]))
            else:
                out.append(trow)
            continue
        fired = None
        for action, conditional in clauses:
            if conditional:
                s_ts, t_ts = srow[2], trow[2]
                sat = s_ts is not None and t_ts is not None and s_ts > t_ts
            else:
                sat = True
            if sat:
                fired = action
                break
        if fired == "delete":
            continue
        if fired == "update":
            out.append((trow[0], srow[1], srow[2]))
        else:
            out.append(trow)
    if has_insert:
        tkeys = {r[0] for r in target}
        out.extend(r for r in source if r[0] not in tkeys)
    return sorted(out, key=lambda r: (r[0], str(r[1]), str(r[2])))


def build_stmt(clauses, has_insert, by_source=(), qualify_insert=False):
    parts = ["MERGE INTO default.t t USING prop_src s ON s.k = t.k"]
    for action, conditional in clauses:
        cond = " AND s.ts > t.ts" if conditional else ""
        if action == "delete":
            parts.append(f"WHEN MATCHED{cond} THEN DELETE")
        else:
            parts.append(
                f"WHEN MATCHED{cond} THEN UPDATE SET t.v = s.v, t.ts = s.ts"
            )
    if has_insert:
        # Spark accepts both unqualified and target-qualified insert-
        # clause columns; both must bind to the target columns
        cols = "t.k, t.v, t.ts" if qualify_insert else "k, v, ts"
        parts.append(
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES (s.k, s.v, s.ts)"
        )
    for action, conditional in by_source:
        cond = " AND t.ts > 1" if conditional else ""
        if action == "delete":
            parts.append(f"WHEN NOT MATCHED BY SOURCE{cond} THEN DELETE")
        else:
            parts.append(
                f"WHEN NOT MATCHED BY SOURCE{cond} THEN UPDATE SET t.v = 'stale'"
            )
    return " ".join(parts) + ";"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=table_strategy([1, 2, 3, 4]),
    source=table_strategy([3, 4, 5, 6]),
    clauses=clause_strategy,
    has_insert=st.booleans(),
    by_source=by_source_strategy,
    qualify_insert=st.booleans(),
)
def test_merge_executor_matches_reference_interpreter(
    spark,
    tmp_path_factory,
    target,
    source,
    clauses,
    has_insert,
    by_source,
    qualify_insert,
):
    if not clauses and not has_insert and not by_source:
        return  # Spark's parser rejects a MERGE with no action clause
    # Spark's parser enforces the only-last-clause-may-omit-condition
    # rule per clause group (MATCHED and NOT MATCHED BY SOURCE alike)
    clauses = [
        (action, True if i < len(clauses) - 1 else conditional)
        for i, (action, conditional) in enumerate(clauses)
    ]
    by_source = [
        (action, True if i < len(by_source) - 1 else conditional)
        for i, (action, conditional) in enumerate(by_source)
    ]
    schema = "k long, v string, ts long"
    t = LocalTable(
        spark, str(tmp_path_factory.mktemp("prop") / "t")
    )
    t.create(spark.createDataFrame(target, schema))
    spark.createDataFrame(source, schema).createOrReplaceTempView(
        "prop_src"
    )
    execute_merge(
        spark,
        build_stmt(clauses, has_insert, by_source, qualify_insert),
        {"default.t": t},
    )
    got = sorted(
        (tuple(r) for r in t.read().collect()),
        key=lambda r: (r[0], str(r[1]), str(r[2])),
    )
    assert got == interpret(target, source, clauses, has_insert, by_source)
