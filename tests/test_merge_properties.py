"""Property-based verification of the merge algebra: for random small
target/source tables, the DataFrame merge must equal a direct Python model
of SQL MERGE semantics. Catches resolution-order and NULL-handling bugs
the fixture scenarios can't."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from iceberg_examples_spark.operators import mutations as M

keys = st.integers(min_value=0, max_value=5)
vals = st.text(alphabet="abc", min_size=0, max_size=2)

# target: unique keys (a real table has PK semantics for merge targets)
targets = st.dictionaries(keys, vals, max_size=5)
# source: unique keys (Iceberg rejects dup-key sources; we model post-check)
sources = st.dictionaries(keys, vals, max_size=5)


def model_merge(target: dict, source: dict, ts_t=None, ts_s=None) -> dict:
    """Python model of MERGE: matched → update, unmatched source → insert."""
    out = dict(target)
    out.update(source)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=targets, source=sources)
def test_merge_upsert_matches_model(spark, target, source):
    t = spark.createDataFrame(
        list(target.items()) or [(None, None)], "id long, v string"
    ).filter(F.col("id").isNotNull())
    s = spark.createDataFrame(
        list(source.items()) or [(None, None)], "id long, v string"
    ).filter(F.col("id").isNotNull())
    result = {r.id: r.v for r in M.merge_upsert(t, s, ["id"]).collect()}
    assert result == model_merge(target, source)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=st.dictionaries(keys, st.tuples(vals, st.integers(0, 3)), max_size=4),
    source=st.dictionaries(keys, st.tuples(vals, st.integers(0, 3)), max_size=4),
)
def test_merge_cdc_guard_matches_model(spark, target, source):
    """Conditional merge: update only when source ts is strictly newer."""
    t = spark.createDataFrame(
        [(k, v, ts) for k, (v, ts) in target.items()] or [(None, None, None)],
        "id long, v string, ts int",
    ).filter(F.col("id").isNotNull())
    s = spark.createDataFrame(
        [(k, v, ts) for k, (v, ts) in source.items()] or [(None, None, None)],
        "id long, v string, ts int",
    ).filter(F.col("id").isNotNull())
    merged = M.merge_upsert(
        t, s, ["id"], matched_condition=F.col("t.ts") < F.col("s.ts")
    )
    result = {r.id: (r.v, r.ts) for r in merged.collect()}
    expected = dict(target)
    for k, (v, ts) in source.items():
        if k not in expected or expected[k][1] < ts:
            expected[k] = (v, ts)
    assert result == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=targets, changes=sources)
def test_upsert_by_key_matches_model(spark, target, changes):
    """Equality-delete upsert: delete-by-key ∪ append == dict.update."""
    t = spark.createDataFrame(
        list(target.items()) or [(None, None)], "id long, v string"
    ).filter(F.col("id").isNotNull())
    c = spark.createDataFrame(
        list(changes.items()) or [(None, None)], "id long, v string"
    ).filter(F.col("id").isNotNull())
    result = {r.id: r.v for r in M.upsert_by_key(t, c, ["id"]).collect()}
    expected = dict(target)
    expected.update(changes)
    assert result == expected


import datetime

effs = st.integers(min_value=0, max_value=5)


def _d(n: int) -> datetime.date:
    return datetime.date(2020, 1, 1) + datetime.timedelta(days=int(n))


HIGH = datetime.date(9999, 12, 31)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    dim_spec=st.dictionaries(
        keys, st.tuples(vals, effs), max_size=3
    ),  # key -> (current-version name, eff day)
    stg_spec=st.dictionaries(keys, st.tuples(vals, st.integers(10, 15)), max_size=3),
)
def test_scd2_matches_model(spark, dim_spec, stg_spec):
    """SCD2 single-merge vs a direct Python model of IcebergSCD2.java:51-68.
    Dim has one current row per key; staging eff days (10-15) never collide
    with dim eff days (0-5), mirroring a real daily batch."""
    dim_rows = [
        (k, name, True, _d(e), HIGH) for k, (name, e) in dim_spec.items()
    ]
    stg_rows = [(k, name, _d(e)) for k, (name, e) in stg_spec.items()]

    from iceberg_examples_spark.operators.reference_scenarios import (
        SCD2_DIM_SCHEMA,
        SCD2_STG_SCHEMA,
    )

    dim = spark.createDataFrame(dim_rows, SCD2_DIM_SCHEMA)
    stg = spark.createDataFrame(stg_rows, SCD2_STG_SCHEMA)
    result = {
        (r.customer_id, r.effective_date): (r.name, r.current, r.end_date)
        for r in M.scd2_merge(dim, stg, key="customer_id").collect()
    }

    # model: close matched current rows, insert new current versions
    expected = {}
    for k, name, cur, eff, end in dim_rows:
        if k in stg_spec:
            expected[(k, eff)] = (name, False, _d(stg_spec[k][1]))
        else:
            expected[(k, eff)] = (name, cur, end)
    for k, (name, e) in stg_spec.items():
        expected[(k, _d(e))] = (name, True, HIGH)
    assert result == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=st.dictionaries(keys, vals, max_size=4),
    source=st.dictionaries(keys, st.tuples(vals, vals), max_size=4),
)
def test_merge_star_ignores_extra_and_nullfills_missing(spark, target, source):
    """Star-merge schema tolerance: source's extra column is ignored;
    matched rows update only shared columns; inserts carry shared columns
    (here all shared ones are present, extra dropped)."""
    t = spark.createDataFrame(
        list(target.items()) or [(None, None)], "id long, v string"
    ).filter(F.col("id").isNotNull())
    s = spark.createDataFrame(
        [(k, v, extra) for k, (v, extra) in source.items()]
        or [(None, None, None)],
        "id long, v string, extra string",
    ).filter(F.col("id").isNotNull())
    result = {r.id: r.v for r in M.merge_star(t, s, ["id"]).collect()}
    expected = dict(target)
    expected.update({k: v for k, (v, _) in source.items()})
    assert result == expected
    assert "extra" not in M.merge_star(t, s, ["id"]).columns


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fact=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=20
    ),
)
def test_replicate_dim_join_row_identical(spark, fact):
    """Salted replicated-dim join must be row-for-row identical to the
    plain join, including duplicate fact rows and unmatched dim keys."""
    from iceberg_examples_spark.functions.skew import replicate_dim_join

    f = spark.createDataFrame(
        [(k, uid) for k, uid in fact] or [(None, None)], "k long, uid long"
    ).filter(F.col("k").isNotNull())
    d = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two")], "k long, name string"
    )
    salted = sorted(
        (r.k, r.uid, r.name)
        for r in replicate_dim_join(f, d, "k", ["uid"], n_salts=4).collect()
    )
    plain = sorted(
        (r.k, r.uid, r.name) for r in f.join(d, "k", "inner").collect()
    )
    assert salted == plain


# ---- z-order interleave properties --------------------------------------

@given(
    x=st.integers(min_value=0, max_value=1023),
    y=st.integers(min_value=0, max_value=1023),
)
@settings(max_examples=200, deadline=None)
def test_zorder_interleave_invertible(x, y):
    """The rendered z-expression must be the true Morton interleave:
    decoding even/odd bits of z recovers (x, y) exactly — checked in pure
    Python against the same expression DuckDB evaluates."""
    import duckdb

    from iceberg_examples_spark.functions.zorder import zorder_sql_duckdb

    con = duckdb.connect()
    z = con.sql(
        f"SELECT {zorder_sql_duckdb(str(x), str(y))} AS z"
    ).fetchone()[0]
    dx = sum(((z >> (2 * i)) & 1) << i for i in range(10))
    dy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(10))
    assert (dx, dy) == (x, y)


@given(
    a=st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
    b=st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
)
@settings(max_examples=100, deadline=None)
def test_zorder_locality_bound(a, b):
    """Morton property used by the layout: if two points share their
    top-k bits in BOTH coordinates, their z-values share the top-2k bits
    (so they land in the same z-range → same file neighborhood)."""
    import duckdb

    from iceberg_examples_spark.functions.zorder import zorder_sql_duckdb

    con = duckdb.connect()

    def z(p):
        return con.sql(
            f"SELECT {zorder_sql_duckdb(str(p[0]), str(p[1]))} AS z"
        ).fetchone()[0]

    for k in range(1, 10):
        if (a[0] >> (10 - k)) == (b[0] >> (10 - k)) and (
            a[1] >> (10 - k)
        ) == (b[1] >> (10 - k)):
            assert (z(a) >> (20 - 2 * k)) == (z(b) >> (20 - 2 * k))
