"""Local stand-in for the driver's DuckDB correctness gate.

Runs a declared Spark query and its oracle SQL side-by-side, then compares
row count, column names, and an order-insensitive canonical value set.
Both sides are fetched as native Python objects (no pandas dtype coercion —
DuckDB DATE must stay a date, not become datetime64) and canonicalized
defensively (floats via repr, dates/timestamps via isoformat, arrays via
tuple) so the comparison is about semantics, not engine object types.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import numpy as np

from iceberg_examples_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("f", "nan")
        return ("f", repr(f))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    return str(v)


def canonical_rows(cols: list[str], rows: list) -> list:
    """(columns, row tuples) -> sorted canonical tuples with columns
    sorted by name (mirrors the driver's order-insensitive hash)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=repr
    )


def arrow_rows(rel) -> list:
    """Fetch a DuckDB relation through Arrow, the way a typed driver
    would: HUGEINT surfaces as decimal128 -> decimal.Decimal here
    (NOT int), so a `sum(BIGINT)` the oracle forgot to CAST back to
    BIGINT fails the canonical comparison on type — the exact class
    that made dsir_weights red in r10 while fetchall() looked equal."""
    tbl = rel.fetch_arrow_table()
    cols = tbl.column_names
    return [tuple(d[c] for c in cols) for d in tbl.to_pylist()]


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duck_connection(sf_dir)
    rel = con.sql(oracle_sql)
    o_cols = list(rel.columns)
    o_rows = rel.fetchall()
    m_cols = list(spark_df.columns)
    m_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(m_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(m_cols)} oracle={sorted(o_cols)}"
    )
    assert len(m_rows) == len(o_rows), (
        f"row count mismatch: spark={len(m_rows)} oracle={len(o_rows)}"
    )
    a = canonical_rows(m_cols, m_rows)
    b = canonical_rows(o_cols, o_rows)
    if a != b:
        sb = set(map(repr, b))
        sa = set(map(repr, a))
        diff_a = [r for r in a if repr(r) not in sb][:5]
        diff_b = [r for r in b if repr(r) not in sa][:5]
        raise AssertionError(
            f"value mismatch\n  spark-only: {diff_a}\n  oracle-only: {diff_b}"
        )
    # Second pass through Arrow: same rows, but typed the way the
    # driver sees them (HUGEINT -> Decimal, not int). Catches oracles
    # whose *types* drifted even though fetchall() values matched.
    b_arrow = canonical_rows(o_cols, arrow_rows(con.sql(oracle_sql)))
    if a != b_arrow:
        sb = set(map(repr, b_arrow))
        sa = set(map(repr, a))
        diff_a = [r for r in a if repr(r) not in sb][:5]
        diff_b = [r for r in b_arrow if repr(r) not in sa][:5]
        raise AssertionError(
            "typed (Arrow-fetch) mismatch — oracle output type likely "
            "diverges from Spark (e.g. uncast HUGEINT)\n"
            f"  spark-only: {diff_a}\n  oracle-arrow-only: {diff_b}"
        )
