"""Simulate the driver's verify pass against __spark_entry__.py.

Loads the module the way the driver does (import by path), smoke-runs
``entry(spark)``, then runs every ``queries()`` entry at sf=0.01 against
its ``oracle_sql()`` twin in DuckDB, comparing row count, column names,
and an order-insensitive value hash. Exit code 0 iff everything matches.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402
from tests.oracle_harness import canonical_rows, duck_connection  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def vhash(cols, rows) -> str:
    h = hashlib.sha256()
    for r in canonical_rows(cols, rows):
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def main() -> int:
    # VANILLA session, deliberately NOT iceberg_examples_spark.session.
    # get_spark: the external driver builds its own SparkSession with
    # default confs (no nanosAsLong, no UTC pin, default timestampType),
    # and round 2 proved queries can pass under our session yet fail under
    # the driver's (TIMESTAMP_NTZ watermark rejection). Simulating with
    # defaults catches that class of bug locally.
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    n = mod.entry(spark).count()
    print(f"entry(spark): {n} rows (smoke {'OK' if n > 0 else 'FAIL'})")

    qs, oracles = mod.queries(), mod.oracle_sql()
    con = duck_connection(SF_DIR)
    failures = 0
    for name in sorted(qs):
        df = qs[name](spark, SF_DIR)
        m_cols, m_rows = list(df.columns), [tuple(r) for r in df.collect()]
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(m_rows)} rows")
            continue
        rel = con.sql(oracles[name])
        o_cols, o_rows = list(rel.columns), rel.fetchall()
        ok_cols = sorted(m_cols) == sorted(o_cols)
        ok_rows = len(m_rows) == len(o_rows)
        hm, ho = vhash(m_cols, m_rows), vhash(o_cols, o_rows)
        ok = ok_cols and ok_rows and hm == ho
        failures += 0 if ok else 1
        print(
            f"  {name:24s} {'MATCH' if ok else 'MISMATCH'} "
            f"rows={len(m_rows)}/{len(o_rows)} hash={hm}/{ho}"
        )
    print("RESULT:", "ALL MATCH" if failures == 0 else f"{failures} MISMATCHES")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
