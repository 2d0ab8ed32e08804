"""Cross-PROCESS MERGE race THROUGH the SQL executor: two real Spark
JVMs executing MERGE statements against one LocalTable root.

Round 8's threaded storm (tests/test_sql_executor_storm.py) pins the
executor's serializable-derivation guard in-process; this script is the
dual-JVM half of the same claim — two independent SparkSessions race
counter-increment MERGEs (plus an insert/DELETE churn pair in one
worker) with retry-on-conflict. Expected: the counter equals the exact
committed-increment count (a stale-base overwrite would lose some), the
churn rows cancel, and current_version advances once per committed
statement.

Run: ``python scripts/mp_merge_race.py`` — prints one JSON verdict line.
Kept as a script (not a pytest case) because two JVM spin-ups cost
~60 s; run it when the executor's commit path changes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_INC = 3  # increments per worker
N_CHURN = 2  # insert+delete pairs (worker 2 only)

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
from iceberg_examples_spark.session import get_spark
from iceberg_examples_spark.catalog import CommitConflictError, LocalTable
from iceberg_examples_spark.sql_merge import execute_merge, execute_statement

wid, root = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name=f"mp-merge-{{wid}}", master="local[2]")
t = LocalTable(spark, root)
tables = {{"default.ctr": t}}

def retrying(fn):
    for _ in range(200):
        try:
            fn()
            return
        except CommitConflictError:
            continue
    print("EXHAUSTED", wid, flush=True)
    sys.exit(2)

inc = (
    "MERGE INTO default.ctr t "
    "USING (SELECT CAST(0 AS BIGINT) AS k) s ON s.k = t.k "
    "WHEN MATCHED THEN UPDATE SET t.n = t.n + 1 "
    "WHEN NOT MATCHED THEN INSERT (k, n) VALUES (s.k, -999);"
)
for i in range({n_inc}):
    retrying(lambda: execute_merge(spark, inc, tables))
    if wid == 2 and i < {n_churn}:
        key = 100 + i
        ins = (
            "MERGE INTO default.ctr t "
            f"USING (SELECT CAST({{key}} AS BIGINT) AS k) s ON s.k = t.k "
            "WHEN NOT MATCHED THEN INSERT (k, n) VALUES (s.k, 0);"
        )
        retrying(lambda: execute_merge(spark, ins, tables))
        retrying(lambda: execute_statement(
            spark, f"DELETE FROM default.ctr WHERE k = {{key}};", tables
        ))
print("WORKER-OK", wid, flush=True)
"""


def main() -> None:
    root = os.path.join(tempfile.mkdtemp(prefix="mp_merge_"), "tbl")

    sys.path.insert(0, REPO)
    from iceberg_examples_spark.catalog import LocalTable
    from iceberg_examples_spark.session import get_spark

    spark = get_spark(app_name="mp-merge-seed", master="local[2]")
    t = LocalTable(spark, root)
    t.create(spark.createDataFrame([(0, 0)], "k long, n long"))

    script = WORKER.format(repo=REPO, n_inc=N_INC, n_churn=N_CHURN)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(w), root],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for w in (1, 2)
    ]
    rcs = [p.wait(timeout=600) for p in procs]

    rows = sorted(tuple(r) for r in t.read().collect())
    expected_rows = [(0, 2 * N_INC)]
    expected_commits = 2 * N_INC + 2 * N_CHURN
    verdict = {
        "metric": "mp_merge_race",
        "worker_rcs": rcs,
        "rows_expected": expected_rows,
        "rows_got": rows,
        "versions": t.current_version,
        "versions_expected": expected_commits,
        "ok": (
            rcs == [0, 0]
            and rows == expected_rows
            and t.current_version == expected_commits
        ),
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
