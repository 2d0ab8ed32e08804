"""Cross-PROCESS commit race: two real Spark JVMs appending to one
LocalTable root concurrently.

The threaded storm tests (tests/test_engine.py) pin the serializable
conflict detection in-process; the multiprocess CAS test pins the
os.link primitive cross-process without Spark. This script closes the
last gap in the evidence chain: two independent SparkSessions — separate
JVMs, separate Python drivers — race append() with retry against the
same table root. Expected: every row from both writers lands exactly
once and the version advances once per successful append.

Run: ``python scripts/mp_commit_race.py`` — prints one JSON verdict
line. Kept as a script (not a pytest case) because two JVM spin-ups
cost ~60 s; run it when the commit protocol changes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
from iceberg_examples_spark.session import get_spark
from iceberg_examples_spark.catalog import CommitConflictError, LocalTable

wid, root = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name=f"mp-race-{{wid}}", master="local[2]")
t = LocalTable(spark, root)
for i in range(5):
    df = spark.createDataFrame([(wid * 100 + i,)], "id long")
    for _ in range(200):
        try:
            t.append(df)
            break
        except CommitConflictError:
            continue
    else:
        print("EXHAUSTED", wid, i, flush=True)
        sys.exit(2)
print("WORKER-OK", wid, flush=True)
"""


def main() -> None:
    root = os.path.join(tempfile.mkdtemp(prefix="mp_race_"), "tbl")

    # seed the table from a third session so both workers start warm
    sys.path.insert(0, REPO)
    from iceberg_examples_spark.catalog import LocalTable
    from iceberg_examples_spark.session import get_spark

    spark = get_spark(app_name="mp-race-seed", master="local[2]")
    t = LocalTable(spark, root)
    t.create(spark.createDataFrame([(0,)], "id long"))

    script = WORKER.format(repo=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(w), root],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for w in (1, 2)
    ]
    rcs = [p.wait(timeout=600) for p in procs]

    got = sorted(r["id"] for r in t.read().collect())
    expect = sorted(
        [0] + [100 + i for i in range(5)] + [200 + i for i in range(5)]
    )
    verdict = {
        "metric": "mp_commit_race",
        "worker_rcs": rcs,
        "rows_expected": expect,
        "rows_got": got,
        "versions": t.current_version,
        "ok": rcs == [0, 0] and got == expect and t.current_version == 10,
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
