"""Concurrency storm THROUGH the SQL executor (verdict r7 item 5).

The round-7 storms exercised the commit protocol via the DataFrame verbs
(append / WAP / compact). This storm races the remaining untested
interleaving class: two statement-executor writers — MERGE increments vs
DELETE/INSERT churn — against the SAME LocalTable, interleaving through
``execute_merge`` / ``execute_statement``. Both executors pin their whole
read-derive-overwrite to ONE base snapshot and commit with
``expect_current`` (sql_merge.py), so a concurrent commit between read
and overwrite must raise CommitConflictError (retryable) rather than
erase the other writer's effect. Serializable outcome = the counter
equals the exact number of committed increments and every ephemeral row's
insert/delete pair cancels.

Reference semantics under test: Iceberg's optimistic-concurrency MERGE
contract (the reference's merges run through Iceberg's serializable
commit path, IcebergSQLMerge.java:29-92); re-expressed here against the
local snapshot catalog.
"""

from __future__ import annotations

import threading

from iceberg_examples_spark.catalog import CommitConflictError, LocalTable
from iceberg_examples_spark.sql_merge import execute_merge, execute_statement

RETRIES = 64


def _retrying(fn) -> None:
    for _ in range(RETRIES):
        try:
            fn()
            return
        except CommitConflictError:
            continue
    raise AssertionError("exhausted retries under storm")


def test_sql_executor_merge_delete_storm_is_serializable(spark, tmp_path):
    root = str(tmp_path / "tbl_sqlstorm")
    t0 = LocalTable(spark, root)
    t0.create(spark.createDataFrame([(0, 0)], "k long, n long"))

    n_merge_threads, n_increments = 2, 3
    n_churn_threads, n_churn_iters = 2, 2
    errors: list[str] = []

    def merge_writer(tid: int) -> None:
        # own table handle per thread: handles share the directory (the
        # commit medium), not in-memory state — the cross-process shape
        try:
            handle = LocalTable(spark, root)
            stmt = (
                "MERGE INTO default.ctr t "
                "USING (SELECT CAST(0 AS BIGINT) AS k) s ON s.k = t.k "
                "WHEN MATCHED THEN UPDATE SET t.n = t.n + 1 "
                "WHEN NOT MATCHED THEN INSERT (k, n) VALUES (s.k, -999);"
            )
            for _ in range(n_increments):
                _retrying(
                    lambda: execute_merge(spark, stmt, {"default.ctr": handle})
                )
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append(f"merge writer {tid}: {e!r}")

    def churn_writer(tid: int) -> None:
        # insert a unique ephemeral row via insert-only MERGE, then
        # DELETE it via the statement executor — the MERGE-vs-DELETE
        # interleaving the verdict names
        try:
            handle = LocalTable(spark, root)
            for i in range(n_churn_iters):
                key = 100 + tid * 10 + i
                ins = (
                    "MERGE INTO default.ctr t "
                    f"USING (SELECT CAST({key} AS BIGINT) AS k) s "
                    "ON s.k = t.k "
                    "WHEN NOT MATCHED THEN INSERT (k, n) VALUES (s.k, 0);"
                )
                _retrying(
                    lambda: execute_merge(spark, ins, {"default.ctr": handle})
                )
                dele = f"DELETE FROM default.ctr WHERE k = {key};"
                _retrying(
                    lambda: execute_statement(
                        spark, dele, {"default.ctr": handle}
                    )
                )
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append(f"churn writer {tid}: {e!r}")

    threads = [
        threading.Thread(target=merge_writer, args=(i,))
        for i in range(n_merge_threads)
    ] + [
        threading.Thread(target=churn_writer, args=(i,))
        for i in range(n_churn_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert errors == []
    rows = sorted(tuple(r) for r in t0.read().collect())
    # serializable: every increment committed exactly once (no lost
    # update — a stale-base overwrite would erase increments), every
    # churn insert/delete pair cancelled, the insert branch never fired
    # for the counter row
    assert rows == [(0, n_merge_threads * n_increments)]
    # one snapshot per committed statement, none lost, none duplicated
    expected_commits = (
        n_merge_threads * n_increments + n_churn_threads * n_churn_iters * 2
    )
    assert t0.current_version == expected_commits
