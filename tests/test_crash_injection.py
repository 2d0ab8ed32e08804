"""Crash-injection around the commit protocol (round-7 queue item 7).

A writer can die at any point between writing its snapshot data dir and
winning the metadata CAS. The protocol's claim: a crash at ANY such point
leaves (a) the published table state untouched and fully readable, (b)
only unreachable garbage on disk — a `snap-*` dir no metadata references
and/or a `.json.tmp` from a killed publisher — which (c) remove_orphans
reclaims exactly, after which (d) a retry of the crashed operation
commits cleanly.

The crash is injected by raising through `_publish_meta` BEFORE the
os.link (and separately by planting the mkstemp leftover a SIGKILLed
publisher leaves): the on-disk state after the exception propagates out
of `_commit` is byte-identical to a process killed at that instant —
`_commit` has no cleanup between the parquet write and the publish except
the CommitConflictError branch, which deliberately does not catch this.
Cross-process kill coverage for the CAS itself lives in
scripts/mp_commit_race.py (two real JVMs racing one root); this test
covers the crash-recovery half the storm tests don't.

Reference contract: Iceberg commits are all-or-nothing metadata swaps;
uncommitted data files are invisible and reclaimed by
remove_orphan_files (IcebergJavaApiAppend.java:92-94 commit protocol).
"""

from __future__ import annotations

import os

import pytest

from iceberg_examples_spark.catalog import LocalTable


class _InjectedCrash(RuntimeError):
    """Stands in for SIGKILL: raised from inside _publish_meta before the
    link, it unwinds past _commit without any cleanup running — the same
    on-disk state a killed process leaves."""


def _crash_before_link(monkeypatch, table: LocalTable) -> None:
    def boom(meta, version):  # noqa: ANN001 - test double
        raise _InjectedCrash(f"killed before linking v{version}")

    monkeypatch.setattr(table, "_publish_meta", boom)


def _snap_dirs(root: str) -> set[str]:
    return {n for n in os.listdir(root) if n.startswith("snap-")}


def test_crash_between_data_write_and_publish_recovers(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "tbl_crash")
    t = LocalTable(spark, root)
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    before_rows = sorted(tuple(r) for r in t.read().collect())
    before_dirs = _snap_dirs(root)

    crasher = LocalTable(spark, root)
    _crash_before_link(monkeypatch, crasher)
    with pytest.raises(_InjectedCrash):
        crasher.append(spark.createDataFrame([(3, "c")], "k long, v string"))

    # (a) published state untouched, (b) exactly one unreachable dir
    assert sorted(tuple(r) for r in t.read().collect()) == before_rows
    assert t.current_version == 0
    orphans = _snap_dirs(root) - before_dirs
    assert len(orphans) == 1

    # a killed PUBLISHER additionally leaves its mkstemp tmp behind
    # (SIGKILL skips the finally-unlink); plant that state too
    tmp_file = os.path.join(root, "deadbeef.json.tmp")
    with open(tmp_file, "w") as f:
        f.write("{}")

    # an unrelated writer is never blocked by the garbage
    t.append(spark.createDataFrame([(4, "d")], "k long, v string"))
    assert t.current_version == 1

    # (c) recovery reclaims exactly the orphan dir + the tmp file
    assert t.remove_orphans(older_than_s=0) == 2
    assert _snap_dirs(root) - before_dirs != orphans  # crashed dir gone
    assert not os.path.exists(tmp_file)
    for d in _snap_dirs(root):  # every referenced dir survived
        assert os.path.isdir(os.path.join(root, d))

    # (d) the crashed operation retried on a fresh handle commits
    retry = LocalTable(spark, root)
    retry.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3, 4]


def test_orphan_grace_protects_inflight_commit(spark, tmp_path, monkeypatch):
    """remove_orphans with the default grace must NOT sweep a fresh
    crashed dir (it is indistinguishable from an in-flight commit's);
    only the explicit 0-second maintenance-window sweep may."""
    root = str(tmp_path / "tbl_grace")
    t = LocalTable(spark, root)
    t.create(spark.createDataFrame([(1,)], "k long"))
    crasher = LocalTable(spark, root)
    _crash_before_link(monkeypatch, crasher)
    with pytest.raises(_InjectedCrash):
        crasher.append(spark.createDataFrame([(2,)], "k long"))

    assert t.remove_orphans() == 0  # default 3-day grace: dir survives
    assert t.remove_orphans(older_than_s=0) == 1


def test_crash_mid_storm_does_not_disturb_other_writers(
    spark, tmp_path, monkeypatch
):
    """One writer crashes between data write and publish while others
    keep committing: every surviving writer's row lands exactly once and
    the crashed writer's row never appears."""
    import threading

    from iceberg_examples_spark.catalog import CommitConflictError

    root = str(tmp_path / "tbl_crashstorm")
    t0 = LocalTable(spark, root)
    t0.create(spark.createDataFrame([(0,)], "id long"))
    errors: list[str] = []

    def writer(i: int) -> None:
        try:
            h = LocalTable(spark, root)
            if i == 3:
                _crash_before_link(monkeypatch, h)
                with pytest.raises(_InjectedCrash):
                    h.append(spark.createDataFrame([(i,)], "id long"))
                return
            df = spark.createDataFrame([(i,)], "id long")
            for _ in range(64):
                try:
                    h.append(df)
                    return
                except CommitConflictError:
                    continue
            errors.append(f"writer {i} exhausted retries")
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append(f"writer {i}: {e!r}")

    threads = [
        threading.Thread(target=writer, args=(i,)) for i in range(1, 7)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert errors == []
    got = sorted(r["id"] for r in t0.read().collect())
    assert got == [0, 1, 2, 4, 5, 6]  # 3 crashed pre-publish: invisible
    assert t0.remove_orphans(older_than_s=0) >= 1  # its dir was garbage
