"""Property test: LocalTable's snapshot lifecycle against an independent
Python model.

Hypothesis drives random operation sequences (append / overwrite / stage /
publish / drop_staged / compact / expire_snapshots / remove_orphans) and
after every step asserts that the real table's visible contents, current
version, and snapshot log agree with a ~30-line pure-Python model of the
intended semantics. This is the same independent-model discipline as
tests/test_merge_properties.py, applied to the commit protocol: any drift
in version numbering (e.g. staged snapshots colliding with data commits),
retention, or publish fast-forward rules falsifies within a few examples.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_examples_spark.catalog import LocalTable


class Model:
    """Pure-Python mirror of LocalTable's intended snapshot semantics."""

    def __init__(self):
        self.snaps: dict[int, tuple[list[int], bool]] = {}  # v -> (rows, staged)
        self.current = -1
        self.minted = -1  # highest version ever assigned — never reused

    def _next_version(self) -> int:
        self.minted += 1
        return self.minted

    def rows(self, version: int | None = None) -> list[int]:
        v = self.current if version is None else version
        return sorted(self.snaps[v][0])

    def append(self, rows: list[int]) -> None:
        base = self.snaps[self.current][0] if self.current >= 0 else []
        self.snaps[self._next_version()] = (base + rows, False)
        self.current = max(self.snaps.keys())

    def overwrite(self, rows: list[int]) -> None:
        self.snaps[self._next_version()] = (rows, False)
        self.current = max(self.snaps.keys())

    def stage(self, rows: list[int]) -> int:
        v = self._next_version()
        base = self.snaps[self.current][0] if self.current >= 0 else []
        self.snaps[v] = (base + rows, True)
        return v

    def staged_versions(self) -> list[int]:
        return [v for v, (_, s) in self.snaps.items() if s]

    def compact(self) -> None:
        self.snaps[self._next_version()] = (
            list(self.snaps[self.current][0]),
            False,
        )
        self.current = max(self.snaps.keys())

    def expire(self, keep_last: int) -> int:
        # staged snapshots are pending work — never expired; retention
        # applies to the data lineage only (mirrors LocalTable)
        data = sorted(v for v, (_, s) in self.snaps.items() if not s)
        if len(data) <= keep_last:
            return 0
        expired = data[: len(data) - keep_last]
        for v in expired:
            del self.snaps[v]
        return len(expired)


OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 9), max_size=3)),
        st.tuples(st.just("overwrite"), st.lists(st.integers(0, 9), max_size=3)),
        st.tuples(st.just("stage"), st.lists(st.integers(0, 9), max_size=3)),
        st.tuples(st.just("publish"), st.just([])),
        st.tuples(st.just("drop_staged"), st.just([])),
        st.tuples(st.just("compact"), st.just([])),
        st.tuples(st.just("expire"), st.just([])),
        st.tuples(st.just("orphans"), st.just([])),
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_lifecycle_matches_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("lifec") / "tbl")
    t = LocalTable(spark, root)
    m = Model()
    m.parent_of = {}

    def df(rows):
        return spark.createDataFrame([(r,) for r in rows], "id long")

    t.create(df([0]))
    m.snaps[0] = ([0], False)
    m.current = 0
    m.minted = 0

    for op, rows in ops:
        if op == "append":
            t.append(df(rows))
            m.append(rows)
        elif op == "overwrite":
            t.overwrite(df(rows))
            m.overwrite(rows)
        elif op == "stage":
            base = t.read() if t.exists() else df([])
            v_real = t.stage(base.unionByName(df(rows)))
            v_model = m.stage(rows)
            m.parent_of[v_model] = m.current
            assert v_real == v_model
        elif op == "publish":
            staged = m.staged_versions()
            if not staged:
                continue
            v = staged[0]
            if m.parent_of[v] == m.current:
                t.publish(v)
                m.snaps[v] = (m.snaps[v][0], False)
                m.current = v
            else:
                from iceberg_examples_spark.catalog import (
                    CommitConflictError,
                )

                with pytest.raises(CommitConflictError):
                    t.publish(v)
        elif op == "drop_staged":
            staged = m.staged_versions()
            if not staged:
                continue
            v = staged[0]
            t.drop_staged(v)
            del m.snaps[v]
        elif op == "compact":
            t.compact(target_files=1)
            m.compact()
        elif op == "expire":
            # no skips: staged snapshots are retained by both sides, and
            # current is always the max data snapshot, so expiry is legal
            # in every reachable state
            assert t.expire_snapshots(keep_last=2) == m.expire(2)
        elif op == "orphans":
            # no crashed commits simulated, and the grace period must
            # protect anything fresh regardless
            assert t.remove_orphans() == 0
            assert t.remove_orphans(older_than_s=0) == 0

        # invariants after every step
        assert t.current_version == m.current
        assert sorted(r.id for r in t.read().collect()) == m.rows()
        assert sorted(s["version"] for s in t.snapshots()) == sorted(
            m.snaps.keys()
        )
        for v in m.snaps:
            assert sorted(r.id for r in t.read(v).collect()) == m.rows(v)
