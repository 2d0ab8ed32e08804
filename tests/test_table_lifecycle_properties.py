"""Property test: LocalTable's snapshot lifecycle against an independent
Python model.

Hypothesis drives random operation sequences (append / overwrite / stage /
publish / drop_staged / compact / rollback / expire_snapshots /
remove_orphans, plus tag/branch refs and branch writes) and
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
        self.refs: dict[str, tuple[str, int]] = {}  # name -> (type, version)

    def pinned(self) -> set[int]:
        """Tag targets; for branches, the head plus its STAGED ancestry —
        mirrors LocalTable._pinned_versions (reference retention must
        cover the lineage fast_forward walks, not just the head)."""
        out = set()
        for ty, v in self.refs.values():
            out.add(v)
            if ty == "branch":
                x = v
                while x in self.snaps and self.snaps[x][1]:
                    out.add(x)
                    x = self.parent_of.get(x, -1)
        return out

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

    def rollback(self, v: int) -> int:
        """Metadata-only restore: a NEW data snapshot whose rows are the
        target's (the engine shares the data dir; rows are what the
        model checks)."""
        nv = self._next_version()
        self.snaps[nv] = (list(self.snaps[v][0]), False)
        self.current = nv
        return nv

    def expire(self, keep_last: int) -> int:
        # staged snapshots are pending work — never expired; retention
        # applies to the data lineage only, and ref-pinned snapshots
        # survive regardless (mirrors LocalTable)
        data = sorted(v for v, (_, s) in self.snaps.items() if not s)
        if len(data) <= keep_last:
            return 0
        expired = [
            v for v in data[: len(data) - keep_last] if v not in self.pinned()
        ]
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
        st.tuples(st.just("rollback"), st.just([])),
        st.tuples(st.just("expire"), st.just([])),
        st.tuples(st.just("orphans"), st.just([])),
        st.tuples(st.just("tag"), st.sampled_from(["r1", "r2"])),
        st.tuples(st.just("branch"), st.sampled_from(["b1", "b2"])),
        st.tuples(
            st.just("branch_append"), st.lists(st.integers(0, 9), max_size=3)
        ),
        st.tuples(
            st.just("branch_overwrite"), st.lists(st.integers(0, 9), max_size=3)
        ),
        st.tuples(st.just("fast_forward"), st.just([])),
        st.tuples(st.just("drop_ref"), st.sampled_from(["r1", "b1"])),
    ),
    min_size=1,
    max_size=10,
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
    m.overwrote = set()  # versions minted by branch_overwrite

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
            if v in m.pinned():
                # a ref (branch head) pins the snapshot — engine refuses
                with pytest.raises(ValueError):
                    t.drop_staged(v)
            else:
                t.drop_staged(v)
                del m.snaps[v]
        elif op == "compact":
            t.compact(target_files=1)
            m.compact()
        elif op == "rollback":
            # roll back to the OLDEST surviving non-current data snapshot
            # (deterministic pick); rollback to current is not a state
            # change worth modeling
            data = sorted(v for v, (_, s) in m.snaps.items() if not s)
            targets = [v for v in data if v != m.current]
            if not targets:
                continue
            v = targets[0]
            v_real = t.rollback(v)
            v_model = m.rollback(v)
            assert v_real == v_model
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
        elif op in ("tag", "branch"):
            name = rows  # strategy passes the ref name in the 2nd slot
            mk = t.create_tag if op == "tag" else t.create_branch
            if name in m.refs:
                with pytest.raises(ValueError):
                    mk(name)
            else:
                mk(name)
                m.refs[name] = (op, m.current)
        elif op == "branch_append":
            branches = sorted(
                n for n, (ty, _) in m.refs.items() if ty == "branch"
            )
            if not branches:
                continue
            name = branches[0]
            head = m.refs[name][1]
            v_real = t.append_to_branch(name, df(rows))
            v_model = m._next_version()
            m.snaps[v_model] = (m.snaps[head][0] + rows, True)
            m.refs[name] = ("branch", v_model)
            m.parent_of[v_model] = head
            assert v_real == v_model
        elif op == "branch_overwrite":
            branches = sorted(
                n for n, (ty, _) in m.refs.items() if ty == "branch"
            )
            if not branches:
                continue
            name = branches[0]
            head = m.refs[name][1]
            v_real = t.overwrite_branch(name, df(rows))
            v_model = m._next_version()
            m.snaps[v_model] = (list(rows), True)
            m.refs[name] = ("branch", v_model)
            # collapse rule: replacing an overwrite epoch re-parents to
            # ITS parent (the superseded epoch drops out of the lineage)
            if head in m.overwrote and m.snaps.get(head, (None, False))[1]:
                m.parent_of[v_model] = m.parent_of[head]
            else:
                m.parent_of[v_model] = head
            m.overwrote.add(v_model)
            assert v_real == v_model
        elif op == "fast_forward":
            from iceberg_examples_spark.catalog import CommitConflictError

            branches = sorted(
                n for n, (ty, _) in m.refs.items() if ty == "branch"
            )
            if not branches:
                continue
            name = branches[0]
            head = m.refs[name][1]
            path, v, reachable = [], head, True
            while v != m.current:
                if v not in m.parent_of:
                    # walk crossed out of the staged branch chain without
                    # hitting current: main is not an ancestor
                    reachable = False
                    break
                path.append(v)
                v = m.parent_of[v]
            if reachable:
                t.fast_forward(name)
                for pv in path:
                    m.snaps[pv] = (m.snaps[pv][0], False)
                m.current = head
            else:
                with pytest.raises(CommitConflictError):
                    t.fast_forward(name)
        elif op == "drop_ref":
            name = rows
            if name in m.refs:
                t.drop_ref(name)
                del m.refs[name]
            else:
                with pytest.raises(ValueError):
                    t.drop_ref(name)

        # invariants after every step
        assert t.current_version == m.current
        assert sorted(r.id for r in t.read().collect()) == m.rows()
        assert sorted(s["version"] for s in t.snapshots()) == sorted(
            m.snaps.keys()
        )
        for v in m.snaps:
            assert sorted(r.id for r in t.read(v).collect()) == m.rows(v)
        assert t.refs() == {
            n: {"type": ty, "version": rv} for n, (ty, rv) in m.refs.items()
        }
        for n, (_ty, rv) in m.refs.items():
            assert t.resolve_ref(n) == rv
            assert sorted(r.id for r in t.read(n).collect()) == m.rows(rv)


def test_rollback_then_expire_keeps_shared_data(spark, tmp_path):
    """rollback_to_snapshot semantics: current moves back metadata-only;
    the rollback entry SHARES the restored snapshot's data dir, so a
    later expiry that drops the original snapshot must NOT delete the
    dir any surviving snapshot still references (Iceberg's
    unreferenced-files-only expire rule)."""
    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "good")], "k long, v string"))
    t.append(spark.createDataFrame([(2, "bad")], "k long, v string"))
    assert sorted(r["v"] for r in t.read().collect()) == ["bad", "good"]
    rb = t.rollback(0)
    # current content is v0's again; the bad snapshot stays in history
    assert [r["v"] for r in t.read().collect()] == ["good"]
    assert {s["version"] for s in t.snapshots()} == {0, 1, rb}
    # time travel still reaches the bad snapshot until expiry
    assert sorted(r["v"] for r in t.read(1).collect()) == ["bad", "good"]
    # expire everything but the rollback head: snapshot 0 shares its
    # data dir with the rollback entry and must survive ON DISK
    n = t.expire_snapshots(keep_last=1)
    assert n >= 1
    assert [r["v"] for r in t.read().collect()] == ["good"]
