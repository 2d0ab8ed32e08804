"""Property test: the native Iceberg layout's lifecycle vs a Python model.

Same independent-model discipline as test_table_lifecycle_properties.py
(LocalTable) applied to the FORMAT layer: hypothesis drives random
sequences of append / position-delete / equality-delete / compact / tag
/ expire / orphan-collection and after every step checks the real
table's visible rows, per-snapshot history, and ref retention against a
small pure-Python model. Interaction bugs the per-feature tests can't
see — an equality delete landing after a compaction, expiry of a
snapshot the next op time-travels to, orphan collection racing MOR debt
— falsify here within a few examples.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

SCHEMA = "k long, s string"


def _tag_of(k: int) -> str:
    return "x" if k % 3 else "y"


class Model:
    """Rows are ints; each carries the sequence number that committed it
    (the spec's ordering input for equality deletes)."""

    def __init__(self):
        self.live: dict[int, int] = {}  # k -> commit seq
        self.seq = 0
        self.history: dict[int, set[int]] = {}  # snapshot id -> live keys
        self.refs: dict[str, int] = {}

    def _snap(self):
        self.history[self.seq] = set(self.live)

    def append(self, keys):
        self.seq += 1
        for k in keys:
            self.live[k] = self.seq
        self._snap()

    def pos_delete(self, mod, rem):
        # a DELETE matching nothing publishes NO snapshot (round-10
        # review rule: no-op MOR DML must not churn empty snapshots)
        hit = [k for k in self.live if k % mod == rem]
        if not hit:
            return
        self.seq += 1
        for k in hit:
            del self.live[k]
        self._snap()

    def eq_delete(self, tag):
        # strictly-earlier sequence numbers only; every currently-live
        # row qualifies (committed before this delete's seq)
        self.seq += 1
        for k in [k for k in self.live if _tag_of(k) == tag]:
            del self.live[k]
        self._snap()

    def compact(self):
        self.seq += 1
        # visible rows unchanged; compaction re-commits them at this seq
        for k in self.live:
            self.live[k] = self.seq
        self._snap()

    def expire(self, keep_last=1):
        keep = set(sorted(self.history)[-keep_last:]) | set(self.refs.values())
        self.history = {v: r for v, r in self.history.items() if v in keep}


ops_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(
                st.integers(min_value=0, max_value=40), min_size=1, max_size=6
            ),
        ),
        st.tuples(
            st.just("pos_delete"),
            st.tuples(
                st.integers(min_value=2, max_value=5),
                st.integers(min_value=0, max_value=4),
            ),
        ),
        st.tuples(st.just("eq_delete"), st.sampled_from(["x", "y"])),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("tag"), st.sampled_from(["t1", "t2"])),
        st.tuples(st.just("expire"), st.none()),
        st.tuples(st.just("orphans"), st.none()),
    ),
    min_size=2,
    max_size=7,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy)
def test_format_lifecycle_matches_model(spark, tmp_path_factory, ops):
    model = Model()
    t = None

    def df_of(keys):
        return spark.createDataFrame(
            [(k, _tag_of(k)) for k in keys], SCHEMA
        )

    # always start with a create so every op has a table
    t = IcebergNativeTable.create(
        spark, str(tmp_path_factory.mktemp("icelife") / "t"), df_of([0, 1, 2])
    )
    model.append([0, 1, 2])

    for op, arg in ops:
        if op == "append":
            # de-dup keys against live (the model's dict would collapse
            # them; the table would hold duplicates — not the semantics
            # under test here)
            fresh = [k for k in dict.fromkeys(arg) if k not in model.live]
            if not fresh:
                continue
            t.append(df_of(fresh))
            model.append(fresh)
        elif op == "pos_delete":
            mod, rem = arg
            # with_coordinates is the supported way to get (file, pos)
            # once the table carries MOR debt — deriving _metadata from
            # a plain scan() fails there (this test found that)
            live = t.scan(with_coordinates=True)
            t.add_position_deletes(
                live.filter(F.col("k") % mod == rem).select("file_path", "pos")
            )
            model.pos_delete(mod, rem)
        elif op == "eq_delete":
            t.add_equality_deletes(
                spark.createDataFrame([(arg,)], "s string"), ["s"]
            )
            model.eq_delete(arg)
        elif op == "compact":
            t.compact()
            model.compact()
        elif op == "tag":
            t.create_tag(arg, snapshot_id=model.seq)
            model.refs[arg] = model.seq
        elif op == "expire":
            t.expire_snapshots(keep_last=1)
            model.expire(keep_last=1)
        elif op == "orphans":
            t.remove_orphan_files(older_than_s=0)

        # invariant 1: visible rows match the model after EVERY op
        got = sorted(r["k"] for r in t.scan().collect())
        assert got == sorted(model.live), (op, arg)

    # invariant 2: every RETAINED snapshot still reads its own history
    for snap_id, expected in model.history.items():
        got = sorted(
            r["k"] for r in t.scan(snapshot_id=snap_id).collect()
        )
        assert got == sorted(expected), f"snapshot {snap_id}"
    # invariant 3: refs resolve to their tagged state
    for name, snap_id in model.refs.items():
        if snap_id in model.history:
            got = sorted(r["k"] for r in t.scan(ref=name).collect())
            assert got == sorted(model.history[snap_id]), name


# ---------------------------------------------------------------------------
# schema evolution: random add/drop/rename/append sequences vs a model
# ---------------------------------------------------------------------------


class SchemaModel:
    """Fields are (id, name); every appended row is stored keyed by
    FIELD ID, so the expected projection under any later schema is just
    a dict lookup — exactly the resolution rule the table must honor."""

    def __init__(self):
        self.fields = [{"id": 1, "name": "k"}, {"id": 2, "name": "a"}]
        self.next_id = 3
        self.rows: list[dict[int, object]] = []
        self.next_k = 0

    def add(self):
        name = f"c{self.next_id}"
        self.fields.append({"id": self.next_id, "name": name})
        self.next_id += 1
        return name

    def droppable(self):
        return [f for f in self.fields if f["name"] != "k"]

    def drop(self, field):
        self.fields.remove(field)

    def rename(self, field, new):
        field["name"] = new

    def append(self, n):
        out = []
        for _ in range(n):
            k = self.next_k
            self.next_k += 1
            row = {1: k}
            for f in self.fields[1:]:
                row[f["id"]] = f"s{k}_{f['id']}"
            self.rows.append(row)
            out.append(row)
        return out

    def expected(self):
        return sorted(
            (
                tuple(r.get(f["id"]) for f in self.fields)
                for r in self.rows
            ),
            key=lambda t: t[0],
        )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_schema_evolution_matches_model(spark, tmp_path_factory, data):
    """Random add/drop/rename/append sequences: after every evolution the
    full scan must equal the model's field-id projection of every row
    ever appended (old generations surface renamed columns' values,
    null-fill added ones, hide dropped ones)."""
    m = SchemaModel()
    ren_ctr = [0]

    def ddl():
        return ", ".join(
            f"{f['name']} long" if f["name"] == "k" else f"{f['name']} string"
            for f in m.fields
        )

    def spark_df(rows):
        return spark.createDataFrame(
            [tuple(r.get(f["id"]) for f in m.fields) for r in rows], ddl()
        )

    t = IcebergNativeTable.create(
        spark,
        str(tmp_path_factory.mktemp("iceevo") / "t"),
        spark_df(m.append(3)),
    )
    n_ops = data.draw(st.integers(min_value=2, max_value=5), label="n_ops")
    for _ in range(n_ops):
        choices = ["append", "add", "rename"]
        if len(m.droppable()) > 1:
            choices.append("drop")
        op = data.draw(st.sampled_from(choices), label="op")
        if op == "append":
            rows = m.append(data.draw(st.integers(1, 3), label="n_rows"))
            t.append(spark_df(rows))
        elif op == "add":
            name = m.add()
            t.update_schema(add=[(name, "string")])
        elif op == "drop":
            f = data.draw(st.sampled_from(m.droppable()), label="victim")
            t.update_schema(drop=[f["name"]])
            m.drop(f)
        elif op == "rename":
            f = data.draw(st.sampled_from(m.droppable()), label="renamed")
            ren_ctr[0] += 1
            new = f"r{ren_ctr[0]}_{f['id']}"
            t.update_schema(rename={f["name"]: new})
            m.rename(f, new)
        got = sorted(
            (tuple(row[f["name"]] for f in m.fields) for row in t.scan().collect()),
            key=lambda x: x[0],
        )
        assert got == m.expected(), op
        assert [c for c in t.scan().columns] == [f["name"] for f in m.fields]
