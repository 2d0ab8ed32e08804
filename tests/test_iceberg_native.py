"""IcebergNativeTable: spec-layout write + metadata-tree scan + MOR.

What the oracle gate can't see, pinned here: the on-disk layout is the
HadoopTables shape real engines expect (version-hint, vN.metadata.json,
Avro manifests with spec field-ids), partition pruning actually reduces
the files handed to the parquet reader, delete application follows the
spec's sequence-number rules, and time travel resolves by id and by
timestamp.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_examples_spark.sources.avro_codec import read_container
from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O", float(i)) for i in range(90)],
        "k long, status string, v double",
    )
    return IcebergNativeTable.create(
        spark, str(tmp_path / "t"), df, partition_by=["status"]
    )


def test_layout_is_hadooptables_shape(table):
    md = table.meta_dir
    with open(os.path.join(md, "version-hint.text")) as f:
        v = int(f.read())
    assert v == 1
    with open(os.path.join(md, f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == 1
    assert meta["partition-specs"][0]["fields"][0]["transform"] == "identity"
    # manifest list is a real Avro container with the spec's field names
    snap = meta["snapshots"][0]
    with open(snap["manifest-list"], "rb") as f:
        schema_text, _, rows = read_container(f.read())
    mf = list(rows)[0]
    assert {"manifest_path", "content", "sequence_number"} <= set(mf)
    # manifest carries the spec's field-ids and Iceberg metadata keys
    with open(mf["manifest_path"], "rb") as f:
        data = f.read()
    schema_text, _, entries = read_container(data)
    sch = json.loads(schema_text)
    assert sch["name"] == "manifest_entry"
    ids = {f["name"]: f.get("field-id") for f in sch["fields"]}
    assert ids["status"] == 0 and ids["data_file"] == 2
    e = list(entries)[0]
    assert e["data_file"]["file_format"] == "PARQUET"
    assert e["data_file"]["partition"]["status"] in ("F", "O")


def test_scan_matches_source_and_prunes_partitions(table):
    full = table.scan()
    assert full.count() == 90
    pruned = table.scan(partition_filter={"status": "F"})
    assert pruned.count() == 30
    # pruning happened at PLANNING: fewer parquet files enter the scan
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    # data files kept the partition column (Iceberg layout, not hive)
    assert pruned.filter(F.col("status") != "F").count() == 0


def test_time_travel_by_id_and_timestamp(table, spark):
    table.append(
        spark.createDataFrame([(1000, "P", 0.0)], "k long, status string, v double")
    )
    assert table.scan().count() == 91
    assert table.scan(snapshot_id=1).count() == 90
    meta = table._metadata()
    ts1 = meta["snapshot-log"][0]["timestamp-ms"]
    assert table.scan(as_of_ms=ts1).count() == 90
    assert table.scan(as_of_ms=meta["last-updated-ms"]).count() == 91
    with pytest.raises(ValueError, match="no snapshot"):
        table.scan(as_of_ms=ts1 - 10_000)


def test_position_deletes_apply_and_are_snapshot_scoped(table, spark):
    live = table.scan().select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "k",
    )
    table.add_position_deletes(
        live.filter(F.col("k") % 9 == 0).select("file_path", "pos")
    )
    after = table.scan()
    assert after.count() == 80
    assert after.filter(F.col("k") % 9 == 0).count() == 0
    # the PRE-delete snapshot still reads complete (MOR, not rewrite)
    assert table.scan(snapshot_id=1).count() == 90


def test_equality_deletes_are_sequence_strict(table, spark):
    table.add_equality_deletes(
        spark.createDataFrame([("F",)], "status string"), ["status"]
    )
    assert table.scan().filter("status = 'F'").count() == 0
    assert table.scan().count() == 60
    # rows appended AFTER the delete's sequence number survive it
    table.append(
        spark.createDataFrame(
            [(2000, "F", 1.0), (2001, "F", 2.0)], "k long, status string, v double"
        )
    )
    assert table.scan().filter("status = 'F'").count() == 2
    assert table.scan().count() == 62


def test_metadata_tables(table, spark):
    table.append(
        spark.createDataFrame([(1, "P", 0.0)], "k long, status string, v double")
    )
    snaps = table.snapshots_df().collect()
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[1]["parent_id"] == 1
    hist = table.history_df().collect()
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    files = table.files_df().collect()
    assert all(f["content"] == 0 for f in files)
    assert sum(f["record_count"] for f in files) == 91


def test_empty_partition_filter_returns_empty_with_schema(table):
    out = table.scan(partition_filter={"status": "ZZ"})
    assert out.count() == 0
    assert out.columns == ["k", "status", "v"]


def test_create_refuses_existing_location(table, spark):
    with pytest.raises(ValueError, match="already exists"):
        IcebergNativeTable.create(
            spark,
            table.location,
            spark.createDataFrame([(1,)], "k long"),
        )


def test_typed_partition_values_roundtrip(spark, tmp_path):
    """Long and date partition columns carry TYPED values through the
    manifest (hive dir-name parsing is the writer's detail, not the
    metadata contract)."""
    import datetime

    df = spark.createDataFrame(
        [
            (1, 10, datetime.date(2024, 1, 1)),
            (2, 10, datetime.date(2024, 1, 1)),
            (3, 20, datetime.date(2024, 6, 15)),
        ],
        "k long, bucket long, d date",
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "tp"), df, partition_by=["bucket", "d"]
    )
    assert t.scan(partition_filter={"bucket": 10}).count() == 2
    days = (datetime.date(2024, 6, 15) - datetime.date(1970, 1, 1)).days
    assert t.scan(partition_filter={"d": days}).count() == 1
    # manifest stores ints, not strings
    rec = json.loads(t.files_df().collect()[0]["partition"])
    assert isinstance(rec["bucket"], int)


def test_export_bridge_preserves_state_and_spec(spark, tmp_path):
    """export_iceberg materializes the LocalTable's CURRENT snapshot —
    post-DELETE state, same identity partition spec — and the Iceberg
    readback equals the LocalTable readback exactly."""
    from iceberg_examples_spark.catalog import LocalTable
    from iceberg_examples_spark.sources.iceberg_native import export_iceberg
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "lt"))
    t.create(
        spark.createDataFrame(
            [(i, "a" if i % 2 else "b", float(i)) for i in range(40)],
            "k long, p string, v double",
        ),
        partition_by=["p"],
    )
    execute_statement(
        spark, "DELETE FROM default.t WHERE k < 10;", {"default.t": t}
    )
    ice = export_iceberg(t, str(tmp_path / "ice"))
    local = sorted(tuple(r) for r in t.read().collect())
    exported = sorted(tuple(r) for r in ice.scan().collect())
    assert exported == local and len(exported) == 30
    # spec carried over: partition filter prunes files
    pa = ice.scan(partition_filter={"p": "a"})
    assert pa.count() == 15
    assert len(pa.inputFiles()) < len(ice.scan().inputFiles())


def test_bucket_partition_layout_and_pruning(spark, tmp_path):
    """bucket(col, N): writer buckets with the SPEC's murmur3 (not
    Spark's hash()); a point lookup via where= transforms the literal
    and opens only that bucket's files; every row still found."""
    from iceberg_examples_spark.functions.iceberg_transforms import bucket_value
    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(200)], "age long, name string"
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "tb"), df, partition_by=["bucket(age, 5)"]
    )
    meta = t._metadata()
    assert meta["partition-specs"][0]["fields"][0]["transform"] == "bucket[5]"
    assert meta["partition-specs"][0]["fields"][0]["name"] == "age_bucket"
    # manifest partition values agree with the spec hash, per file
    for f in t.files_df().collect():
        rec = json.loads(f["partition"])
        assert 0 <= rec["age_bucket"] < 5
    probe = t.scan(where={"age": 37})
    assert [r["age"] for r in probe.collect()] == [37]
    assert len(probe.inputFiles()) < len(t.scan().inputFiles())
    # the pruned bucket is the spec's bucket of the literal
    got_dirs = {p.split("_p_age_bucket=")[1].split("/")[0] for p in probe.inputFiles()}
    assert got_dirs == {str(bucket_value(37, 5))}
    # null-keyed rows land in the null partition dir and never match
    t.append(spark.createDataFrame([(None, "nil")], "age long, name string"))
    assert t.scan(where={"age": 37}).count() == 1


def test_month_and_truncate_transforms_roundtrip(spark, tmp_path):
    import datetime

    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    df = spark.createDataFrame(
        [
            (1, datetime.date(1995, 3, 7), "alpha"),
            (2, datetime.date(1995, 3, 29), "alto"),
            (3, datetime.date(1995, 4, 1), "beta"),
        ],
        "k long, d date, s string",
    )
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "tm"),
        df,
        partition_by=["month(d)", "truncate(s, 2)"],
    )
    march = (1995 - 1970) * 12 + 2
    got = t.scan(partition_filter={"d_month": march})
    assert sorted(r["k"] for r in got.collect()) == [1, 2]
    # truncate groups al* together, pruning by prefix value
    al = t.scan(partition_filter={"s_trunc": "al"})
    assert sorted(r["k"] for r in al.collect()) == [1, 2]
    both = t.scan(partition_filter={"d_month": march, "s_trunc": "be"})
    assert both.count() == 0  # conjunction prunes everything


def test_where_is_also_a_row_filter(spark, tmp_path):
    """where= on a NON-partition column cannot prune but must still
    filter rows (residual evaluation) — correctness never depends on
    the spec covering the predicate."""
    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    df = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(20)], "k long, s string"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "tw"), df)
    assert t.scan(where={"s": "x"}).count() == 10
    assert t.scan(where={"k": 7}).collect()[0]["s"] == "x"


def test_reads_v1_format_table(spark, tmp_path):
    """Format-version 1 tolerance: the reference's HadoopTables demo
    creates a V1 table (IcebergHadoopTables.java:21 'iceberg_v1table').
    v1 differs in exactly the ways this fixture exercises — snapshots
    may inline `manifests` (no manifest-list file), manifest entries
    carry no sequence numbers, data_file has no content/equality_ids —
    and the reader must scan it anyway."""
    from iceberg_examples_spark.sources.avro_codec import write_container
    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    loc = tmp_path / "v1tbl"
    (loc / "metadata").mkdir(parents=True)
    (loc / "data").mkdir()
    # one parquet data file, written by Spark
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).coalesce(1).write.parquet(str(loc / "data" / "d1"))
    pq_file = next(
        p for p in (loc / "data" / "d1").iterdir() if p.suffix == ".parquet"
    )
    # v1-shaped manifest: no sequence-number fields, no content
    v1_entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {"type": "record", "name": "r102", "fields": []},
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                    ],
                },
            },
        ],
    }
    manifest = loc / "metadata" / "m1.avro"
    manifest.write_bytes(
        write_container(
            v1_entry_schema,
            iter(
                [
                    {
                        "status": 1,
                        "snapshot_id": 99,
                        "data_file": {
                            "file_path": str(pq_file),
                            "file_format": "PARQUET",
                            "partition": {},
                            "record_count": 3,
                            "file_size_in_bytes": pq_file.stat().st_size,
                        },
                    }
                ]
            ),
        )
    )
    meta = {
        "format-version": 1,
        "location": str(loc),
        "last-updated-ms": 1,
        "last-column-id": 2,
        "schema": {  # v1 singular key; keep schemas too for the reader
            "type": "struct",
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "v", "required": False, "type": "string"},
            ],
        },
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"},
                    {"id": 2, "name": "v", "required": False, "type": "string"},
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "snapshots": [
            {
                "snapshot-id": 99,
                "timestamp-ms": 1,
                "summary": {"operation": "append"},
                "manifests": [str(manifest)],  # v1 inline form
            }
        ],
        "current-snapshot-id": 99,
        "snapshot-log": [{"timestamp-ms": 1, "snapshot-id": 99}],
    }
    (loc / "metadata" / "v1.metadata.json").write_text(json.dumps(meta))
    (loc / "metadata" / "version-hint.text").write_text("1")

    t = IcebergNativeTable(spark, str(loc))
    got = sorted(tuple(r) for r in t.scan().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    assert t.snapshots_df().collect()[0]["snapshot_id"] == 99
    assert t.files_df().collect()[0]["record_count"] == 3


def test_compact_pays_down_mor_debt_and_keeps_time_travel(spark, tmp_path):
    """compact() rewrites live rows (position + equality deletes
    APPLIED) into a replace snapshot; the new scan plans no delete
    files, and pre-compaction snapshots still read their own state."""
    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O") for i in range(60)], "k long, s string"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "tc"), df)
    live = t.scan().select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "k",
    )
    t.add_position_deletes(
        live.filter(F.col("k") % 5 == 0).select("file_path", "pos")
    )
    t.add_equality_deletes(spark.createDataFrame([("F",)], "s string"), ["s"])
    expect = sorted(r["k"] for r in t.scan().collect())
    t.compact()
    got = t.scan()
    assert sorted(r["k"] for r in got.collect()) == expect
    # the compacted snapshot plans ZERO delete files
    _, _, data, pos_del, eq_del = t._plan()
    assert pos_del == [] and eq_del == []
    # time travel: the original snapshot still reads everything
    assert t.scan(snapshot_id=1).count() == 60
    assert t.snapshots_df().collect()[-1]["operation"] == "replace"


def test_expire_and_orphan_cleanup(spark, tmp_path):
    """expire_snapshots keeps the newest N; remove_orphan_files then
    physically deletes what no retained snapshot references — and the
    surviving table still reads completely."""
    import os as _os

    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "te"),
        spark.createDataFrame([(1, "a")], "k long, v string"),
    )
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.compact()
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    removed = t.remove_orphan_files(older_than_s=0)
    assert removed  # pre-compaction data files + old manifests went away
    assert sorted(r["k"] for r in t.scan().collect()) == [1, 2]
    # every surviving parquet under data/ is referenced by the live scan
    from urllib.parse import urlparse

    live_files = {urlparse(p).path for p in t.scan().inputFiles()}
    on_disk = {
        _os.path.abspath(_os.path.join(r, n))
        for r, _d, ns in _os.walk(str(tmp_path / "te" / "data"))
        for n in ns
        if n.endswith(".parquet")
    }
    assert on_disk == live_files
    import pytest as _pytest

    with _pytest.raises(ValueError, match="current snapshot"):
        t.expire_snapshots(keep_last=0)


def test_concurrent_appends_conflict_and_retry_to_serializable(spark, tmp_path):
    """HadoopTables commit protocol: N threads race appends; losers get
    CommitConflictError and retry against the republished tree. Every
    row lands exactly once, version history is gapless, and orphan
    collection reclaims losers' abandoned attempt files without
    touching live ones."""
    import threading

    from iceberg_examples_spark.catalog import CommitConflictError
    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    t = IcebergNativeTable.create(
        spark, str(tmp_path / "race"),
        spark.createDataFrame([(0, "seed")], "k long, v string"),
    )
    conflicts = []

    def writer(i: int):
        df = spark.createDataFrame([(i, f"w{i}")], "k long, v string")
        for _ in range(20):  # bounded retry
            try:
                t.append(df)
                return
            except CommitConflictError:
                conflicts.append(i)
            except Exception as e:  # pragma: no cover - diagnostics
                conflicts.append((i, str(e)[:80]))
                raise
        raise AssertionError(f"writer {i} never committed")

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(1, 5)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    rows = sorted(r["k"] for r in t.scan().collect())
    assert rows == [0, 1, 2, 3, 4]
    # gapless version chain: one metadata file per committed version
    assert t._current_version() == 5
    # losers' abandoned files are collectable and collection is safe
    t.remove_orphan_files(older_than_s=0)
    assert sorted(r["k"] for r in t.scan().collect()) == [0, 1, 2, 3, 4]
    # the protocol actually exercised the conflict path (4 racers on one
    # table: at least one collision is overwhelmingly likely; if this
    # ever flakes to zero, raise the thread count, don't delete the line)
    assert conflicts or len(threads) == 1


def test_refs_tags_branches_and_retention(spark, tmp_path):
    """Spec refs: tags/branches are named snapshot pointers readable via
    scan(ref=), the main branch tracks the current snapshot, and a
    ref'd snapshot SURVIVES expire_snapshots (the spec's ref-retention
    rule — tagging exists precisely to defeat expiry)."""
    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    t = IcebergNativeTable.create(
        spark, str(tmp_path / "tr"),
        spark.createDataFrame([(1, "a")], "k long, v string"),
    )
    t.create_tag("v1.0")  # tag snapshot 1
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    meta = t._metadata()
    assert meta["refs"]["main"] == {"snapshot-id": 3, "type": "branch"}
    assert meta["refs"]["v1.0"] == {"snapshot-id": 1, "type": "tag"}
    assert t.scan(ref="v1.0").count() == 1
    assert t.scan(ref="main").count() == 3
    with pytest.raises(ValueError, match="unknown ref"):
        t.scan(ref="nope")
    # expiry keeps the tagged snapshot alive alongside the newest
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [2]  # snapshot 1 protected by the tag
    assert t.scan(ref="v1.0").count() == 1
    t.remove_orphan_files(older_than_s=0)
    assert t.scan(ref="v1.0").count() == 1  # tag's files retained
    assert t.scan().count() == 3
    # refs are droppable (except main), after which expiry reclaims
    with pytest.raises(ValueError, match="main"):
        t.drop_ref("main")
    t.drop_ref("v1.0")
    assert t.expire_snapshots(keep_last=1) == [1]


def test_scan_with_coordinates_under_mor_debt(spark, tmp_path):
    """(file_path, pos) coordinates stay available on a scan that
    already applies deletes — the supported input for the NEXT
    position-delete commit (plain _metadata is unresolvable after the
    anti-joins; the lifecycle property test falsified that approach)."""
    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    t = IcebergNativeTable.create(
        spark, str(tmp_path / "twc"),
        spark.createDataFrame([(i, "s") for i in range(30)], "k long, v string"),
    )
    first = t.scan(with_coordinates=True)
    assert {"file_path", "pos"} <= set(first.columns)
    t.add_position_deletes(
        first.filter(F.col("k") < 10).select("file_path", "pos")
    )
    # debt exists now; coordinates must still resolve and stay accurate
    second = t.scan(with_coordinates=True)
    assert second.count() == 20
    t.add_position_deletes(
        second.filter(F.col("k") >= 25).select("file_path", "pos")
    )
    assert sorted(r["k"] for r in t.scan().collect()) == list(range(10, 25))


def test_where_on_identity_date_partition_prunes_correctly(spark, tmp_path):
    """Manifests store DATE partition values as epoch-day ints; a where=
    with a date literal must encode before comparing — the unencoded
    comparison pruned EVERY file and silently returned nothing (round-9
    self-review)."""
    import datetime

    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 6, 15)
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "tid"),
        spark.createDataFrame([(1, d1), (2, d1), (3, d2)], "k long, d date"),
        partition_by=["d"],
    )
    got = t.scan(where={"d": d1})
    assert sorted(r["k"] for r in got.collect()) == [1, 2]
    assert len(got.inputFiles()) < len(t.scan().inputFiles())


def test_explicit_sequence_number_zero_is_honored(spark, tmp_path):
    """A manifest entry with data_sequence_number=0 (v1-origin files in
    an upgraded table) must keep 0 — the falsy-`or` chain fell through
    to the manifest list's seq and let equality deletes skip those rows
    (round-9 self-review)."""
    import json as _json

    from iceberg_examples_spark.sources.avro_codec import read_container, write_container
    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "ts0"),
        spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string"),
    )
    # rewrite the data manifest in place with entry seq = 0 while the
    # manifest list still says seq 1 (the upgraded-table shape)
    meta = t._metadata()
    snap = meta["snapshots"][0]
    with open(snap["manifest-list"], "rb") as f:
        mf = list(read_container(f.read())[2])[0]
    with open(mf["manifest_path"], "rb") as f:
        text, _, rows = read_container(f.read())
        entries = list(rows)
    for e in entries:
        e["data_sequence_number"] = 0
        e["file_sequence_number"] = 0
    with open(mf["manifest_path"], "wb") as f:
        f.write(write_container(_json.loads(text), iter(entries)))
    _, _, data, _, _ = t._plan()
    # one file per input split; every entry keeps its explicit 0
    assert data and all(d["seq"] == 0 for d in data)
    # and an equality delete (seq 2) now correctly hits the seq-0 rows
    t.add_equality_deletes(spark.createDataFrame([("x",)], "s string"), ["s"])
    assert sorted(r["k"] for r in t.scan().collect()) == [2]


def test_delete_commit_conflicts_against_interleaved_append(spark, tmp_path):
    """A delete commit stamps its sequence number into the delete FILES
    before publishing; an append interleaving between that read and the
    publish must surface as CommitConflictError, never a silent publish
    whose claimed seq collides with the interleaved commit's (round-9
    self-review)."""
    from iceberg_examples_spark.catalog import CommitConflictError
    from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable

    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "tdc"),
        spark.createDataFrame([(1, "x")], "k long, s string"),
    )
    # stale base: read the tree, then let an append publish behind it
    stale = t._read_tree()
    t.append(spark.createDataFrame([(2, "y")], "k long, s string"))
    with pytest.raises(CommitConflictError):
        t._commit(
            spark.createDataFrame([(3, "z")], "k long, s string"),
            operation="append",
            first=False,
            base=stale,
        )


def test_mor_scan_survives_awkward_table_location(spark, tmp_path):
    """Round-9 ADVICE (medium): Spark renders _metadata.file_path
    URL-encoded (space -> %20, %% -> %%25), so the seq-map join must use
    the same encoding — the old f"file:{path}" form made every MOR scan
    on a location with a space silently return ZERO rows."""
    loc = str(tmp_path / "dir with space %41")
    t = IcebergNativeTable.create(
        spark,
        loc,
        spark.createDataFrame([(i, float(i)) for i in range(10)], "k long, v double"),
    )
    live = t.scan(with_coordinates=True)
    t.add_position_deletes(
        live.filter(F.col("k") % 2 == 0).select("file_path", "pos")
    )
    t.add_equality_deletes(
        spark.createDataFrame([(7,)], "k long"), ["k"]
    )
    got = sorted(r["k"] for r in t.scan().collect())
    assert got == [1, 3, 5, 9]


def test_mor_plan_size_constant_in_delete_file_count(spark, tmp_path):
    """Round-9 verdict (weak #1): delete application must plan ONE
    multi-path scan per content type / equality-column-set, not one
    sub-plan per delete file — a churned table with thousands of
    uncompacted delete files would otherwise spend its time in driver
    plan analysis. Pin: scan count stays flat as delete commits grow."""
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "tp"),
        spark.createDataFrame([(i, float(i)) for i in range(40)], "k long, v double"),
    )
    # 4 position-delete commits + 3 equality-delete commits on ONE column set
    for n in range(4):
        live = t.scan(with_coordinates=True)
        t.add_position_deletes(
            live.filter(F.col("k") == n).select("file_path", "pos")
        )
    for n in range(3):
        t.add_equality_deletes(
            spark.createDataFrame([(30 + n,)], "k long"), ["k"]
        )
    df = t.scan()
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_scans = plan.count("Relation")
    # 1 data scan + 1 position-delete scan + 1 equality-delete scan;
    # give one slot of slack for plan-printer drift, no more
    assert n_scans <= 4, f"{n_scans} file relations in plan:\n{plan[:2000]}"
    assert sorted(r["k"] for r in df.collect()) == sorted(
        set(range(40)) - {0, 1, 2, 3, 30, 31, 32}
    )


def test_partition_filter_unknown_key_raises(table):
    """Round-9 ADVICE: a typo'd partition_filter key used to compare
    against a field no manifest carries and silently pruned every file."""
    with pytest.raises(ValueError, match="unknown partition field"):
        table.scan(partition_filter={"statuz": "F"})
    # source-column names are ALSO not partition field names when the
    # transform renames (bucket/month) — the error text points at where=
    with pytest.raises(ValueError, match="where="):
        table.scan(partition_filter={"nope": 1})


def test_v1_table_is_readonly_with_clear_error(spark, tmp_path):
    """Round-9 ADVICE: appending to a tolerated v1 table used to
    KeyError deep inside the Avro writer; now it refuses up front."""
    import shutil

    # build a v2 table then rewrite its metadata to claim v1 with
    # inline manifests (the tolerated read shape)
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "v1t"),
        spark.createDataFrame([(1, "a")], "k long, v string"),
    )
    meta, v = t._read_tree()
    meta["format-version"] = 1
    with open(os.path.join(t.meta_dir, f"v{v}.metadata.json"), "w") as f:
        json.dump(meta, f)
    assert t.scan().count() == 1  # still readable
    with pytest.raises(ValueError, match="read-only"):
        t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    shutil.rmtree(str(tmp_path / "v1t"))


def test_orphan_sweep_grace_period_protects_inflight_commits(spark, tmp_path):
    """Round-9 ADVICE: the ungated sweep deleted files of an in-flight
    commit (written before metadata publishes). Default older_than is a
    3-day grace window; 0 opts into immediate collection."""
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "to"),
        spark.createDataFrame([(1, "a")], "k long, v string"),
    )
    # simulate an in-flight commit: a fresh data file not yet referenced
    inflight = os.path.join(t.location, "data", "seq-00099-abc")
    os.makedirs(inflight)
    spark.createDataFrame([(9, "z")], "k long, v string").coalesce(
        1
    ).write.mode("overwrite").parquet(inflight)
    assert t.remove_orphan_files() == []  # grace period: nothing swept
    removed = t.remove_orphan_files(older_than_s=0)
    assert any("seq-00099-abc" in p for p in removed)


def test_schema_evolution_field_id_resolution(spark, tmp_path):
    """Old data files read through the evolved schema BY FIELD ID: the
    rename surfaces old values under the new name, the added column
    null-fills, the dropped column vanishes — and a second evolution
    compounds (three live file generations in one scan)."""
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "se"),
        spark.createDataFrame(
            [(1, "alice", "addr1", 10.0), (2, "bob", "addr2", 20.0)],
            "k long, name string, addr string, bal double",
        ),
    )
    t.update_schema(
        drop=["addr"], rename={"name": "full_name"}, add=[("tag", "string")]
    )
    t.append(
        spark.createDataFrame(
            [(3, "carol", "t3", 30.0)],
            "k long, full_name string, tag string, bal double",
        )
    )
    t.update_schema(rename={"tag": "label"})
    t.append(
        spark.createDataFrame(
            [(4, "dave", "t4", 40.0)],
            "k long, full_name string, label string, bal double",
        )
    )
    rows = {r["k"]: r for r in t.scan().collect()}
    assert set(t.scan().columns) == {"k", "full_name", "label", "bal"}
    assert rows[1]["full_name"] == "alice" and rows[1]["label"] is None
    assert rows[2]["full_name"] == "bob"
    assert rows[3]["label"] == "t3"  # tag's values follow the id to label
    assert rows[4]["label"] == "t4"
    # metadata: schema history is append-only with fresh ids, never reuse
    meta = t._metadata()
    assert [s["schema-id"] for s in meta["schemas"]] == [0, 1, 2]
    assert meta["current-schema-id"] == 2
    ids = [f["id"] for s in meta["schemas"] for f in s["fields"]]
    by_id = {}
    for s in meta["schemas"]:
        for f in s["fields"]:
            by_id.setdefault(f["id"], set()).add(f["type"])
    assert all(len(ts) == 1 for ts in by_id.values())  # id keeps its type
    assert meta["last-column-id"] == max(ids)
    # snapshots record their commit-time schema id
    assert [s["schema-id"] for s in meta["snapshots"]] == [0, 1, 2]


def test_schema_evolution_survives_mor_and_time_travel(spark, tmp_path):
    """Deletes and time travel compose with evolution: equality deletes
    target CURRENT-schema columns across generations, and a pre-ALTER
    snapshot still reads with its own column set."""
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "semor"),
        spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(6)],
            "k long, name string, bal double",
        ),
    )
    t.update_schema(rename={"name": "full_name"}, add=[("src", "string")])
    t.append(
        spark.createDataFrame(
            [(10, "n10", 10.0, "s2")], "k long, full_name string, bal double, src string"
        )
    )
    # equality delete on the RENAMED column hits generation-1 rows too
    t.add_equality_deletes(
        spark.createDataFrame([("n2",), ("n10",)], "full_name string"),
        ["full_name"],
    )
    got = sorted(r["k"] for r in t.scan().collect())
    assert got == [0, 1, 3, 4, 5]
    # snapshot 1 predates the evolution: it reads the ORIGINAL schema
    old = t.scan(snapshot_id=1)
    assert set(old.columns) == {"k", "name", "bal"}
    assert old.count() == 6


def test_schema_evolution_type_promotion(spark, tmp_path):
    """int->long / float->double promote on read; anything else raises."""
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "sp"),
        spark.createDataFrame([(1, 2.5)], "k int, v float"),
    )
    t.update_schema(promote={"k": "long", "v": "double"})
    t.append(spark.createDataFrame([(2**40, 1e300)], "k long, v double"))
    got = t.scan()
    assert dict(got.dtypes) == {"k": "bigint", "v": "double"}
    assert sorted(r["k"] for r in got.collect()) == [1, 2**40]
    with pytest.raises(ValueError, match="illegal promotion"):
        t.update_schema(promote={"v": "string"})


def test_schema_evolution_guards(spark, tmp_path):
    """Partition-source columns cannot drop; duplicate names refuse."""
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "sg"),
        spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double"),
        partition_by=["s"],
    )
    with pytest.raises(ValueError, match="partition-spec source"):
        t.update_schema(drop=["s"])
    with pytest.raises(ValueError, match="already exists"):
        t.update_schema(rename={"k": "v"})
    with pytest.raises(ValueError, match="already exists"):
        t.update_schema(add=[("v", "double")])
    with pytest.raises(ValueError, match="no column"):
        t.update_schema(drop=["nope"])


def test_manifest_column_bounds_roundtrip(spark, tmp_path):
    """Data-file manifest entries carry lower/upper bounds per field id
    in the spec's single-value serialization (IcebergJavaApiAppend's
    withMetrics parity), aggregated across row groups; long strings
    truncate to a VALID bound (upper's last char increments)."""
    from iceberg_examples_spark.sources.iceberg_native import decode_bound

    long_a = "a" * 30
    long_z = "z" * 30
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "tb"),
        spark.createDataFrame(
            [(5, long_a, 2.5), (17, long_z, -1.0)], "k long, s string, v double"
        ).coalesce(1),
    )
    snap = t._metadata()["snapshots"][0]
    mf = t._manifests(snap)[0]
    e = t._entries(mf["manifest_path"])[0]
    lower = {kv["key"]: kv["value"] for kv in e["data_file"]["lower_bounds"]}
    upper = {kv["key"]: kv["value"] for kv in e["data_file"]["upper_bounds"]}
    # schema ids: k=1, s=2, v=3
    assert decode_bound("long", lower[1]) == 5
    assert decode_bound("long", upper[1]) == 17
    assert decode_bound("double", lower[3]) == -1.0
    assert decode_bound("double", upper[3]) == 2.5
    s_lo, s_up = decode_bound("string", lower[2]), decode_bound("string", upper[2])
    assert len(s_lo) == 16 and long_a >= s_lo  # valid truncated lower
    assert len(s_up) == 16 and long_z <= s_up  # incremented truncated upper
    assert s_up == "z" * 15 + "{"


def test_bounds_prune_skips_data_files(spark, tmp_path):
    """min/max file skipping: a selective equality predicate opens ZERO
    data files outside its bounds — verified against the actual file
    lists handed to the reader."""
    df = (
        spark.range(0, 1000)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .repartitionByRange(4, "k")
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "bp"), df)
    _, _, all_files, _, _ = t._plan()
    assert len(all_files) == 4
    hit = t.scan(where={"k": 500})
    assert len(hit.inputFiles()) == 1  # 3 of 4 files proved irrelevant
    assert [r["v"] for r in hit.collect()] == [1000.0]
    # outside every file's range: zero files planned, empty result
    miss = t.scan(where={"k": 10**9})
    assert miss.inputFiles() == []
    assert miss.count() == 0
    # bounds survive schema evolution: rename keeps the field id
    t.update_schema(rename={"k": "key"})
    hit2 = t.scan(where={"key": 500})
    assert len(hit2.inputFiles()) == 1
    assert [r["v"] for r in hit2.collect()] == [1000.0]


def test_sort_order_metadata_and_written_order(spark, tmp_path):
    """replaceSortOrder parity (IcebergJavaApiUpsert.java:101-104):
    sort-orders + default-sort-order-id live in metadata.json, every
    data file is stamped with the order it was written under (files_df
    exposes it), and the bytes in each file actually come out ordered."""
    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [(i, f"n{(7 * i) % 10}", float(i)) for i in range(100)],
        "k long, name string, v double",
    ).repartition(2)
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "so"), df, sort_by=["name", ("k", "desc")]
    )
    meta = t._metadata()
    assert meta["default-sort-order-id"] == 1
    order = next(o for o in meta["sort-orders"] if o["order-id"] == 1)
    assert order["fields"] == [
        {
            "transform": "identity",
            "source-id": 2,
            "direction": "asc",
            "null-order": "nulls-first",
        },
        {
            "transform": "identity",
            "source-id": 1,
            "direction": "desc",
            "null-order": "nulls-last",
        },
    ]
    # every data file's rows are ordered by (name asc, k desc)
    files = [r for r in t.files_df().collect() if r["content"] == 0]
    assert files and all(r["sort_order_id"] == 1 for r in files)
    for r in files:
        tbl = pq.read_table(r["file_path"]).to_pylist()
        keys = [(row["name"], -row["k"]) for row in tbl]
        assert keys == sorted(keys), r["file_path"]
    # replace_sort_order: later files carry the NEW id; old keep theirs
    t.replace_sort_order([("v", "desc")])
    t.append(
        spark.createDataFrame([(200, "zz", 0.5), (201, "aa", 9.5)], df.schema)
    )
    meta = t._metadata()
    assert meta["default-sort-order-id"] == 2
    by_id = sorted(
        {r["sort_order_id"] for r in t.files_df().collect() if r["content"] == 0}
    )
    assert by_id == [1, 2]
    # dropping back to unsorted = order 0 (never re-allocated)
    t.replace_sort_order(None)
    assert t._metadata()["default-sort-order-id"] == 0


def test_decimal_columns_end_to_end(spark, tmp_path):
    """decimal(p, s) columns: spec bucket transform (murmur3 of the
    minimal two's-complement unscaled bytes — Appendix B's 14.20 vector
    is pinned in test_iceberg_transforms), bounds in unscaled-bytes
    serialization, and where= pruning through both."""
    import decimal

    from iceberg_examples_spark.sources.iceberg_native import decode_bound

    df = spark.createDataFrame(
        [(i, decimal.Decimal(i).scaleb(-2) * 100) for i in range(1, 201)],
        "k long, amount decimal(12, 2)",
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "dec"), df, partition_by=["bucket(amount, 8)"]
    )
    # schema records the parameterized type
    meta = t._metadata()
    f = next(x for x in meta["schemas"][0]["fields"] if x["name"] == "amount")
    assert f["type"] == "decimal(12, 2)"
    # point lookup prunes by the decimal bucket AND filters rows
    probe = decimal.Decimal("37.00")
    got = t.scan(where={"amount": probe}).collect()
    assert [r["k"] for r in got] == [37]
    n_all = len(t._plan()[2])
    n_hit = len(t._plan(partition_filter=None, bounds_filter=None)[2])
    assert n_hit == n_all
    # bucket pruning really reduced the file list
    from iceberg_examples_spark.functions.iceberg_transforms import bucket_value

    b = bucket_value(probe, 8)
    pruned = t._plan(partition_filter={"amount_bucket": b})[2]
    assert 0 < len(pruned) < n_all
    # decimal footer stats aren't liftable by pyarrow: the writer must
    # record NO bound for the decimal column (never a wrong one) while
    # the long column's bounds are present; the serialization itself
    # round-trips
    snap = t._metadata()["snapshots"][0]
    e = t._entries(t._manifests(snap)[0]["manifest_path"])[0]
    lower = {kv["key"]: kv["value"] for kv in e["data_file"]["lower_bounds"]}
    k_id = next(
        x["id"] for x in meta["schemas"][0]["fields"] if x["name"] == "k"
    )
    assert k_id in lower and f["id"] not in lower
    from iceberg_examples_spark.sources.iceberg_native import encode_bound

    blob = encode_bound("decimal(12, 2)", decimal.Decimal("14.2"))
    assert blob == b"\x05\x8c"  # Appendix B's 14.20 -> 1420 -> 0x058C
    assert decode_bound("decimal(12, 2)", blob) == decimal.Decimal("14.20")


def test_snapshot_summary_counters_and_metadata_log(spark, tmp_path):
    """Spec bookkeeping: snapshot summaries carry string-encoded
    added-file/record counters, delete commits count their delete
    files, and every metadata publish logs its predecessor in
    metadata-log."""
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "sm"),
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "k long, v double"
        ).coalesce(1),
    )
    t.add_equality_deletes(spark.createDataFrame([(3,)], "k long"), ["k"])
    meta = t._metadata()
    s1, s2 = meta["snapshots"]
    assert s1["summary"]["added-data-files"] == "1"
    assert s1["summary"]["added-records"] == "10"
    assert int(s1["summary"]["added-files-size"]) > 0
    assert s2["summary"]["operation"] == "delete"
    # file count matches what planning actually sees (Spark may emit an
    # empty extra part file for a tiny DF — the counter must agree with
    # the manifest, not with an assumed 1)
    n_eq_files = len(t._plan()[4])
    assert s2["summary"]["added-delete-files"] == str(n_eq_files)
    assert s2["summary"]["added-equality-deletes"] == "1"  # delete ROWS
    log = meta["metadata-log"]
    assert [os.path.basename(e["metadata-file"]) for e in log] == [
        "v1.metadata.json"
    ]
    # a pure-metadata publish (ref) logs too
    t.create_tag("x")
    log = t._metadata()["metadata-log"]
    assert [os.path.basename(e["metadata-file"]) for e in log] == [
        "v1.metadata.json",
        "v2.metadata.json",
    ]


def test_partition_spec_evolution_native(spark, tmp_path):
    """Format-level partition-spec evolution: a fresh spec-id with fresh
    partition field-ids becomes the default; old files keep their old
    partition values; a filter on a NEW spec's field never excludes
    old-spec files (their records can't prove exclusion) while new-spec
    files prune normally — and where= stays row-correct across both
    generations via the residual filter."""
    from iceberg_examples_spark.functions.iceberg_transforms import bucket_value

    gen1 = spark.createDataFrame(
        [(i, "F" if i % 2 == 0 else "O", float(i)) for i in range(40)],
        "k long, status string, v double",
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "pe"), gen1, partition_by=["status"]
    )
    t.update_spec(["bucket(k, 4)"])
    t.append(
        spark.createDataFrame(
            [(i, "F" if i % 2 == 0 else "O", float(i)) for i in range(40, 80)],
            "k long, status string, v double",
        )
    )
    meta = t._metadata()
    assert [s["spec-id"] for s in meta["partition-specs"]] == [0, 1]
    assert meta["default-spec-id"] == 1
    new_field = meta["partition-specs"][1]["fields"][0]
    assert new_field["field-id"] == 1001  # fresh, never reused
    assert new_field["transform"] == "bucket[4]"
    assert meta["last-partition-id"] == 1001
    # manifest list entries are stamped with their commit-time spec id
    snap = meta["snapshots"][-1]
    spec_ids = sorted(
        m["partition_spec_id"] for m in t._manifests(snap)
    )
    assert spec_ids == [0, 1]
    # planning: a bucket filter prunes NEW-spec files but keeps every
    # old-spec file (no k_bucket in their partition records)
    b = bucket_value(45, 4)
    _, _, files, _, _ = t._plan(partition_filter={"k_bucket": b})
    parts = [f["partition"] for f in files]
    old_kept = [p for p in parts if "status" in p]
    new_kept = [p for p in parts if "k_bucket" in p]
    assert len(old_kept) == len(
        [p for p in t._plan()[2] if "status" in p["partition"]]
    )
    assert new_kept and all(p["k_bucket"] == b for p in new_kept)
    # row-level correctness through where= across both generations
    assert sorted(r["k"] for r in t.scan(where={"k": 45}).collect()) == [45]
    assert sorted(r["k"] for r in t.scan(where={"k": 5}).collect()) == [5]
    got = sorted(r["k"] for r in t.scan(where={"status": "O"}).collect())
    assert got == [i for i in range(80) if i % 2 == 1]
    # old partition field names still validate
    with pytest.raises(ValueError, match="unknown partition field"):
        t.scan(partition_filter={"nope": 1})


def test_round10_review_pins(spark, tmp_path):
    """Round-10 self-review findings, each with its repro:
    (1) a decimal where= literal quantizes to the COLUMN's scale before
    bucket hashing / bounds comparison (Decimal('37') must match a
    decimal(12,2) column's files); (2) equality-delete files written
    BEFORE a rename resolve their columns by field id; (3) where=None
    doesn't crash bounds pruning; (4) update_spec refuses a spec whose
    partition values can't serialize; (5) upper-bound truncation never
    emits a surrogate."""
    import decimal

    from iceberg_examples_spark.sources.iceberg_native import (
        _truncate_upper,
        encode_bound,
    )

    # (1) literal-scale quantization
    df = spark.createDataFrame(
        [(i, decimal.Decimal(i).scaleb(-2) * 100) for i in range(1, 101)],
        "k long, amount decimal(12, 2)",
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "rp1"), df, partition_by=["bucket(amount, 8)"]
    )
    got = t.scan(where={"amount": decimal.Decimal("37")}).collect()
    assert [r["k"] for r in got] == [37]

    # (3) where=None: no crash, empty result (no NULLs in the column)
    assert t.scan(where={"k": None}).count() == 0

    # (4) unserializable partition spec refused BEFORE committing
    with pytest.raises(ValueError, match="unsupported partition column"):
        t.update_spec(["amount"])
    assert t._metadata()["default-spec-id"] == 0  # not poisoned
    t.append(df.limit(1))  # still writable

    # (2) equality delete -> rename -> the delete still applies by id
    t2 = IcebergNativeTable.create(
        spark,
        str(tmp_path / "rp2"),
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, name string"
        ),
    )
    t2.add_equality_deletes(
        spark.createDataFrame([("b",)], "name string"), ["name"]
    )
    t2.update_schema(rename={"name": "full_name"})
    assert sorted(r["k"] for r in t2.scan().collect()) == [1, 3]
    # dropping the targeted column makes the delete unapplicable: loud
    t2b = IcebergNativeTable.create(
        spark,
        str(tmp_path / "rp2b"),
        spark.createDataFrame([(1, "a", 1.0)], "k long, name string, v double"),
    )
    t2b.add_equality_deletes(
        spark.createDataFrame([("a",)], "name string"), ["name"]
    )
    t2b.update_schema(drop=["name"])
    with pytest.raises(ValueError, match="no longer carries"):
        t2b.scan().collect()

    # (5) surrogate-safe truncation
    s = "x" * 15 + "퟿" + "tail"
    up = _truncate_upper("string", s)
    assert up == "x" * 15 + "" and up > s[:16]
    assert encode_bound("string", up)  # encodable utf-8


def test_rollback_and_incremental_scan_rules(spark, tmp_path):
    """rollback_to moves current/main back (later snapshots reclaimable,
    sequence numbers stay monotonic); incremental_df returns exactly the
    (from, to] appends and REFUSES ranges containing non-append
    snapshots (their effect isn't expressible as added rows)."""
    t = IcebergNativeTable.create(
        spark,
        str(tmp_path / "ri"),
        spark.createDataFrame([(1,)], "k long"),
    )
    t.append(spark.createDataFrame([(2,)], "k long"))
    t.append(spark.createDataFrame([(3,)], "k long"))
    assert sorted(
        r["k"] for r in t.incremental_df(from_snapshot_id=1).collect()
    ) == [2, 3]
    assert sorted(
        r["k"]
        for r in t.incremental_df(
            from_snapshot_id=1, to_snapshot_id=2
        ).collect()
    ) == [2]
    assert t.incremental_df(from_snapshot_id=3).count() == 0
    # rollback: current moves back, next commit's seq stays monotonic
    t.rollback_to(2)
    assert sorted(r["k"] for r in t.scan().collect()) == [1, 2]
    assert t._metadata()["refs"]["main"]["snapshot-id"] == 2
    t.append(spark.createDataFrame([(4,)], "k long"))
    assert t._metadata()["current-snapshot-id"] == 4  # seq never reused
    assert sorted(r["k"] for r in t.scan().collect()) == [1, 2, 4]
    # a delete snapshot poisons the incremental range: loud refusal
    t.add_equality_deletes(spark.createDataFrame([(1,)], "k long"), ["k"])
    with pytest.raises(ValueError, match="not appends"):
        t.incremental_df(from_snapshot_id=2)
    with pytest.raises(ValueError, match="does not exist"):
        t.rollback_to(99)


def test_row_delta_atomic_upsert(spark, tmp_path):
    """newRowDelta().addDeletes().addRows().commit() parity
    (IcebergJavaApiUpsert.java:109-115): ONE snapshot carries both the
    equality deletes and the replacement rows; same-sequence rows
    survive their own deletes (strict gate); time travel to the
    pre-upsert snapshot still reads the original generation."""
    df = spark.createDataFrame(
        [(i, f"name-{i}", float(i)) for i in range(20)],
        "k long, name string, v double",
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    rows = spark.createDataFrame(
        [(3, "updated-3", 30.0), (7, "updated-7", 70.0), (99, "new-99", 9.9)],
        "k long, name string, v double",
    )
    t.row_delta(rows, ["k"])

    meta = t._metadata()
    assert len(meta["snapshots"]) == 2  # atomic: not delete-then-append
    snap = meta["snapshots"][-1]
    assert snap["summary"]["operation"] == "overwrite"
    assert int(snap["summary"]["added-equality-deletes"]) == 3
    assert int(snap["summary"]["added-records"]) == 3
    # delete files and data files share the commit's sequence number
    _, _, data, _, eq_del = t._plan()
    new_seq = snap["sequence-number"]
    assert {d["seq"] for d in eq_del} == {new_seq}
    assert new_seq in {d["seq"] for d in data}

    got = {r["k"]: (r["name"], r["v"]) for r in t.scan().collect()}
    assert len(got) == 21
    assert got[3] == ("updated-3", 30.0)
    assert got[7] == ("updated-7", 70.0)
    assert got[99] == ("new-99", 9.9)
    assert got[5] == ("name-5", 5.0)
    # pre-upsert snapshot unaffected
    before = {r["k"]: r["name"] for r in t.scan(snapshot_id=1).collect()}
    assert before[3] == "name-3" and 99 not in before

    # explicit delete_keys retires keys with no replacement row
    t.row_delta(
        spark.createDataFrame([(0, "zero-reborn", 0.5)], "k long, name string, v double"),
        ["k"],
        delete_keys=spark.createDataFrame([(0,), (1,), (2,)], "k long"),
    )
    after = {r["k"] for r in t.scan().collect()}
    assert 0 in after and 1 not in after and 2 not in after


def test_metadata_tables_manifests_partitions_refs(spark, tmp_path):
    """#manifests/#partitions/#refs mirror the metadata tree: manifest
    rows accrete by carry-forward with per-content bookkeeping,
    partition totals come from manifests only, refs list main + tags."""
    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O", float(i)) for i in range(30)],
        "k long, status string, v double",
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "t"), df, partition_by=["status"]
    )
    t.append(
        spark.createDataFrame([(100, "F", 1.0)], "k long, status string, v double")
    )
    t.add_equality_deletes(
        spark.createDataFrame([(100,)], "k long"), ["k"]
    )
    m = {
        (r["content"], r["sequence_number"]): r
        for r in t.manifests_df().collect()
    }
    assert len(m) == 3  # 2 data manifests carried forward + 1 delete
    assert m[(0, 1)]["added_rows_count"] == 30
    assert m[(0, 2)]["added_rows_count"] == 1
    assert m[(1, 3)]["added_rows_count"] == 1
    assert m[(0, 1)]["added_data_files_count"] >= 1

    p = {
        json.loads(r["partition"]).get("status"): r
        for r in t.partitions_df().collect()
    }
    # delete files carry an empty partition struct -> their own row
    assert p["F"]["record_count"] == 11  # 10 original F + 1 appended
    assert p["O"]["record_count"] == 20
    assert p["F"]["file_count"] >= 1 and p["F"]["total_size"] > 0
    assert p[None]["equality_delete_file_count"] == 1

    t.create_tag("v1", snapshot_id=1)
    refs = {r["name"]: (r["type"], r["snapshot_id"]) for r in t.refs_df().collect()}
    assert refs["main"] == ("branch", 3)
    assert refs["v1"] == ("tag", 1)


def test_rewrite_position_deletes_consolidates(spark, tmp_path):
    """rewrite_position_deletes: N position-delete files become one
    consolidated set in a replace snapshot; the scan result is
    unchanged, equality deletes are untouched, dangling coordinates
    (targets compacted away) are dropped, and time travel still reads
    the original delete files."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    for r in range(3):
        live = t.scan(with_coordinates=True)
        t.add_position_deletes(
            live.filter(F.col("k") % 10 == r).select("file_path", "pos")
        )
    t.add_equality_deletes(spark.createDataFrame([(15,)], "k long"), ["k"])
    before = sorted(r["k"] for r in t.scan().collect())
    n_pos_before = len(t._plan()[3])
    assert n_pos_before >= 3
    snap_before = t._metadata()["current-snapshot-id"]

    assert t.rewrite_position_deletes() == n_pos_before
    assert sorted(r["k"] for r in t.scan().collect()) == before
    _, _, data, pos, eq = t._plan()
    assert len(pos) == 1 and len(eq) == 1
    # time travel to the pre-rewrite snapshot sees the original files
    assert len(t._plan(snapshot_id=snap_before)[3]) == n_pos_before
    assert sorted(
        r["k"] for r in t.scan(snapshot_id=snap_before).collect()
    ) == before
    # consolidated coordinates only reference live data files
    live_uris = {t._file_uri(d["path"]) for d in data}
    dels = spark.read.parquet(pos[0]["path"]).collect()
    assert dels and all(r["file_path"] in live_uris for r in dels)
    # a second run is a no-op (already consolidated)
    assert t.rewrite_position_deletes() == 0


def test_delete_where_merge_on_read_and_copy_on_write(spark, tmp_path):
    """Both physical DELETE modes produce the same logical table; COW
    rewrites ONLY files containing a match (untouched files carried
    forward path-identical via manifest surgery), MOR adds delete files
    and leaves every data file in place; NULL predicates keep the row
    (SQL DELETE removes only TRUE)."""
    rows = [(i, "F" if i < 20 else "O", float(i)) for i in range(40)]
    rows.append((99, None, 99.0))  # predicate evaluates NULL -> kept

    def fresh(name):
        df = spark.createDataFrame(
            rows, "k long, status string, v double"
        )
        t = IcebergNativeTable.create(
            spark, str(tmp_path / name), df, partition_by=["status"]
        )
        # second generation so COW has multiple manifests to operate on
        t.append(
            spark.createDataFrame(
                [(100, "F", 1.0), (101, "O", 2.0)],
                "k long, status string, v double",
            )
        )
        return t

    expected = sorted(
        k for k, s, _ in rows + [(100, "F", 0.0), (101, "O", 0.0)]
        if s != "F"
    )

    t_mor = fresh("mor")
    files_before = {
        r["file_path"] for r in t_mor.files_df().collect()
    }
    t_mor.delete_where(F.col("status") == "F", mode="merge-on-read")
    assert sorted(r["k"] for r in t_mor.scan().collect()) == expected
    after = t_mor.files_df().collect()
    assert {r["file_path"] for r in after if r["content"] == 0} == {
        p for p in files_before
    }  # every data file still present
    assert any(r["content"] == 1 for r in after)

    t_cow = fresh("cow")
    before = {
        r["file_path"]: r["sequence_number"]
        for r in t_cow.files_df().collect()
    }
    untouched = {
        p for p in before if "/status=O/" in p or "status=O" in p
    }
    assert untouched
    t_cow.delete_where(F.col("status") == "F", mode="copy-on-write")
    assert sorted(r["k"] for r in t_cow.scan().collect()) == expected
    after = {
        r["file_path"]: r["sequence_number"]
        for r in t_cow.files_df().collect()
    }
    # no delete files in COW mode
    assert all(
        r["content"] == 0 for r in t_cow.files_df().collect()
    )
    # untouched files carried forward with their ORIGINAL sequence numbers
    for p in untouched:
        assert after[p] == before[p]
    # touched files gone, survivors written at the new sequence number
    assert all("/status=F" not in p or after[p] > 2 for p in after)
    # time travel: pre-delete snapshot still reads the original files
    assert (
        len(t_cow.scan(snapshot_id=2).collect())
        == len(rows) + 2
    )
    # no-op predicate -> no new snapshot
    n_snaps = len(t_cow._metadata()["snapshots"])
    t_cow.delete_where(F.col("k") == -1, mode="copy-on-write")
    assert len(t_cow._metadata()["snapshots"]) == n_snaps
    with pytest.raises(ValueError, match="delete mode"):
        t_cow.delete_where(F.col("k") == 1, mode="bogus")


def test_cow_delete_preserves_outstanding_mor_deletes(spark, tmp_path):
    """A COW rewrite of a file with outstanding equality/position
    deletes must apply them during the rewrite — survivors are taken
    from the MOR-applied view, so a previously-deleted row cannot be
    resurrected at the new (higher) sequence number."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(30)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.add_equality_deletes(
        spark.createDataFrame([(5,), (6,)], "k long"), ["k"]
    )
    t.delete_where(F.col("k") >= 20, mode="copy-on-write")
    got = sorted(r["k"] for r in t.scan().collect())
    assert got == [k for k in range(20) if k not in (5, 6)]


def test_update_where_modes_and_simultaneous_set(spark, tmp_path):
    """UPDATE semantics pins: SET a=b, b=a SWAPS (simultaneous
    evaluation against the pre-update row, not cascaded); MOR commits
    position deletes + updated rows in ONE snapshot; COW rewrites only
    hit files (untouched files path-identical); NULL predicates leave
    the row untouched; assignment results cast back to the column's
    declared type."""
    rows = [(i, float(i), float(100 + i)) for i in range(20)]
    rows.append((99, None, 1.0))  # cond on a evaluates NULL -> untouched

    def fresh(name):
        return IcebergNativeTable.create(
            spark,
            str(tmp_path / name),
            spark.createDataFrame(rows, "k long, a double, b double"),
        )

    t = fresh("swap")
    t.update_where(
        F.col("a") < 5, {"a": F.col("b"), "b": F.col("a")}, mode="copy-on-write"
    )
    got = {r["k"]: (r["a"], r["b"]) for r in t.scan().collect()}
    assert got[2] == (102.0, 2.0)  # swapped, not cascaded
    assert got[10] == (10.0, 110.0)  # unmatched untouched
    assert got[99] == (None, 1.0)  # NULL predicate -> untouched

    # MOR mode: one snapshot, position deletes + data files together
    t2 = fresh("mor")
    t2.update_where(
        F.col("k") % 2 == 0, {"a": F.expr("a + 1000")}, mode="merge-on-read"
    )
    meta = t2._metadata()
    assert len(meta["snapshots"]) == 2
    snap = meta["snapshots"][-1]
    assert int(snap["summary"]["added-position-deletes"]) > 0
    assert int(snap["summary"]["added-records"]) > 0
    got2 = {r["k"]: r["a"] for r in t2.scan().collect()}
    assert got2[4] == 1004.0 and got2[5] == 5.0
    assert len(got2) == len(rows)

    # COW keeps untouched files path-identical; integer-typed column
    # assignment is cast back (no silent schema drift)
    t3 = IcebergNativeTable.create(
        spark,
        str(tmp_path / "cast"),
        spark.createDataFrame(
            [(1, "x", 10), (2, "y", 20)], "k long, s string, n int"
        ),
    )
    t3.update_where(F.col("k") == 1, {"n": F.expr("n / 2")})  # double expr
    [f] = [x for x in t3.scan().schema.fields if x.name == "n"]
    assert f.dataType.simpleString() == "int"
    assert {r["k"]: r["n"] for r in t3.scan().collect()} == {1: 5, 2: 20}
    with pytest.raises(ValueError, match="unknown column"):
        t3.update_where(F.col("k") == 1, {"zz": F.lit(1)})
    with pytest.raises(ValueError, match="update mode"):
        t3.update_where(F.col("k") == 1, {"n": F.lit(1)}, mode="bogus")


def test_changelog_diff_semantics(spark, tmp_path):
    """changelog_df: appends surface as inserts, MOR deletes as deletes,
    a COW update as delete(pre)+insert(post); compaction and
    rewrite_position_deletes contribute NOTHING (skipped by operation);
    a range spanning a schema change resolves every event to the
    range-end schema (round 11 — it used to raise)."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.append(
        spark.createDataFrame([(100, 100.0), (101, 101.0)], "k long, v double")
    )  # s2
    t.delete_where(F.col("k") == 3, mode="merge-on-read")  # s3
    t.update_where(F.col("k") == 100, {"v": F.lit(999.0)})  # s4 (MOR)
    t.compact()  # s5: logically neutral
    t.rewrite_position_deletes()  # may be a no-op post-compaction

    rows = t.changelog_df(from_snapshot_id=1).collect()
    by_snap = {}
    for r in rows:
        by_snap.setdefault(r["_commit_snapshot_id"], []).append(
            (r["_change_type"], r["k"], r["v"])
        )
    assert sorted(by_snap[2]) == [("insert", 100, 100.0), ("insert", 101, 101.0)]
    assert by_snap[3] == [("delete", 3, 3.0)]
    assert sorted(by_snap[4]) == [("delete", 100, 100.0), ("insert", 100, 999.0)]
    assert set(by_snap) == {2, 3, 4}  # compaction contributed nothing

    t.update_schema(add=[("extra", "string")])
    t.append(
        spark.createDataFrame(
            [(200, 1.0, "x")], "k long, v double, extra string"
        )
    )
    rows2 = t.changelog_df(from_snapshot_id=1).collect()
    # the whole feed now reads under the end schema: old events carry
    # extra=NULL, the post-evolution insert carries its value
    by_type = {}
    for r in rows2:
        by_type.setdefault((r["_change_type"], r["k"]), r)
    assert by_type[("insert", 100)]["extra"] is None
    assert by_type[("insert", 200)]["extra"] == "x"
    assert len(rows2) == len(rows) + 1


def test_changelog_lineage_and_noop_dml_pins(spark, tmp_path):
    """Round-10 review pins: (1) the changelog walks the parent
    lineage, so a rollback's abandoned snapshot fabricates nothing and
    an off-lineage `from` raises; (2) a metadata-only schema change
    AFTER the tip does not break the diff (views read snapshot
    schemas); (3) no-match MOR DELETE/UPDATE and an empty row_delta
    publish no snapshot (COW parity)."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.append(spark.createDataFrame([(100, 1.0)], "k long, v double"))  # s2
    t.rollback_to(1)
    t.append(spark.createDataFrame([(200, 2.0)], "k long, v double"))  # s3
    rows = t.changelog_df(from_snapshot_id=1).collect()
    assert [(r["_commit_snapshot_id"], r["_change_type"], r["k"]) for r in rows] == [
        (3, "insert", 200)
    ]  # s2 is abandoned: no fabricated delete of k=100
    with pytest.raises(ValueError, match="not an ancestor"):
        t.changelog_df(from_snapshot_id=2).collect()

    # metadata-only evolution after the tip: older pairs still diff
    t.update_schema(add=[("extra", "string")])
    got = t.changelog_df(from_snapshot_id=1).collect()
    assert [(r["_commit_snapshot_id"], r["k"]) for r in got] == [(3, 200)]
    assert "extra" not in got[0].asDict()

    # no-match MOR DML and empty row_delta publish no snapshot
    n = len(t._metadata()["snapshots"])
    t.delete_where(F.col("k") == -1, mode="merge-on-read")
    t.update_where(F.col("k") == -1, {"v": F.lit(0.0)}, mode="merge-on-read")
    t.row_delta(
        spark.createDataFrame([], "k long, v double, extra string"), ["k"]
    )
    assert len(t._metadata()["snapshots"]) == n


def test_rewrite_single_dangling_delete_file(spark, tmp_path):
    """Round-10 review pin: ONE position-delete file whose targets were
    compacted away is still rewritten (dangling-debt cleanup has no
    2-file minimum), while a single healthy delete file is left alone
    (idempotence)."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k long, v double"
    )
    # ONE data file, so the COW rewrite provably orphans the delete file
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df.coalesce(1))
    live = t.scan(with_coordinates=True)
    t.add_position_deletes(
        live.filter(F.col("k") < 3).select("file_path", "pos").coalesce(1)
    )
    # healthy single file: untouched
    assert t.rewrite_position_deletes() == 0
    # COW-rewrite the (only) data file: every coordinate now dangles
    t.delete_where(F.col("k") == 19, mode="copy-on-write")
    assert len(t._plan()[3]) == 1
    assert t.rewrite_position_deletes() == 1
    pos = t._plan()[3]
    # dangling coordinates dropped: consolidated file only references live
    if pos:
        live_uris = {t._file_uri(d["path"]) for d in t._plan()[2]}
        refs = {
            r["file_path"]
            for r in spark.read.parquet(pos[0]["path"]).collect()
        }
        assert refs <= live_uris
    assert sorted(r["k"] for r in t.scan().collect()) == list(range(3, 19))


def test_branch_writes_and_fast_forward_wap(spark, tmp_path):
    """WAP at the format level: a branch commit moves ITS ref only
    (main, current pointer, and snapshot-log untouched — the audit is
    invisible); fast_forward requires ancestry (a diverged main
    refuses) and publishing main moves the current pointer and logs the
    jump; expire_snapshots keeps branch-reachable snapshots alive."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.create_branch("audit")
    t.append(
        spark.createDataFrame([(100, 1.0)], "k long, v double"),
        branch="audit",
    )
    meta = t._metadata()
    assert meta["current-snapshot-id"] == 1
    assert meta["refs"]["main"]["snapshot-id"] == 1
    assert meta["refs"]["audit"]["snapshot-id"] == 2
    assert [e["snapshot-id"] for e in meta["snapshot-log"]] == [1]
    assert t.scan().count() == 10  # main readers see nothing
    assert t.scan(ref="audit").count() == 11
    # the branch snapshot's parent is the branch head it grew from
    s2 = next(s for s in meta["snapshots"] if s["snapshot-id"] == 2)
    assert s2["parent-snapshot-id"] == 1

    # unknown branch refuses
    with pytest.raises(ValueError, match="unknown branch"):
        t.append(df, branch="nope")

    t.fast_forward("main", "audit")
    meta = t._metadata()
    assert meta["current-snapshot-id"] == 2
    assert meta["refs"]["main"]["snapshot-id"] == 2
    assert [e["snapshot-id"] for e in meta["snapshot-log"]] == [1, 2]
    assert t.scan().count() == 11
    # idempotent once equal
    t.fast_forward("main", "audit")

    # divergence refuses: main moves on, branch is no longer a descendant
    t.append(spark.createDataFrame([(200, 2.0)], "k long, v double"))
    t.append(
        spark.createDataFrame([(300, 3.0)], "k long, v double"),
        branch="audit",
    )
    with pytest.raises(ValueError, match="not a fast-forward"):
        t.fast_forward("main", "audit")


def test_streaming_source_offsets_and_skip_rules(spark, tmp_path):
    """The streaming source's reader contract, driven directly (no
    streaming engine): initial offset 0 consumes the whole lineage;
    the returned offset resumes exactly (no re-emission); a REPLACE
    snapshot is skipped; a delete commit raises unless
    skip_non_appends; readBetweenOffsets replays a pinned range
    deterministically."""
    from iceberg_examples_spark.sources.iceberg_stream_source import (
        IcebergStreamReader,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.append(spark.createDataFrame([(100, 1.0)], "k long, v double"))

    r = IcebergStreamReader(str(tmp_path / "t"), skip_non_appends=False)
    rows, off = r.read(r.initialOffset())
    assert sorted(x[0] for x in rows) == sorted(list(range(10)) + [100])
    assert off == {"seq": 2}
    # resume: nothing new
    rows2, off2 = r.read(off)
    assert list(rows2) == [] and off2 == {"seq": 2}

    t.compact()  # replace: must be skipped
    t.append(spark.createDataFrame([(200, 2.0)], "k long, v double"))
    rows3, off3 = r.read(off)
    assert [x[0] for x in rows3] == [200] and off3 == {"seq": 4}
    # deterministic replay of a pinned range
    assert [x[0] for x in r.readBetweenOffsets(off, off3)] == [200]

    t.delete_where(F.col("k") == 0, mode="merge-on-read")
    with pytest.raises(ValueError, match="cannot retract"):
        r.read(off3)
    r_skip = IcebergStreamReader(str(tmp_path / "t"), skip_non_appends=True)
    rows4, _ = r_skip.read(off3)
    assert list(rows4) == []


def test_bulk_stream_reader_partitions_contract(spark, tmp_path):
    """The executor-parallel reader's contract, driven directly: offsets
    match the simple flavor, partitions(start, end) yields one split
    per planned data file (an empty range yields one empty split —
    Spark requires >= 1), split decode is self-contained (pickle-shaped:
    path + names only), and the delete-raise/skip rules hold at
    planning time."""
    import pickle

    from iceberg_examples_spark.sources.iceberg_stream_source import (
        IcebergBulkStreamReader,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(12)], "k long, v double"
    ).repartition(3)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.append(
        spark.createDataFrame([(100, 1.0)], "k long, v double").coalesce(1)
    )

    r = IcebergBulkStreamReader(
        str(tmp_path / "t"), skip_non_appends=False, names=["k", "v"]
    )
    assert r.initialOffset() == {"seq": 0}
    end = r.latestOffset()
    assert end == {"seq": 2}
    splits = r.partitions(r.initialOffset(), end)
    assert len(splits) == 4  # 3 files from create + 1 from append
    # decode through pickle: what an executor worker actually receives
    rows = [
        row
        for s in splits
        for row in r.read(pickle.loads(pickle.dumps(s)))
    ]
    assert sorted(x[0] for x in rows) == sorted(list(range(12)) + [100])
    # empty range: exactly one empty split
    empty = r.partitions(end, end)
    assert len(empty) == 1 and list(r.read(empty[0])) == []

    t.compact()  # replace: planned away
    t.append(spark.createDataFrame([(200, 2.0)], "k long, v double"))
    nxt = r.latestOffset()
    splits2 = r.partitions(end, nxt)
    assert [x[0] for s in splits2 for x in r.read(s)] == [200]

    t.delete_where(F.col("k") == 0, mode="merge-on-read")
    with pytest.raises(ValueError, match="cannot retract"):
        r.partitions(nxt, r.latestOffset())
    r_skip = IcebergBulkStreamReader(
        str(tmp_path / "t"), skip_non_appends=True, names=["k", "v"]
    )
    sp = r_skip.partitions(nxt, r_skip.latestOffset())
    assert [x for s in sp for x in r_skip.read(s)] == []


def test_entries_metadata_table(spark, tmp_path):
    """#entries: the file-level ledger — every manifest entry with its
    status, sequence number, content type, and bookkeeping; totals
    agree with files_df and the delete entry carries its commit seq."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(12)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.append(spark.createDataFrame([(100, 1.0)], "k long, v double"))
    t.add_equality_deletes(
        spark.createDataFrame([(100,)], "k long"), ["k"]
    )
    e = t.entries_df().collect()
    by_content = {}
    for r in e:
        by_content.setdefault(r["content"], []).append(r)
    assert sum(r["record_count"] for r in by_content[0]) == 13
    assert len(by_content[2]) == 1
    assert by_content[2][0]["data_sequence_number"] == 3
    assert all(r["status"] == 1 for r in e)
    assert all(r["file_size_in_bytes"] > 0 for r in e)
    # agrees with files_df at the file level
    assert {r["file_path"] for r in e} == {
        r["file_path"] for r in t.files_df().collect()
    }


def test_new_dml_paths_conflict_on_interleaved_commit(spark, tmp_path):
    """The round-10 DML paths inherit the optimistic commit protocol:
    a row_delta / COW delete that read its base before an interleaved
    append must raise CommitConflictError at publish (not silently
    drop or duplicate the interleaved rows)."""
    from iceberg_examples_spark.catalog import CommitConflictError

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)

    # row_delta: steal the base read, interleave an append, publish
    meta, version = t._read_tree()
    t.append(spark.createDataFrame([(50, 5.0)], "k long, v double"))
    rows = spark.createDataFrame([(1, 100.0)], "k long, v double")
    seq = meta["last-sequence-number"] + 1
    import os as _os
    import uuid as _uuid

    out = _os.path.join(
        t.location, "data", f"seq-{seq:05d}-{_uuid.uuid4().hex[:8]}-eqdel"
    )
    rows.select("k").write.parquet(out)
    paths = [
        _os.path.join(out, n)
        for n in sorted(_os.listdir(out))
        if n.endswith(".parquet")
    ]
    manifest = t._write_delete_manifest(
        meta, seq, [{"path": p, "partition": {}} for p in paths], 2, [1]
    )
    with pytest.raises(CommitConflictError):
        t._commit(
            rows,
            operation="overwrite",
            first=False,
            delete_manifest=manifest,
            base=(meta, version),
            delete_rows_key="added-equality-deletes",
        )
    # the loser's retry against the fresh tree succeeds and keeps the
    # interleaved row
    t.row_delta(rows, ["k"])
    got = {r["k"]: r["v"] for r in t.scan().collect()}
    assert got[1] == 100.0 and got[50] == 5.0

    # COW delete: same steal-the-base shape through _cow_rewrite
    base = t._read_tree()
    t.append(spark.createDataFrame([(60, 6.0)], "k long, v double"))
    with pytest.raises(CommitConflictError):
        t._cow_rewrite(
            F.col("k") == 2,
            lambda f: f.filter(F.col("k") != 2),
            "delete",
            base,
        )
    t.delete_where(F.col("k") == 2, mode="copy-on-write")
    got = {r["k"] for r in t.scan().collect()}
    assert 2 not in got and 60 in got


def test_partition_scoped_delete_files(spark, tmp_path):
    """Delete files are written partitioned like their targets: MOR
    debt attributes to the partition the DELETE hit, partition-filtered
    scans skip other partitions' delete files at planning time, and a
    key-covering equality delete is scoped while a non-covering one
    stays global."""
    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O", float(i)) for i in range(90)],
        "k long, status string, v double",
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "pd"), df, partition_by=["status"]
    )
    t.delete_where((F.col("status") == "F") & (F.col("k") < 30), "merge-on-read")
    parts = {
        r["partition"]: r
        for r in t.partitions_df().collect()
    }
    assert parts['{"status": "F"}']["position_delete_file_count"] == 1
    assert parts['{"status": "O"}']["position_delete_file_count"] == 0
    # the delete manifest entry carries the real partition value
    _, _, _, pos_del, _ = t._plan()
    assert [d["partition"] for d in pos_del] == [{"status": "F"}]
    # planning a partition-filtered scan prunes the other partition's
    # delete files entirely
    _, _, _, pos_o, _ = t._plan(partition_filter={"status": "O"})
    assert pos_o == []
    _, _, _, pos_f, _ = t._plan(partition_filter={"status": "F"})
    assert len(pos_f) == 1
    assert t.scan(partition_filter={"status": "F"}).count() == 20
    assert t.scan().count() == 80

    # equality delete keyed by the partition source: scoped to its value
    t.add_equality_deletes(
        spark.createDataFrame([("O",)], "status string"), ["status"]
    )
    _, _, _, _, eq = t._plan()
    assert [d["partition"] for d in eq] == [{"status": "O"}]
    assert t.scan().count() == 20
    # ...and pruned away for the partition it cannot touch
    _, _, _, _, eq_f = t._plan(partition_filter={"status": "F"})
    assert eq_f == []

    # equality delete NOT covering the partition source: global (a k=33
    # row could live in any partition), never pruned
    t.add_equality_deletes(spark.createDataFrame([(33,)], "k long"), ["k"])
    _, _, _, _, eq2 = t._plan(partition_filter={"status": "F"})
    assert any(d["partition"] == {} for d in eq2)
    assert t.scan().count() == 19


def test_partition_debt_survives_rewrite_and_null_scoping(spark, tmp_path):
    """rewrite_position_deletes keeps the per-partition scoping, and
    delete entries with NULL partition values (unknown target
    partition) are never pruned."""
    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O", float(i)) for i in range(90)],
        "k long, status string, v double",
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "rw"), df, partition_by=["status"]
    )
    for lo in (0, 30, 60):
        t.delete_where(
            (F.col("status") == "F") & (F.col("k") >= lo) & (F.col("k") < lo + 10),
            "merge-on-read",
        )
    _, _, _, pos_del, _ = t._plan()
    assert len(pos_del) == 3
    t.rewrite_position_deletes()
    _, _, _, pos_del, _ = t._plan()
    assert [d["partition"] for d in pos_del] == [{"status": "F"}]
    # F rows are every third k: 4 deleted per 10-wide range, 3 ranges
    assert t.scan().count() == 78

    # deletes targeting PRE-spec-evolution files carry null partition
    # values (their partition can't be expressed in the current spec);
    # null can't prove exclusion, so a filtered scan still applies them
    df2 = spark.createDataFrame(
        [(i, "A" if i % 2 == 0 else "B", float(i)) for i in range(40)],
        "k long, status string, v double",
    )
    t2 = IcebergNativeTable.create(spark, str(tmp_path / "ev"), df2)
    t2.update_spec(["status"])
    t2.append(
        spark.createDataFrame(
            [(100 + i, "A", 0.0) for i in range(10)],
            "k long, status string, v double",
        )
    )
    t2.delete_where(F.col("k") < 4, "merge-on-read")  # old-file rows only
    _, _, _, pos2, _ = t2._plan()
    assert {tuple(sorted(d["partition"].items())) for d in pos2} == {
        (("status", None),)
    }
    # the filter prunes old DATA files never (no status value) and the
    # null-scoped delete file never either: counts stay consistent
    assert t2.scan(partition_filter={"status": "A"}).count() == 46
    assert t2.scan().count() == 46


def test_partition_stats_file_roundtrip(spark, tmp_path):
    """write_partition_stats: single parquet file registered in
    metadata.json; unified partition tuple spans evolved specs (old
    rows keyed by spec_id with nulls for fields their spec lacks);
    re-writing for the same snapshot replaces the registration."""
    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O", float(i)) for i in range(90)],
        "k long, status string, v double",
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.update_spec(["status"])
    t.append(
        spark.createDataFrame(
            [(100 + i, "A", 0.0) for i in range(10)],
            "k long, status string, v double",
        )
    )
    t.delete_where(F.col("k") >= 105, "merge-on-read")
    p1 = t.write_partition_stats()
    got = {
        (r["spec_id"], r["partition"]["status"]): r
        for r in t.partition_stats_df().collect()
    }
    # old-spec files: spec_id 0, status null; new-spec: spec_id 1, 'A'
    assert got[(0, None)]["data_record_count"] == 90
    assert got[(1, "A")]["data_record_count"] == 10
    assert got[(1, "A")]["position_delete_record_count"] == 5
    assert got[(0, None)]["position_delete_file_count"] == 0
    assert got[(1, "A")]["total_record_count"] is None  # honest omission
    # registration: one entry for the snapshot; rewrite replaces it
    meta = t._metadata()
    assert len(meta["partition-statistics"]) == 1
    assert meta["partition-statistics"][0]["statistics-path"] == p1
    p2 = t.write_partition_stats()
    meta = t._metadata()
    assert len(meta["partition-statistics"]) == 1
    assert meta["partition-statistics"][0]["statistics-path"] == p2
    # unknown snapshot: loud failure, not a silent empty frame
    with pytest.raises(ValueError, match="no partition statistics"):
        t.partition_stats_df(snapshot_id=1)


def test_all_metadata_tables(spark, tmp_path):
    """#all_manifests / #all_entries / #all_files: the across-snapshots
    family — carried-forward manifests repeat per referencing snapshot,
    all_entries is the per-snapshot union, all_files dedupes to one row
    per distinct file (including files only HISTORIC snapshots hold)."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    ).repartition(1)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.append(
        spark.createDataFrame([(100, 1.0)], "k long, v double").coalesce(1)
    )
    t.compact()  # replace: snapshot 3 references NEW files only

    am = t.all_manifests_df().collect()
    # snapshot 1: 1 manifest; snapshot 2: 2 (carried + new); snapshot 3:
    # 1 (rewrite) — the carried manifest appears under both 1 and 2
    per_snap = {}
    for r in am:
        per_snap.setdefault(r["reference_snapshot_id"], []).append(r["path"])
    assert {k: len(v) for k, v in per_snap.items()} == {1: 1, 2: 2, 3: 1}
    assert set(per_snap[1]) <= set(per_snap[2])

    n_compacted = t.files_df().count()  # compaction's own file count
    ae = t.all_entries_df()
    assert ae.filter("reference_snapshot_id = 2").count() == 2
    assert ae.count() == 1 + 2 + n_compacted

    af = t.all_files_df()
    # pre-compaction files + the compacted files, each exactly once
    assert af.count() == af.select("file_path").distinct().count()
    assert af.count() == 2 + n_compacted
    # current snapshot no longer holds the historic files all_files
    # keeps for time travel
    cur = {r["file_path"] for r in t.files_df().collect()}
    assert cur < {r["file_path"] for r in af.collect()}


def test_add_files_registration_and_guards(spark, tmp_path):
    """add_files: in-place registration (no copy — entries point at the
    foreign paths), dropped identity-partition columns reconstruct from
    partition metadata even under MOR, and the guards refuse hive keys
    outside the spec, non-identity missing columns, and mixed physical
    schemas."""
    import os as _os

    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O", float(i)) for i in range(30)],
        "k long, status string, v double",
    )
    hive = str(tmp_path / "hive")
    df.repartition(1).write.partitionBy("status").parquet(hive)
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "t"), df.limit(0), partition_by=["status"]
    )
    assert t.add_files(hive) == 2
    # no copy: every registered path still lives under the hive export
    assert all(
        d["path"].startswith(_os.path.abspath(hive))
        for d in t._plan()[2]
    )
    got = {
        (r["status"], r["k"]) for r in t.scan().collect()
    }
    assert len(got) == 30 and ("F", 0) in got and ("O", 1) in got
    # the reconstructed column participates in MOR deletes + row filters
    t.delete_where(F.col("status") == "F", "merge-on-read")
    assert t.scan().count() == 20
    assert t.scan(where={"status": "O"}).count() == 20

    # guard: hive key not an identity partition source
    bad = str(tmp_path / "badkey")
    df.withColumnRenamed("status", "other").repartition(1).write.partitionBy(
        "other"
    ).parquet(bad)
    with pytest.raises(ValueError, match="identity"):
        t.add_files(bad)

    # guard: a missing column that ISN'T an identity partition source
    t2 = IcebergNativeTable.create(
        spark, str(tmp_path / "t2"), df.limit(0), partition_by=["status"]
    )
    narrow = str(tmp_path / "narrow")
    df.drop("v").repartition(1).write.partitionBy("status").parquet(narrow)
    with pytest.raises(ValueError, match="not.*identity partition"):
        t2.add_files(narrow)

    # guard: mixed physical schemas across files
    mixed = str(tmp_path / "mixed")
    df.drop("status").limit(5).coalesce(1).write.parquet(mixed)
    df.limit(5).coalesce(1).write.mode("append").parquet(mixed)
    with pytest.raises(ValueError, match="uniform physical schema"):
        t2.add_files(mixed)


def test_deletion_vector_lifecycle(spark, tmp_path):
    """v3 deletion vectors end-to-end: upgrade converts live parquet
    position deletes to DV blobs in one replace snapshot; MOR DELETE on
    a v3 table writes DVs (never position-delete files); a second
    delete on the same data file MERGES into one superseding vector
    (v3's one-DV-per-file rule); update_where MOR composes DVs with
    new data files atomically; rewrite_position_deletes consolidates
    puffin files idempotently; time travel across all of it."""
    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O", float(i)) for i in range(60)],
        "k long, status string, v double",
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "t"), df, partition_by=["status"]
    )
    t.delete_where(F.col("k") < 6, "merge-on-read")  # v2 parquet deletes
    t.upgrade_format_version(3)
    assert t._metadata()["format-version"] == 3
    assert t.scan().count() == 54
    # every delete entry is now a puffin DV
    _, _, _, pos, _ = t._plan()
    assert pos and all(d["file_format"] == "PUFFIN" for d in pos)
    # new position-delete FILES are refused on v3
    with pytest.raises(ValueError, match="forbids new position-delete"):
        t.add_position_deletes(
            spark.createDataFrame([("x", 0)], "file_path string, pos long")
        )

    t.delete_where(F.col("k").between(6, 11), "merge-on-read")
    assert t.scan().count() == 48
    t.delete_where(F.col("k").between(12, 14), "merge-on-read")
    assert t.scan().count() == 45
    # one live DV per data file, and DV entries carry their target's
    # partition (debt attribution holds for vectors too)
    _, _, _, pos, _ = t._plan()
    refs = [d["referenced_data_file"] for d in pos]
    assert len(refs) == len(set(refs))
    assert all(d["partition"] for d in pos)

    t.update_where(F.col("k") == 20, {"v": F.lit(999.0)}, "merge-on-read")
    assert t.scan().filter("k = 20").collect()[0]["v"] == 999.0
    assert t.scan().count() == 45

    n = t.rewrite_position_deletes()
    assert n >= 2
    assert t.scan().count() == 45
    _, _, _, pos, _ = t._plan()
    assert len({d["path"] for d in pos}) == 1
    assert t.rewrite_position_deletes() == 0  # idempotent
    assert t.scan(snapshot_id=1).count() == 60  # time travel intact


def test_upgrade_to_v3_is_atomic_under_crash(spark, tmp_path, monkeypatch):
    """The v3 upgrade is ONE metadata publish (round-10 ADVICE: the old
    three-publish sequence could crash after the DV-conversion commit,
    leaving a v2 tree referencing PUFFIN entries). Kill the publisher
    mid-upgrade on a table WITH live parquet position deletes: the
    table must still read as a fully-consistent v2 tree (parquet
    deletes intact, no PUFFIN entries referenced), and a retried
    upgrade must land cleanly."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k long, v double"
    ).coalesce(1)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.delete_where(F.col("k") < 10, "merge-on-read")  # v2 parquet deletes
    want = sorted(r["k"] for r in t.scan().select("k").collect())

    real_publish = IcebergNativeTable._publish_metadata

    def boom(self, meta, read_version):
        raise RuntimeError("killed before metadata publish")

    monkeypatch.setattr(IcebergNativeTable, "_publish_metadata", boom)
    with pytest.raises(RuntimeError, match="killed before"):
        t.upgrade_format_version(3)
    monkeypatch.setattr(
        IcebergNativeTable, "_publish_metadata", real_publish
    )

    # published state: still v2, parquet deletes still the live ones,
    # scan identical — no snapshot references PUFFIN entries
    t2 = IcebergNativeTable(spark, str(tmp_path / "t"))
    assert t2._metadata()["format-version"] == 2
    _, _, _, pos, _ = t2._plan()
    assert pos and all(d.get("file_format") != "PUFFIN" for d in pos)
    assert sorted(r["k"] for r in t2.scan().select("k").collect()) == want

    # the retried upgrade commits cleanly on top of the debris
    t2.upgrade_format_version(3)
    assert t2._metadata()["format-version"] == 3
    _, _, _, pos, _ = t2._plan()
    assert pos and all(d["file_format"] == "PUFFIN" for d in pos)
    assert sorted(r["k"] for r in t2.scan().select("k").collect()) == want


def test_deletion_vector_sharded_executor_write(
    spark, tmp_path, monkeypatch
):
    """Large DV commits must not funnel bitmap bytes through the
    driver: with DV_DRIVER_WRITE_MAX_FILES patched to 0 every DV
    commit takes the executor-sharded path — a multi-partition DELETE
    lands ONE puffin file PER PARTITION (written inside tasks), the
    manifest entries carry correct partition scoping + blob offsets,
    and scan / merge-supersede / rewrite semantics are byte-identical
    to the driver-written shape."""
    from iceberg_examples_spark.sources import iceberg_native as inat
    from iceberg_examples_spark.sources.puffin import (
        decode_deletion_vector,
        read_blob,
    )

    monkeypatch.setattr(inat, "DV_DRIVER_WRITE_MAX_FILES", 0)
    df = spark.createDataFrame(
        [
            (i, ["red", "green", "blue"][i % 3], float(i))
            for i in range(90)
        ],
        "k long, color string, v double",
    )
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "t"), df, partition_by=["color"]
    )
    t.upgrade_format_version(3)
    t.delete_where(F.col("k") < 30, "merge-on-read")  # hits all 3 parts
    assert t.scan().count() == 60
    _, _, _, pos, _ = t._plan()
    assert pos and all(d["file_format"] == "PUFFIN" for d in pos)
    # one puffin file per partition, each scoped to that partition
    by_puffin = {}
    for d in pos:
        by_puffin.setdefault(d["path"], set()).add(
            tuple(sorted(d["partition"].items()))
        )
    assert len(by_puffin) == 3
    assert all(len(parts) == 1 for parts in by_puffin.values())
    # blob offsets index real decodable vectors with stated cardinality
    for d in pos:
        positions = decode_deletion_vector(
            read_blob(
                d["path"], d["content_offset"], d["content_size_in_bytes"]
            )
        )
        assert len(positions) == d["record_count"]
    # second overlapping delete: merge-supersede still holds per file
    t.delete_where(F.col("k") < 45, "merge-on-read")
    assert t.scan().count() == 45
    _, _, _, pos, _ = t._plan()
    refs = [d["referenced_data_file"] for d in pos]
    assert len(refs) == len(set(refs))  # one live DV per data file
    assert sorted(r["k"] for r in t.scan().select("k").collect()) == list(
        range(45, 90)
    )
    # consolidation over sharded puffin files stays idempotent
    assert t.rewrite_position_deletes() >= 1
    assert t.scan().count() == 45
    assert t.rewrite_position_deletes() == 0


def test_deletion_vector_subshard_unpartitioned(
    spark, tmp_path, monkeypatch
):
    """The r11 ADVICE scenario: a large DV commit on an UNPARTITIONED
    table must not collapse into one applyInPandas group. With the
    shard target patched to 2, the (partition, crc32(path) % n_sub)
    key fans the write across multiple puffin files while manifests,
    merge-supersede, and the scan stay exact."""
    from iceberg_examples_spark.sources import iceberg_native as inat
    from iceberg_examples_spark.sources.puffin import (
        decode_deletion_vector,
        read_blob,
    )

    monkeypatch.setattr(inat, "DV_DRIVER_WRITE_MAX_FILES", 0)
    monkeypatch.setattr(inat, "DV_SHARD_TARGET_FILES", 2)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(120)], "k long, v double"
    ).repartition(8)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.upgrade_format_version(3)
    t.delete_where(F.col("k") % 2 == 0, "merge-on-read")  # hits all files
    assert t.scan().count() == 60
    _, _, _, pos, _ = t._plan()
    assert pos and all(d["file_format"] == "PUFFIN" for d in pos)
    # 8 affected files / target 2 -> 4 hash buckets: >1 puffin file on
    # a single (empty) partition, none carrying more than a bucket's
    # share, every entry still unpartitioned-scoped
    puffins = {d["path"] for d in pos}
    assert len(puffins) > 1, puffins
    assert all(d["partition"] == {} for d in pos)
    for d in pos:
        positions = decode_deletion_vector(
            read_blob(
                d["path"], d["content_offset"], d["content_size_in_bytes"]
            )
        )
        assert len(positions) == d["record_count"]
    assert sorted(r["k"] for r in t.scan().select("k").collect()) == list(
        range(1, 120, 2)
    )


def test_changelog_over_deletion_vectors(spark, tmp_path):
    """changelog_df on a v3 table: a DV commit's affected files come
    from the manifest's referenced_data_file (no parquet read of a
    puffin file), delete events carry the deleted rows, and a merged
    (superseding) second DV emits ONLY the newly-deleted rows."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k long, v double"
    ).coalesce(1)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.upgrade_format_version(3)
    t.delete_where(F.col("k") < 3, "merge-on-read")
    t.delete_where(F.col("k") < 5, "merge-on-read")  # merges, supersedes
    ch = t.changelog_df(from_snapshot_id=1).collect()
    by_commit = {}
    for r in ch:
        by_commit.setdefault(
            (r["_commit_snapshot_id"], r["_change_type"]), set()
        ).add(r["k"])
    # snapshot 2 is the upgrade's row-lineage bootstrap (metadata-only
    # replace: contributes nothing); the deletes land at 3 and 4
    assert by_commit[(3, "delete")] == {0, 1, 2}
    assert by_commit[(4, "delete")] == {3, 4}  # only the NEW deletions
    assert not any(ct == "insert" for _, ct in by_commit)


def test_changelog_row_lineage_pairs_updates(spark, tmp_path):
    """with_row_lineage=True changelog: an update's delete(pre-image)
    and insert(post-image) events carry the SAME _row_id (identity
    pairing — the spec's purpose for field 142), inserts' lus is the
    update's sequence number, compaction contributes nothing even
    though it rewrites every byte, and the flag raises on v2."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k long, v double"
    ).coalesce(1)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    with pytest.raises(ValueError, match="format-version 3"):
        t.changelog_df(with_row_lineage=True)
    t.upgrade_format_version(3)
    t.update_where(
        F.col("k").between(5, 8),
        {"v": F.col("v") + F.lit(100.0)},
        mode="copy-on-write",
    )
    t.compact()
    ch = t.changelog_df(from_snapshot_id=1, with_row_lineage=True)
    rows = ch.collect()
    # only the update commit (snapshot 3) contributes; compaction
    # (snapshot 4) cancels because materialized lineage preserves ids
    assert {r["_commit_snapshot_id"] for r in rows} == {3}
    dels = {
        r["_row_id"]: r for r in rows if r["_change_type"] == "delete"
    }
    ins = {
        r["_row_id"]: r for r in rows if r["_change_type"] == "insert"
    }
    # single sorted file: _row_id == k; updates pair by identity
    assert set(dels) == set(ins) == {5, 6, 7, 8}
    for rid in dels:
        assert dels[rid]["v"] + 100.0 == ins[rid]["v"]
        assert dels[rid]["_last_updated_sequence_number"] == 1
        assert ins[rid]["_last_updated_sequence_number"] == 3


def test_rewrite_manifests(spark, tmp_path):
    """rewrite_manifests: metadata-only consolidation — manifest count
    collapses to one per (content, schema generation), every entry goes
    status=EXISTING with its original sequence number explicit, scans
    and MOR gating are unchanged at every snapshot, and the procedure
    is idempotent."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    ).coalesce(1)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    for j in range(4):
        t.append(
            spark.createDataFrame(
                [(100 + j, 1.0)], "k long, v double"
            ).coalesce(1)
        )
    t.delete_where(F.col("k") == 0, "merge-on-read")
    t.delete_where(F.col("k") == 1, "merge-on-read")
    assert t.manifests_df().count() == 7  # 5 data + 2 delete
    n = t.rewrite_manifests()
    assert n == 5  # 7 -> 2 (one data, one delete)
    assert t.manifests_df().count() == 2
    assert {r["content"] for r in t.manifests_df().collect()} == {0, 1}
    # scan identical, MOR gate intact (deletes at seq 6,7 > data seqs)
    assert sorted(r["k"] for r in t.scan().collect()) == list(
        range(2, 10)
    ) + [100, 101, 102, 103]
    # entries: all EXISTING, original seqs preserved
    e = t.entries_df().collect()
    assert all(r["status"] == 0 for r in e)
    assert {
        r["data_sequence_number"] for r in e if r["content"] == 0
    } == {1, 2, 3, 4, 5}
    assert t.rewrite_manifests() == 0  # idempotent
    # time travel still reads pre-rewrite history
    assert t.scan(snapshot_id=5).count() == 14
    # a new append accretes on the consolidated list
    t.append(spark.createDataFrame([(200, 2.0)], "k long, v double"))
    assert t.manifests_df().count() == 3
    assert t.scan().count() == 13


def test_row_lineage_lifecycle(spark, tmp_path):
    """v3 row lineage: the upgrade bootstrap assigns first_row_id to
    pre-existing files via a metadata-only manifest rewrite; appends
    mint ids from next-row-id; COW and MOR UPDATEs keep a row's id and
    bump _last_updated_sequence_number for changed rows only;
    compaction MATERIALIZES lineage (ids and last-updated survive the
    rewrite, first_row_id goes null per spec); pre-upgrade snapshots
    refuse lineage loudly."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k long, v double"
    ).coalesce(1)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.upgrade_format_version(3)
    meta = t._metadata()
    assert meta["next-row-id"] == 20

    def lineage():
        return {
            r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
            for r in t.scan(with_row_lineage=True).collect()
        }

    l0 = lineage()
    assert sorted(v[0] for v in l0.values()) == list(range(20))
    assert {v[1] for v in l0.values()} == {1}

    t.append(
        spark.createDataFrame(
            [(100, 1.0), (101, 2.0)], "k long, v double"
        ).coalesce(1)
    )
    l1 = lineage()
    assert {l1[100][0], l1[101][0]} == {20, 21}
    assert t._metadata()["next-row-id"] == 22
    assert all(l1[k][0] == l0[k][0] for k in l0)

    t.update_where(F.col("k") == 5, {"v": F.lit(500.0)}, "copy-on-write")
    l2 = lineage()
    assert l2[5][0] == l0[5][0] and l2[5][1] == 4
    assert l2[6] == l1[6]  # untouched survivor of the rewritten file

    t.update_where(F.col("k") == 7, {"v": F.lit(700.0)}, "merge-on-read")
    l3 = lineage()
    assert l3[7][0] == l0[7][0] and l3[7][1] == 5

    t.delete_where(F.col("k") < 2, "merge-on-read")
    t.compact()
    l4 = lineage()
    assert len(l4) == 20
    assert all(l4[k][0] == l3[k][0] for k in l4)
    assert l4[7][1] == 5 and l4[5][1] == 4 and l4[6][1] == 1
    # compacted entries: first_row_id null = materialized lineage
    _, _, data, _, _ = t._plan()
    assert all(d["first_row_id"] is None for d in data)
    # a fresh append still mints ids beyond every assigned one
    t.append(
        spark.createDataFrame([(200, 1.0)], "k long, v double").coalesce(1)
    )
    l5 = lineage()
    assert l5[200][0] == 22
    assert len({v[0] for v in l5.values()}) == 21  # all unique

    # pre-upgrade snapshot: no ids, no materialized columns -> loud
    with pytest.raises(ValueError, match="lineage unavailable"):
        t.scan(snapshot_id=1, with_row_lineage=True).collect()


def test_table_statistics_roundtrip(spark, tmp_path):
    """statistics metadata field: one puffin stats file per snapshot,
    TWO blobs per column (spec theta + Spark-verifiable HLL) with
    exact ndv property + real payloads; re-writing for the same
    snapshot REPLACES the entry; footer size accounts for every byte
    after the last blob; unregistered snapshots raise."""
    import os as _os

    from iceberg_examples_spark.functions import theta as TH
    from iceberg_examples_spark.sources.puffin import (
        read_blob,
        read_puffin_footer,
    )

    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i % 5)) for i in range(100)],
        "k long, s string, v double",
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    with pytest.raises(ValueError, match="no table statistics"):
        t.statistics_df()
    p1 = t.write_table_statistics()
    rows = t.statistics_df().collect()
    got = {
        (r["column_name"], r["blob_type"]): r for r in rows
    }
    assert {bt for _, bt in got} == {
        "apache-datasketches-theta-v1",
        "apache-datasketches-hll-v1",
    }
    ndvs = {c: r["ndv"] for (c, _), r in got.items()}
    assert ndvs == {"k": 100, "s": 2, "v": 5}
    # theta payloads: small sketches are EXACT — decode + estimate
    # through the format-pinned reader
    for (c, bt), r in got.items():
        if bt != "apache-datasketches-theta-v1":
            continue
        payload = read_blob(
            r["statistics_path"], r["offset"], r["length"]
        )
        theta, hashes = TH.deserialize_compact(payload)
        assert theta == TH.MAX_THETA  # ndv << k: exact mode
        assert len(hashes) == r["ndv"]
        assert TH.estimate(payload) == r["ndv"]
    got = {
        c: r
        for (c, bt), r in got.items()
        if bt == "apache-datasketches-hll-v1"
    }
    # blob coordinates index the real file; footer math closes
    ft = read_puffin_footer(p1)
    meta_entry = t._metadata()["statistics"][0]
    last = ft["blobs"][-1]
    assert meta_entry["file-size-in-bytes"] == _os.path.getsize(p1)
    assert meta_entry["file-footer-size-in-bytes"] == (
        _os.path.getsize(p1) - last["offset"] - last["length"]
    )
    # payload is a live sketch: estimate within 5% of exact
    for r in got.values():
        sk = read_blob(
            r["statistics_path"], r["offset"], r["length"]
        )
        est = (
            spark.createDataFrame([(sk,)], "sk binary")
            .selectExpr("hll_sketch_estimate(sk) AS e")
            .collect()[0]["e"]
        )
        assert abs(est - r["ndv"]) <= max(1, 0.05 * r["ndv"])
    # same-snapshot rewrite replaces, new snapshot appends
    t.write_table_statistics(columns=["k"])
    assert len(t._metadata()["statistics"]) == 1
    assert t.statistics_df().count() == 2  # theta + hll for one column
    t.append(spark.createDataFrame([(100, "c", 9.0)], "k long, s string, v double"))
    t.write_table_statistics(columns=["k", "s"])
    assert len(t._metadata()["statistics"]) == 2
    got2 = {r["column_name"]: r["ndv"] for r in t.statistics_df().collect()}
    assert got2 == {"k": 101, "s": 3}
    # sketch selection: hll-only keeps the pre-theta shape
    t.write_table_statistics(columns=["k"], sketches=("hll",))
    only = t.statistics_df().collect()
    assert [r["blob_type"] for r in only] == ["apache-datasketches-hll-v1"]
    with pytest.raises(ValueError, match="unknown columns"):
        t.write_table_statistics(columns=["nope"])


def test_table_statistics_snapshot_schema(spark, tmp_path):
    """Stats for a NON-current snapshot resolve names and field ids
    from that snapshot's recorded schema, not the table's current one
    (r11 ADVICE: after a rename/add, current-schema resolution either
    failed the scan or attributed NDVs to the wrong ids). Lifecycle:
    snapshot 1 under (k, v), rename v->w + add extra, snapshot 2 —
    stats for snapshot 1 must speak 'v' (field id 2), stats at the tip
    must speak 'w' and see the appended rows."""
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(50)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    first = t._metadata()["current-snapshot-id"]
    t.update_schema(rename={"v": "w"}, add=[("extra", "string")])
    t.append(
        spark.createDataFrame(
            [(100 + i, 50.0 + i, "x") for i in range(3)],
            "k long, w double, extra string",
        )
    )
    # old snapshot: old row set (ndv 7 proves snapshot 1 was scanned,
    # not the tip), ids from the snapshot's schema; display names
    # resolve by field id through the CURRENT schema — the planner's
    # mapping — so the renamed column reads back as 'w'
    t.write_table_statistics(snapshot_id=first)
    got = {
        r["column_name"]: r["ndv"]
        for r in t.statistics_df(snapshot_id=first).collect()
    }
    assert got == {"k": 50, "w": 7}
    fields = {
        f["name"]: f["id"]
        for s in t._metadata()["schemas"]
        for f in s["fields"]
    }
    blob_ids = {
        b["fields"][0]
        for e in t._metadata()["statistics"]
        if e["snapshot-id"] == first
        for b in e["blob-metadata"]
    }
    assert blob_ids == {fields["k"], fields["w"]}  # 'v' kept its id
    # tip: renamed + added columns, appended rows included
    t.write_table_statistics()
    got2 = {
        r["column_name"]: r["ndv"] for r in t.statistics_df().collect()
    }
    assert got2 == {"k": 53, "w": 10, "extra": 1}


def test_v3_default_values_lifecycle(spark, tmp_path):
    """v3 column defaults: ADD COLUMN ... DEFAULT sets initial-default
    (pre-existing rows read it — not null) and write-default (appends
    omitting the column store it); SET DEFAULT rebinds the
    write-default only; dropping the default makes omission an error
    again; compaction materializes the values physically; v2 refuses
    defaults outright."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    ).coalesce(1)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    with pytest.raises(ValueError, match="format-version 3"):
        t.update_schema(add=[("cls", "string", "bulk")])
    t.upgrade_format_version(3)
    t.update_schema(add=[("cls", "string", "bulk"), ("prio", "long", 5)])
    # pre-existing rows read the initial-default, not null
    got = {r["k"]: (r["cls"], r["prio"]) for r in t.scan().collect()}
    assert all(got[k] == ("bulk", 5) for k in range(10))
    # an append omitting the columns stores the write-default
    t.append(
        spark.createDataFrame([(10, 10.0)], "k long, v double")
    )
    assert t.scan().filter("k = 10").collect()[0]["cls"] == "bulk"
    # SET DEFAULT rebinds write-default; initial rows are untouched
    t.update_schema(set_default={"cls": "stream"})
    t.append(spark.createDataFrame([(11, 11.0)], "k long, v double"))
    by_k = {r["k"]: r["cls"] for r in t.scan().collect()}
    assert by_k[0] == "bulk" and by_k[10] == "bulk"
    assert by_k[11] == "stream"
    # dropping the default makes omission an error again
    t.update_schema(set_default={"cls": None})
    with pytest.raises(ValueError, match="no write-default"):
        t.append(spark.createDataFrame([(12, 12.0)], "k long, v double"))
    # compaction materializes the read-time defaults physically
    t.compact()
    by_k = {r["k"]: (r["cls"], r["prio"]) for r in t.scan().collect()}
    assert by_k[3] == ("bulk", 5) and by_k[11] == ("stream", 5)
    assert len(by_k) == 12


def test_rewrite_data_files_targeted(spark, tmp_path):
    """rewrite_data_files: only partitions with >= min_input_files
    small files rewrite; untouched files carry forward PATH-identical;
    DVs targeting rewritten files drop in the same commit; row ids
    survive on v3; a caught-up second call is a no-op; the sort
    strategy demands a sort order."""
    def slab(lo, hi, p):
        return spark.createDataFrame(
            [(i, p, float(i)) for i in range(lo, hi)],
            "k long, p string, v double",
        ).coalesce(1)

    # 4 append commits into partition A (1 file each — the writer
    # hash-distributes by partition value) = the small-files debt
    t = IcebergNativeTable.create(
        spark, str(tmp_path / "t"), slab(0, 10, "A"), partition_by=["p"]
    )
    t.append(slab(10, 20, "A"))
    t.append(slab(20, 30, "A"))
    t.append(slab(30, 40, "A"))
    t.append(slab(40, 50, "B"))
    t.upgrade_format_version(3)
    t.delete_where((F.col("p") == "A") & (F.col("k") < 5), "merge-on-read")
    _, _, data0, pos0, _ = t._plan()
    b_paths0 = {d["path"] for d in data0 if d["partition"].get("p") == "B"}
    assert len(data0) == 5 and pos0  # 4 A files + 1 B file, 1+ DV
    ids_before = sorted(
        tuple(r)
        for r in t.scan(with_row_lineage=True)
        .select("k", "_row_id")
        .collect()
    )

    n = t.rewrite_data_files(
        target_file_size_bytes=32 * 1024 * 1024, min_input_files=2
    )
    assert n == 4  # only partition A (B has 1 file < min_input_files)
    _, _, data1, pos1, _ = t._plan()
    a_files = [d for d in data1 if d["partition"].get("p") == "A"]
    b_files = {d["path"] for d in data1 if d["partition"].get("p") == "B"}
    assert len(a_files) < 4  # consolidated
    assert b_files == b_paths0  # untouched partition carries path-identical
    assert not pos1  # the A-scoped DVs dropped with their targets
    assert sorted(r["k"] for r in t.scan().select("k").collect()) == sorted(
        list(range(5, 40)) + list(range(40, 50))
    )
    # identity survived the rewrite (materialized lineage)
    ids_after = sorted(
        tuple(r)
        for r in t.scan(with_row_lineage=True)
        .select("k", "_row_id")
        .collect()
    )
    assert ids_after == ids_before
    assert t.rewrite_data_files(
        target_file_size_bytes=32 * 1024 * 1024, min_input_files=2
    ) == 0  # idempotent: consolidated partitions no longer qualify
    with pytest.raises(ValueError, match="sort order"):
        t.rewrite_data_files(strategy="sort")
    with pytest.raises(ValueError, match="unknown rewrite strategy"):
        t.rewrite_data_files(strategy="zorder")


def test_expire_snapshots_older_than(spark, tmp_path):
    """expire_snapshots(older_than_ms): only snapshots strictly older
    than the cutoff expire; keep_last and ref retention still apply on
    top; the current snapshot is always safe."""
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    for i in range(2, 6):
        t.append(spark.createDataFrame([(i, float(i))], "k long, v double"))
    snaps = t._metadata()["snapshots"]
    assert len(snaps) == 5
    cut = snaps[2]["timestamp-ms"]  # snapshots 1,2 are strictly older
    t.create_tag("keep1", snapshot_id=snaps[0]["snapshot-id"])
    expired = t.expire_snapshots(keep_last=1, older_than_ms=cut)
    # snapshot 1 is tag-protected; only snapshot 2 expires
    assert expired == [snaps[1]["snapshot-id"]]
    left = {s["snapshot-id"] for s in t._metadata()["snapshots"]}
    assert snaps[0]["snapshot-id"] in left
    assert t.scan().count() == 5  # current state untouched
    # no cutoff: everything but refs + newest goes (legacy behavior)
    expired2 = t.expire_snapshots(keep_last=1)
    assert t._metadata()["current-snapshot-id"] in {
        s["snapshot-id"] for s in t._metadata()["snapshots"]
    }
    assert snaps[0]["snapshot-id"] not in expired2  # still tag-protected


def test_ref_retention_policies(spark, tmp_path):
    """Spec per-ref retention: a branch's min-snapshots-to-keep /
    max-snapshot-age-ms protect its OWN ancestor chain from
    expire_snapshots; max-ref-age-ms ages the ref itself out (and with
    it, its protection); main is never aged out. now_ms is pinned so
    the test is deterministic."""
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    for i in range(2, 7):
        t.append(spark.createDataFrame([(i, float(i))], "k long, v double"))
    snaps = t._metadata()["snapshots"]
    ids = [s["snapshot-id"] for s in snaps]  # 1..6
    last_ts = snaps[-1]["timestamp-ms"]

    # branch at snapshot 4 keeping 3 ancestors (4,3,2); tag at snapshot
    # 1 that is already past its ref age; branch at snapshot 2 likewise
    t.create_branch("dev", snapshot_id=ids[3], min_snapshots_to_keep=3)
    t.create_tag("old-tag", snapshot_id=ids[0], max_ref_age_ms=10)
    t.create_branch("stale", snapshot_id=ids[1], max_ref_age_ms=10)
    expired = t.expire_snapshots(keep_last=1, now_ms=last_ts + 3_600_000)
    left = {s["snapshot-id"] for s in t._metadata()["snapshots"]}
    # kept: 6 (current), 4+3+2 (dev's chain, min 3); expired: 1, 5
    assert left == {ids[5], ids[3], ids[2], ids[1]}
    assert sorted(expired) == sorted([ids[0], ids[4]])
    refs = {r["name"] for r in t.refs_df().collect()}
    assert refs == {"main", "dev"}  # aged-out refs removed
    # retention fields surface in the metadata table
    dev = [r for r in t.refs_df().collect() if r["name"] == "dev"][0]
    assert dev["min_snapshots_to_keep"] == 3
    # max-snapshot-age keeps young ancestors beyond min-keep
    t2 = IcebergNativeTable.create(spark, str(tmp_path / "t2"), df)
    for i in range(2, 5):
        t2.append(
            spark.createDataFrame([(i, float(i))], "k long, v double")
        )
    s2 = t2._metadata()["snapshots"]
    t2.create_branch(
        "all-young",
        snapshot_id=s2[-1]["snapshot-id"],
        min_snapshots_to_keep=1,
        max_snapshot_age_ms=3_600_000,
    )
    expired2 = t2.expire_snapshots(
        keep_last=1, now_ms=s2[-1]["timestamp-ms"] + 1000
    )
    assert expired2 == []  # every ancestor younger than the age bound


def test_changelog_across_schema_evolution(spark, tmp_path):
    """The change feed spans an ALTER: every pair resolves to the
    RANGE-END schema by field id, so pre-evolution events surface
    renamed/null-filled into one uniform shape instead of raising
    (the pre-round-11 behavior demanded a manual split)."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    ).coalesce(1)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.delete_where(F.col("k") < 2, "merge-on-read")  # snapshot 2, old schema
    t.update_schema(rename={"v": "val"}, add=[("tag", "string")])
    t.append(
        spark.createDataFrame(
            [(i, float(i), f"t{i}") for i in range(10, 13)],
            "k long, val double, tag string",
        )
    )  # snapshot 3, new schema
    ch = t.changelog_df(from_snapshot_id=1)
    assert set(ch.columns) == {
        "k", "val", "tag", "_change_type", "_commit_snapshot_id"
    }
    rows = ch.collect()
    dels = {
        r["k"]: r for r in rows if r["_change_type"] == "delete"
    }
    ins = {r["k"]: r for r in rows if r["_change_type"] == "insert"}
    # pre-evolution delete events: renamed column carries the value,
    # added column null-fills
    assert set(dels) == {0, 1}
    assert dels[0]["val"] == 0.0 and dels[0]["tag"] is None
    assert dels[0]["_commit_snapshot_id"] == 2
    # post-evolution inserts carry the new column
    assert {(r["k"], r["tag"]) for r in ins.values()} == {
        (10, "t10"), (11, "t11"), (12, "t12")
    }
    # a sub-range ending BEFORE the evolution reads the old shape
    old = t.changelog_df(from_snapshot_id=1, to_snapshot_id=2)
    assert set(old.columns) == {"k", "v", "_change_type", "_commit_snapshot_id"}
    assert {r["k"] for r in old.collect()} == {0, 1}


def test_changelog_long_range_plans_one_job_wave(spark, tmp_path):
    """A 20-commit range PLANS with at most one Spark job (the batched
    parquet position-delete target resolution), not one sequential job
    per pair (pre-r12: a 100-commit CDC range serialized into 100 job
    waves). Correctness over the long range is unchanged: every
    commit's events surface exactly once."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k long, v double"
    ).coalesce(1)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    # 10 MOR delete commits (each lands a parquet position-delete
    # file -> one pq_new entry per pair) + 10 small appends
    for i in range(10):
        t.delete_where(F.col("k") == i, mode="merge-on-read")
        t.append(
            spark.createDataFrame(
                [(1000 + i, float(i))], "k long, v double"
            )
        )
    sc = spark.sparkContext
    sc.setJobGroup("changelog-plan", "plan a 20-commit range")
    try:
        feed = t.changelog_df(from_snapshot_id=1)
    finally:
        sc.setJobGroup(None, None)
    plan_jobs = sc.statusTracker().getJobIdsForGroup("changelog-plan")
    # ONE action (the batched delete-target resolution); AQE submits
    # one Spark job per query stage of that action, so allow a small
    # CONSTANT — the point is independence from the commit count
    # (pre-r12 this planned ~4 jobs PER PAIR: ~80 here)
    assert len(plan_jobs) <= 3, (
        f"planning ran {len(plan_jobs)} jobs; the range must batch "
        "its delete-target resolution into one action"
    )
    rows = feed.collect()
    dels = sorted(
        r["k"] for r in rows if r["_change_type"] == "delete"
    )
    ins = sorted(r["k"] for r in rows if r["_change_type"] == "insert")
    assert dels == list(range(10))
    assert ins == [1000 + i for i in range(10)]
    # 20 distinct commit ids, one event each
    assert len({r["_commit_snapshot_id"] for r in rows}) == 20


def test_changelog_fast_path_plan_shapes(spark, tmp_path):
    """r13 changelog planner fast paths (real Iceberg's task shapes):
    an append-only commit's changelog chunk is a bare scan of the added
    files tagged 'insert' (AddedRowsScanTask — no multiset-diff
    aggregate in the plan); a delete-only commit's chunk is the prev
    view semi-joined on the new delete coordinates
    (DeletedRowsScanTask — a LeftSemi join, still no aggregate); a
    COW/overwrite commit (files added AND removed) keeps the general
    multiset diff (HashAggregate present). Values are pinned by
    test_changelog_diff_semantics and the oracle; this pins the PLAN."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.append(
        spark.createDataFrame([(100, 100.0)], "k long, v double")
    )  # s2: append-only
    t.delete_where(F.col("k") == 3, mode="merge-on-read")  # s3: delete-only
    t.update_where(
        F.col("k") == 5, {"v": F.lit(999.0)}, mode="copy-on-write"
    )  # s4: COW rewrite (added AND removed files)

    def plan(from_id, to_id):
        d = t.changelog_df(from_snapshot_id=from_id, to_snapshot_id=to_id)
        return d._jdf.queryExecution().optimizedPlan().toString()

    append_plan = plan(1, 2)
    assert "Aggregate" not in append_plan  # no diff for a pure append
    delete_plan = plan(2, 3)
    assert "Aggregate" not in delete_plan  # no diff for a pure delete
    assert "LeftSemi" in delete_plan  # rows killed by the new coords
    cow_plan = plan(3, 4)
    assert "Aggregate" in cow_plan  # general multiset diff retained

    # and the fast-path chunks still produce the exact change events
    rows = t.changelog_df(from_snapshot_id=1).collect()
    by_snap = {}
    for r in rows:
        by_snap.setdefault(r["_commit_snapshot_id"], []).append(
            (r["_change_type"], r["k"], r["v"])
        )
    assert by_snap[2] == [("insert", 100, 100.0)]
    assert by_snap[3] == [("delete", 3, 3.0)]
    assert sorted(by_snap[4]) == [("delete", 5, 5.0), ("insert", 5, 999.0)]
