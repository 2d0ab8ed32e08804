"""Streaming SOURCE over the native Iceberg layout (Spark 4 Python
DataSource streaming API): snapshot-sequence offsets, exactly-once
across restarts.

The reference demonstrates Iceberg as a Spark TABLE; the streaming read
(``spark.readStream.format("iceberg")``) is the other half of the
streaming story the sink query (``stream_to_iceberg``) began. Offsets
are ``{"seq": N}`` — the last consumed sequence number on the CURRENT
lineage — so the checkpoint alone pins what has been emitted; a second
``availableNow`` run on the same checkpoint consumes only snapshots
committed since.

Two reader flavors share one planning routine (each micro-batch is
PLANNED from kilobyte-scale metadata — metadata.json + Avro manifests
via the repo's pure-Python codec; no SparkSession in the read path):

- ``icebergnative_stream`` — ``SimpleDataSourceStreamReader``, decode
  on the driver: the control-plane demo of the API, right when batches
  are small.
- ``icebergnative_stream_bulk`` — ``DataSourceStreamReader``: every
  planned data file becomes an ``InputPartition`` decoded by an
  EXECUTOR task, so an N-file micro-batch reads N-way parallel — the
  100 TB ingest shape. Offsets and snapshot rules are identical; the
  flavors are interchangeable on one checkpoint lineage.

Semantics mirror Iceberg's Spark streaming read: APPEND snapshots are
consumed; REPLACE snapshots (compaction, position-delete rewrites) are
SKIPPED — logically neutral, re-emitting their files would duplicate
every row; DELETE/OVERWRITE snapshots raise unless
``option("skip_non_appends", "true")`` — a streaming reader cannot
retract rows it already emitted (Iceberg's
``streaming-skip-delete-snapshots`` contract).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _read_meta(location: str) -> dict:
    md = os.path.join(location, "metadata")
    with open(os.path.join(md, "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(md, f"v{v}.metadata.json")) as f:
        return json.load(f)


def _strip_scheme(p: str) -> str:
    return p[5:] if p.startswith("file:") else p


def _lineage(meta: dict) -> list[dict]:
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    chain: list[dict] = []
    sid = meta.get("current-snapshot-id")
    while sid is not None:
        s = snaps[sid]
        chain.append(s)
        sid = s.get("parent-snapshot-id")
    chain.reverse()
    return chain


def _added_files_of(snap: dict) -> list[str]:
    """Data files ADDED by this snapshot: manifests in its list carrying
    the snapshot's own sequence number (carried-forward manifests keep
    their older numbers), then ADDED entries within."""
    from iceberg_examples_spark.sources.avro_codec import read_container

    seq = snap["sequence-number"]
    with open(_strip_scheme(snap["manifest-list"]), "rb") as f:
        _, _, manifests = read_container(f.read())
    paths: list[str] = []
    for mf in manifests:
        if mf.get("content", 0) != 0:
            continue
        if mf.get("sequence_number") != seq:
            continue
        with open(_strip_scheme(mf["manifest_path"]), "rb") as f:
            _, _, entries = read_container(f.read())
        for e in entries:
            if e.get("status") == 2:
                continue
            if e.get("data_sequence_number", seq) != seq:
                continue
            paths.append(_strip_scheme(e["data_file"]["file_path"]))
    return paths


def _plan_files_between(
    chain: list[dict], lo: int, hi: int, skip_non_appends: bool
) -> list[str]:
    """The data files a stream must emit for sequence numbers in
    ``(lo, hi]`` — the one planning routine both reader flavors share.
    REPLACE snapshots (compaction / delete rewrites) are skipped as
    logically neutral; DELETE/OVERWRITE snapshots raise unless
    ``skip_non_appends`` (a stream cannot retract emitted rows)."""
    paths: list[str] = []
    for s in chain:
        seq = s["sequence-number"]
        if not (lo < seq <= hi):
            continue
        op = s.get("summary", {}).get("operation", "append")
        if op == "replace":
            continue
        if op != "append":
            if skip_non_appends:
                continue
            raise ValueError(
                f"snapshot {s['snapshot-id']} is a {op!r} commit; a "
                "streaming read cannot retract emitted rows (set "
                "skip_non_appends=true to ignore non-append snapshots)"
            )
        paths.extend(_added_files_of(s))
    return paths


class IcebergStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, location: str, skip_non_appends: bool):
        self.location = location
        self.skip_non_appends = skip_non_appends

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        meta = _read_meta(self.location)
        chain = _lineage(meta)
        latest = chain[-1]["sequence-number"] if chain else 0
        rows = self._rows_between(meta, chain, start["seq"], latest)
        return iter(rows), {"seq": latest}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: same planning, pinned end
        meta = _read_meta(self.location)
        chain = _lineage(meta)
        return iter(
            self._rows_between(meta, chain, start["seq"], end["seq"])
        )

    # -- planning + decode (pure Python, metadata-driven) ---------------

    def _rows_between(
        self, meta: dict, chain: list[dict], lo: int, hi: int
    ) -> list[tuple]:
        cur = next(
            s
            for s in meta["schemas"]
            if s["schema-id"] == meta["current-schema-id"]
        )
        names = [f["name"] for f in cur["fields"]]
        out: list[tuple] = []
        for path in _plan_files_between(
            chain, lo, hi, self.skip_non_appends
        ):
            out.extend(_decode_file(path, names))
        return out


def _decode_file(path: str, names: list[str]):
    """Decode one data file to row tuples with name-based projection and
    null-fill (appends under an older schema lack later columns)."""
    import pyarrow.parquet as pq

    for r in pq.read_table(path).to_pylist():
        yield tuple(r.get(n) for n in names)


class IcebergFileSplit(InputPartition):
    """One data file of one micro-batch — the split `partitions()` hands
    an executor task (picklable: path + projection only)."""

    def __init__(self, path: str, names: list[str]):
        self.path = path
        self.names = names


class IcebergBulkStreamReader(DataSourceStreamReader):
    """The executor-parallel flavor (``DataSourceStreamReader``): the
    driver still PLANS each micro-batch from kilobyte metadata —
    ``latestOffset`` reads metadata.json, ``partitions(start, end)``
    walks the Avro manifests — but every planned data file becomes an
    ``InputPartition`` DECODED BY AN EXECUTOR TASK, so a micro-batch of
    N files reads with N-way parallelism instead of serially on the
    driver. Same offsets ({"seq": N}), same skip/raise snapshot rules,
    same checkpoint semantics as the simple reader — the two flavors
    are interchangeable on one checkpoint lineage."""

    def __init__(
        self, location: str, skip_non_appends: bool, names: list[str]
    ):
        self.location = location
        self.skip_non_appends = skip_non_appends
        self.names = names

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        meta = _read_meta(self.location)
        chain = _lineage(meta)
        return {"seq": chain[-1]["sequence-number"] if chain else 0}

    def partitions(self, start: dict, end: dict):
        meta = _read_meta(self.location)
        chain = _lineage(meta)
        paths = _plan_files_between(
            chain, start["seq"], end["seq"], self.skip_non_appends
        )
        # an empty batch still needs one (empty) split: Spark requires
        # at least one partition per planned micro-batch
        if not paths:
            return [IcebergFileSplit("", self.names)]
        return [IcebergFileSplit(p, self.names) for p in paths]

    def read(self, partition: IcebergFileSplit):
        if not partition.path:
            return iter(())
        return _decode_file(partition.path, partition.names)

    def commit(self, end: dict) -> None:
        pass  # checkpoint-managed; nothing table-side to release


class IcebergNativeStreamSource(DataSource):
    """``spark.readStream.format("icebergnative_stream")
    .option("path", <table location>)`` — registered per session."""

    @classmethod
    def name(cls) -> str:
        return "icebergnative_stream"

    def schema(self) -> str:
        from iceberg_examples_spark.sources.iceberg_native import (
            _ice_to_ddl,
        )

        meta = _read_meta(self.options["path"])
        cur = next(
            s
            for s in meta["schemas"]
            if s["schema-id"] == meta["current-schema-id"]
        )
        return ", ".join(
            f"{f['name']} {_ice_to_ddl(f['type'])}" for f in cur["fields"]
        )

    def simpleStreamReader(self, schema) -> IcebergStreamReader:
        return IcebergStreamReader(
            self.options["path"],
            self.options.get("skip_non_appends", "false").lower() == "true",
        )


class IcebergNativeBulkStreamSource(DataSource):
    """``spark.readStream.format("icebergnative_stream_bulk")`` — the
    executor-parallel variant: identical offsets and snapshot rules,
    file decode fanned out to tasks via ``partitions()``."""

    @classmethod
    def name(cls) -> str:
        return "icebergnative_stream_bulk"

    def schema(self) -> str:
        from iceberg_examples_spark.sources.iceberg_native import (
            _ice_to_ddl,
        )

        meta = _read_meta(self.options["path"])
        cur = next(
            s
            for s in meta["schemas"]
            if s["schema-id"] == meta["current-schema-id"]
        )
        return ", ".join(
            f"{f['name']} {_ice_to_ddl(f['type'])}" for f in cur["fields"]
        )

    def streamReader(self, schema) -> IcebergBulkStreamReader:
        meta = _read_meta(self.options["path"])
        cur = next(
            s
            for s in meta["schemas"]
            if s["schema-id"] == meta["current-schema-id"]
        )
        return IcebergBulkStreamReader(
            self.options["path"],
            self.options.get("skip_non_appends", "false").lower() == "true",
            [f["name"] for f in cur["fields"]],
        )


def stream_from_iceberg(spark, sf_dir: str):
    """Declared query: streaming READ with snapshot offsets, restart
    exactly-once, and replace-skip. Run 1 (availableNow) consumes
    snapshots 1-2 (clicks + purchases); then a compaction commits a
    REPLACE snapshot (must be skipped — re-emitting it would duplicate
    everything) and views land as snapshot 4; run 2 on the SAME
    checkpoint consumes ONLY the view snapshot. The oracle is one pass
    over the raw events: any offset rewind, replay, or compaction
    re-emission doubles a count and hash-mismatches."""
    from pyspark.sql import functions as F

    from iceberg_examples_spark.catalog import load_table, scratch_dir
    from iceberg_examples_spark.functions.exact import money_sum_sql
    from iceberg_examples_spark.sources.iceberg_native import (
        IcebergNativeTable,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = scratch_dir(sf_dir, "stream_from_iceberg", fresh=True)
    src = IcebergNativeTable.create(
        spark,
        os.path.join(root, "ice"),
        ev.filter(F.col("event_type") == "click"),
    )
    src.append(ev.filter(F.col("event_type") == "purchase"))
    try:
        spark.dataSource.register(IcebergNativeStreamSource)
    except Exception as e:
        # only an already-registered name is benign; a real registration
        # failure must propagate NOW, not resurface later as a baffling
        # "format not found" from readStream
        if "already" not in str(e).lower():
            raise
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")

    def drain() -> None:
        q = (
            spark.readStream.format("icebergnative_stream")
            .option("path", src.location)
            .load()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(
                lambda b, e: b.write.mode("append").parquet(out)
            )
            .start()
        )
        q.awaitTermination()

    drain()
    src.compact()  # replace snapshot: the reader must skip it
    src.append(ev.filter(F.col("event_type") == "view"))
    drain()
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(money_sum_sql("value", scale=100)).alias("total_value"),
        )
        .orderBy("event_type")
    )


def stream_from_iceberg_bulk(spark, sf_dir: str):
    """Declared query: the EXECUTOR-PARALLEL streaming read. The table
    is written with pinned file counts (3 click files, then 2 purchase
    files, then 2 view files), so the split counts the batches report
    are deterministic: run 1 plans 5 files -> 5 input partitions (one
    executor task each), run 2 — after a MOR DELETE that
    ``skip_non_appends`` must skip — plans exactly the 2 new view
    files. The oracle is one pass over the raw events: a dropped or
    double-read split, a replayed offset, or a delete wrongly applied
    to already-emitted rows all hash-mismatch; the split columns pin
    that planning stayed one-task-per-file."""
    from pyspark.sql import functions as F

    from iceberg_examples_spark.catalog import load_table, scratch_dir
    from iceberg_examples_spark.functions.exact import money_sum_sql
    from iceberg_examples_spark.sources.iceberg_native import (
        IcebergNativeTable,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = scratch_dir(sf_dir, "stream_from_iceberg_bulk", fresh=True)
    src = IcebergNativeTable.create(
        spark,
        os.path.join(root, "ice"),
        ev.filter(F.col("event_type") == "click").repartition(3),
    )
    src.append(ev.filter(F.col("event_type") == "purchase").repartition(2))
    try:
        spark.dataSource.register(IcebergNativeBulkStreamSource)
    except Exception as e:
        # only an already-registered name is benign; a real registration
        # failure must propagate NOW, not resurface later as a baffling
        # "format not found" from readStream
        if "already" not in str(e).lower():
            raise
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    splits: list[int] = []

    def sink(b, _epoch) -> None:
        splits.append(b.rdd.getNumPartitions())
        b.write.mode("append").parquet(out)

    def drain() -> None:
        q = (
            spark.readStream.format("icebergnative_stream_bulk")
            .option("path", src.location)
            .option("skip_non_appends", "true")
            .load()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()

    drain()
    # a MOR DELETE commits a 'delete' snapshot: the reader must SKIP it
    # (already-emitted rows cannot be retracted) and emit only the views
    src.delete_where(F.col("value") > 120.0, mode="merge-on-read")
    src.append(ev.filter(F.col("event_type") == "view").repartition(2))
    drain()
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(money_sum_sql("value", scale=100)).alias("total_value"),
        )
        .withColumn("n_splits_run1", F.lit(splits[0]))
        .withColumn("n_splits_run2", F.lit(splits[1]))
        .orderBy("event_type")
    )
