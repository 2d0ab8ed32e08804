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

The reader is ``SimpleDataSourceStreamReader`` (driver-side) by design:
each micro-batch is PLANNED from kilobyte-scale metadata (metadata.json
+ Avro manifests via the repo's pure-Python codec) and the
newly-appended files are decoded with pyarrow — no SparkSession in the
read path. That makes this the control-plane demo of the API; a
bulk-throughput variant would hand file splits to executor tasks via
``DataSourceStreamReader.partitions()``, the same planning code either
way.

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

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


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

    def _added_files(self, snap: dict) -> list[str]:
        """Data files ADDED by this snapshot: manifests in its list
        carrying the snapshot's own sequence number (carried-forward
        manifests keep their older numbers), then ADDED entries within."""
        from iceberg_examples_spark.sources.avro_codec import (
            read_container,
        )

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

    def _rows_between(
        self, meta: dict, chain: list[dict], lo: int, hi: int
    ) -> list[tuple]:
        import pyarrow.parquet as pq

        cur = next(
            s
            for s in meta["schemas"]
            if s["schema-id"] == meta["current-schema-id"]
        )
        names = [f["name"] for f in cur["fields"]]
        out: list[tuple] = []
        for s in chain:
            seq = s["sequence-number"]
            if not (lo < seq <= hi):
                continue
            op = s.get("summary", {}).get("operation", "append")
            if op == "replace":
                continue  # compaction/rewrite: logically neutral
            if op != "append":
                if self.skip_non_appends:
                    continue
                raise ValueError(
                    f"snapshot {s['snapshot-id']} is a {op!r} commit; a "
                    "streaming read cannot retract emitted rows (set "
                    "skip_non_appends=true to ignore non-append "
                    "snapshots)"
                )
            for path in self._added_files(s):
                for r in pq.read_table(path).to_pylist():
                    # name-based projection with null-fill: appends under
                    # an older schema lack later columns
                    out.append(tuple(r.get(n) for n in names))
        return out


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
    except Exception:
        pass  # already registered in this session
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
