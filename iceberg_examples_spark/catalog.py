"""Catalog: named-table access over the driver testdata + a snapshot-versioned
local table format.

The reference manages named, versioned tables through an Iceberg catalog
(``Setup.java:38-43``; snapshots via ``newAppend().commit()``,
``IcebergJavaApiAppend.java:92-94``). This module supplies the same two
capabilities Spark-natively:

- :func:`register_views` / :func:`load_table` — name -> DataFrame over the
  driver-provided parquet star schema (``TESTDATA.md``).
- :class:`LocalTable` — a minimal snapshot-versioned table on a directory:
  every commit writes an immutable parquet snapshot dir plus a metadata
  pointer (atomic rename), giving append / overwrite / time-travel reads —
  the observable semantics of Iceberg's snapshot commits without the
  connector jar.  On a cluster the same API is backed by the real Iceberg
  catalog (see ``sources/iceberg_compat.py``); nothing above this layer
  changes.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (columnar parquet scan; Catalyst gets
    pushdown + pruning for free because this is a plain file scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it
    arrives as raw nanoseconds and is truncated to a µs timestamp here —
    exactly what DuckDB does implicitly, so both engines see equal values.
    """
    # Defensive session confs: the driver supplies its own SparkSession,
    # which may lack these (both are runtime-settable). Without
    # nanosAsLong the events scan throws PARQUET_TYPE_ILLEGAL; without
    # UTC the µs-epoch → timestamp conversion below would render in an
    # arbitrary local zone and break oracle comparison.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # NTZ, like every other testdata timestamp column: tz-naive values
        # cross the arrow/oracle boundary identically to DuckDB's TIMESTAMP
        # (a tz-aware column would compare unequal under strict tooling)
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register testdata tables as temp views (SQL entry point EP1).
    Pass ``tables`` to register only what a query needs — registering all
    ten costs ten footer reads and clobbers same-named caller views."""
    out: dict[str, DataFrame] = {}
    for name in tables if tables is not None else TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def scratch_dir(sf_dir: str, name: str, fresh: bool = False) -> str:
    """Per-process scratch path for query-internal writes:
    ``/tmp/ies_<name>_<sf-tag>_<pid>``. The pid suffix isolates concurrent
    processes (bench + pytest racing on one path would rmtree snapshots
    out from under each other's lazy jobs); ``fresh`` clears leftovers
    from a previous run of THIS pid."""
    import shutil

    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/ies_{name}_{tag}_{os.getpid()}"
    if fresh:
        shutil.rmtree(path, ignore_errors=True)
    return path


class LocalTable:
    """Snapshot-versioned parquet table (lakehouse-lite).

    Layout::

        <root>/snap-00000/   immutable parquet files of snapshot 0
        <root>/snap-00001/   ...
        <root>/_metadata.json  {"current": 1, "snapshots": [...]}

    Commits are atomic via write-to-temp + ``os.replace`` of the metadata
    pointer — the same optimistic metadata-swap idea Iceberg uses
    (``IcebergJavaApiAppend.java:92-94``), scaled down to a local/posix or
    object-store-with-rename filesystem. Each snapshot records its parent,
    operation, and schema for time travel and audit.
    """

    METADATA = "_metadata.json"

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- metadata -------------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.root, self.METADATA)

    def _read_meta(self) -> dict:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"current": -1, "snapshots": []}

    def _write_meta(self, meta: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(tmp, self._meta_path())  # atomic pointer swap

    # ---- snapshot surface ----------------------------------------------
    @property
    def current_version(self) -> int:
        return self._read_meta()["current"]

    def snapshots(self) -> list[dict]:
        """Snapshot log — the engine's ``#history``/``#snapshots`` metadata
        surface (reference: ``IcebergHadoopTables.java:44-47``)."""
        return self._read_meta()["snapshots"]

    def exists(self) -> bool:
        return self.current_version >= 0

    def _snap_dir(self, version: int) -> str:
        return os.path.join(self.root, f"snap-{version:05d}")

    def _commit(self, df: DataFrame, operation: str, partition_by: list[str] | None) -> int:
        meta = self._read_meta()
        version = meta["current"] + 1
        path = self._snap_dir(version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        meta["snapshots"].append(
            {
                "version": version,
                "parent": meta["current"],
                "operation": operation,
                "schema": df.schema.jsonValue(),
                "partition_by": partition_by or [],
            }
        )
        meta["current"] = version
        self._write_meta(meta)
        return version

    # ---- public API -----------------------------------------------------
    def create(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        return self._commit(df, "create", partition_by)

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Replace table contents (copy-on-write commit)."""
        return self._commit(df, "overwrite", partition_by)

    def append(self, df: DataFrame) -> int:
        """Append = previous snapshot ∪ new rows, committed as a new
        immutable snapshot (the ``newAppend().appendFile().commit()``
        observable semantics)."""
        if self.exists():
            df = self.read().unionByName(df, allowMissingColumns=True)
        return self._commit(df, "append", None)

    def read(self, version: int | None = None) -> DataFrame:
        """Read current or time-travel to an older snapshot."""
        v = self.current_version if version is None else version
        if v < 0:
            raise FileNotFoundError(f"table {self.root} has no snapshots")
        return self.spark.read.parquet(self._snap_dir(v))

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Incremental read: rows present in ``to_version`` but not in
        ``from_version`` (Iceberg incremental-scan analogue; appended rows
        for append-only history, net-new rows across overwrites). Bag
        semantics via exceptAll so duplicate appended rows are kept."""
        newer = self.read(to_version)
        older = self.read(from_version)
        return newer.exceptAll(older)

    def compact(self, target_files: int = 1) -> int:
        """Small-file compaction: rewrite the current snapshot into
        ``target_files`` files as a new snapshot (Iceberg
        rewrite_data_files analogue). Data is unchanged — only layout."""
        df = self.read().coalesce(target_files)
        return self._commit(df, "compact", None)
