"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference's sources are all built-in formats; this covers the Spark-4
extension point a training-data platform actually uses to ingest from
bespoke systems (a crawl frontier, an internal manifest service, a
proprietary queue) WITHOUT a JVM connector: a pure-Python ``DataSource``
whose reader declares its own partitioning, so Spark schedules one task
per input partition and the source scales out like any file scan.

The demo source synthesizes a deterministic "crawl manifest" — shard s,
row i → (shard, url, n_bytes) with n_bytes a closed-form mix of the
global sequence number — so the DuckDB oracle can recompute every value
analytically (same discipline as the BMP/WAV generative fixtures).

Scale notes: ``partitions()`` runs on the driver (keep it metadata-only
— here O(shards)); ``read(partition)`` runs in executors as Arrow-fed
Python workers. Values cross to the JVM through the same Arrow batch
path as mapInPandas, so a custom source is no slower than the Pandas-UDF
hot path — but built-in JVM sources still win where one exists; this API
is for sources that have none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MIX_MUL = 2_654_435_761  # Knuth multiplicative constant (texthash.REMIX_MUL)
MIX_ADD = 101
MIX_MOD = 100_000
# declared-query scan shape; the DuckDB oracle interpolates these (and the
# MIX_* constants above) so both sides share one definition
N_SHARDS = 8
PER_SHARD = 200


class CrawlManifestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.shards = int(options.get("shards", "4"))
        self.per_shard = int(options.get("per_shard", "100"))

    def partitions(self) -> list[InputPartition]:
        # one Spark task per manifest shard — the source's parallelism
        return [InputPartition(i) for i in range(self.shards)]

    def read(self, partition: InputPartition):
        s = partition.value
        for i in range(self.per_shard):
            seq = s * self.per_shard + i
            yield (s, f"doc-{seq}", (seq * MIX_MUL + MIX_ADD) % MIX_MOD)


class CrawlManifestSource(DataSource):
    """``spark.read.format("crawl_manifest")`` — registered per session."""

    @classmethod
    def name(cls) -> str:
        return "crawl_manifest"

    def schema(self) -> str:
        return "shard int, url string, n_bytes long"

    def reader(self, schema) -> CrawlManifestReader:
        return CrawlManifestReader(self.options)


def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: register the custom source, scan 8 shards × 200
    rows, and aggregate per shard — the oracle recomputes the closed-form
    byte counts analytically, so a partition-mapping or value-marshalling
    bug in the source hash-mismatches."""
    spark.dataSource.register(CrawlManifestSource)
    df = (
        spark.read.format("crawl_manifest")
        .option("shards", str(N_SHARDS))
        .option("per_shard", str(PER_SHARD))
        .load()
    )
    return df.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_distinct("url").alias("n_distinct_urls"),
    )
