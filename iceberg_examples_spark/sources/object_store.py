"""Object-store listing + path-scheme seam (reference: Minio.java:88-114,
Setup.java:31-36).

The reference boots a MinIO container and demonstrates two object-store
behaviors: recursive bucket listing with per-object sizes
(``Minio.java:88-114`` walks ``listObjects(recursive=true)`` printing
name/size) and wiring Spark to an S3-compatible endpoint purely through
``fs.s3a.*`` configuration (``Setup.java:31-36`` — no code touches the S3
API directly; Spark's Hadoop FileSystem layer does).

This module reproduces that seam Spark-first: every operation goes through
``org.apache.hadoop.fs.FileSystem`` — the SAME abstraction Spark itself
reads and writes through — so a ``file://`` warehouse in tests and an
``s3a://`` warehouse in production differ by configuration only (the
``fs.s3a.*`` confs carried in session.py:67-75). Nothing here special-cases
a scheme.

Scale posture: listing is a metadata operation (one row per OBJECT, not per
row of data); the DataFrame it returns is file-count-sized, the same scale
every manifest-planning hop already pays. On a real object store the
Hadoop connector pages the listing server-side (S3 LIST v2), so the
iterator below never materializes more than a page at a time driver-side.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession


def list_objects(
    spark: SparkSession, root: str, recursive: bool = True
) -> DataFrame:
    """Recursive object listing under ``root`` — the Minio.java:88-114
    contract (object name + size, walked recursively) — through the
    Hadoop FileSystem resolved FOR root's scheme: file://, s3a://,
    hdfs:// all take this exact code path. Returns one row per object:
    ``path`` (scheme-qualified), ``relative_path`` (POSIX, from root),
    ``length`` bytes, ``modification_time`` epoch-ms."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(hconf)
    qualified = fs.makeQualified(jpath)
    base = qualified.toUri().getPath()
    it = fs.listFiles(qualified, bool(recursive))
    rows = []
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        rel = posixpath.relpath(p.toUri().getPath(), base)
        rows.append(
            (
                p.toString(),
                rel,
                st.getLen(),
                st.getModificationTime(),
            )
        )
    return spark.createDataFrame(
        rows,
        "path string, relative_path string, length long, "
        "modification_time long",
    )


def object_store_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: the listing seam exercised over a freshly-built
    Iceberg-native warehouse whose physical layout is pinned — create
    (3-way repartition) + one append (2-way) produce a deterministic
    object census: 5 data parquet, 2 metadata.json versions, 2 manifest
    lists + 2 manifests (avro), 1 version hint. The listing walks the
    store through the Hadoop FS API (the s3a seam), the query buckets
    objects by category/extension and proves sizes are real by summing
    them against a floor — a fabricated or partial listing breaks the
    counts, a non-recursive walk misses everything (objects live two
    directories deep)."""
    from pyspark.sql import functions as F

    from iceberg_examples_spark.catalog import load_table, scratch_dir
    from iceberg_examples_spark.sources.iceberg_native import (
        IcebergNativeTable,
    )

    loc = scratch_dir(sf_dir, "object_store_listing", fresh=True)
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = IcebergNativeTable.create(spark, loc, nat.repartition(3))
    t.append(nat.filter(F.col("n_regionkey") == 0).repartition(2))
    objs = list_objects(spark, loc, recursive=True)
    return (
        # committer markers (_SUCCESS) and hidden files are not table
        # content — every object-store warehouse listing skips them
        objs.filter(~F.expr("element_at(split(relative_path, '/'), -1)").rlike(r"^[_.]"))
        .select(
            F.when(
                F.col("relative_path").startswith("data/"), "data"
            )
            .otherwise("metadata")
            .alias("category"),
            F.regexp_extract("relative_path", r"\.([a-z]+)$", 1).alias(
                "ext"
            ),
            "length",
        )
        .groupBy("category", "ext")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            (F.min("length") > 0).alias("all_nonempty"),
        )
        .orderBy("category", "ext")
    )
