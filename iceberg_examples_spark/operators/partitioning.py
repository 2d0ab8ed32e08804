"""Partition transforms + partitioned writes (SURVEY §2.7 M8).

The reference demonstrates Iceberg's hidden partitioning with transform
functions — ``identity(name)``, ``bucket(5, age)``
(`IcebergHadoopTables.java:27`), ``month(effective_date)`` /
``truncate(name)`` (partition path
``effective_date_month=2020-03/name_trunc=customer_c``,
`IcebergPartitionedTable.java:56-65`).

Spark-native re-expression: transforms become *derived partition columns*
(computed in one projection) + ``write.partitionBy`` — directory-level
layout; reads that filter on the derived column get partition pruning from
the file index exactly like Iceberg's manifest-level transform pruning.

At 100 TB the decisive details are here:
- repartition by the partition column before writing, so each partition
  directory gets a bounded number of files instead of
  #tasks × #partitions small files;
- pick transforms whose cardinality matches the data volume (a month
  transform on 7 years = ~84 directories; bucket(N) to cap skew).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table, scratch_dir
from iceberg_examples_spark.functions.exact import money_sum_sql


# ---- transform functions (value → partition key) ------------------------

def identity(col: str) -> Column:
    """Iceberg identity transform."""
    return F.col(col)


def bucket(col: str, n: int) -> Column:
    """Iceberg bucket(n) transform: stable hash mod n. Spark's murmur3
    ``hash`` is deterministic across executors/runs — the partition
    routing contract bucket() needs."""
    return F.pmod(F.hash(F.col(col)), F.lit(n))


def month(col: str) -> Column:
    """Iceberg month transform → 'yyyy-MM' directory key."""
    return F.date_format(F.col(col), "yyyy-MM")


def truncate(col: str, width: int) -> Column:
    """Iceberg truncate(width) transform for strings."""
    return F.substring(F.col(col), 1, width)


def with_partition_keys(df: DataFrame, specs: dict[str, Column]) -> DataFrame:
    """Attach derived partition columns (name → transform expression)."""
    for name, expr in specs.items():
        df = df.withColumn(name, expr)
    return df


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_within: list[str] | None = None,
) -> None:
    """Partitioned parquet write with bounded file counts: hash-distribute
    on the partition columns first (each directory's rows land in one
    task → one file per directory, tasks parallel across directories —
    NOT ``repartition(1)``, which would serialize the whole write through
    a single task). ``sort_within`` adds write-side sort order inside each
    file (the reference's ``replaceSortOrder`` surface,
    `IcebergJavaApiUpsert.java:102`) so parquet row-group min/max stats
    become selective for those columns."""
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_within:
        # prefix with the partition columns: the file writer requires rows
        # clustered by partition values and would otherwise inject its own
        # (non-stable) sort, destroying the secondary order
        out = out.sortWithinPartitions(*partition_cols, *sort_within)
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)




def _partitioned_lineitem_fixture(spark: SparkSession, sf_dir: str) -> str:
    """The month-partitioned lineitem fixture as a DURABLE keyed artifact
    (persisted_index's freshness discipline: keyed on the lineitem file's
    (mtime, size) + the layout version, built once, atomic-renamed,
    race-safe). partition_prune and dynamic_partition_prune both read it;
    before this, each invocation re-wrote ~80 month directories —
    ~2 s per call of pure fixture cost at sf0.1."""
    import hashlib
    import shutil
    import uuid

    from iceberg_examples_spark.checkpointing import index_root

    src = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"pl-v1:{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:16]
    path = os.path.join(index_root(spark), f"part-lineitem-{key}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build-{uuid.uuid4().hex}"
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        )
        write_partitioned(
            with_partition_keys(li, {"ship_month": month("l_shipdate")}),
            tmp,
            ["ship_month"],
        )
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner
    return path


# ---- declared query -----------------------------------------------------

def partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 end-to-end: write lineitem partitioned by month(l_shipdate),
    read back filtering one month — the filter prunes to a single
    directory (verify with .explain: PartitionFilters, one partition
    read) — and aggregate. The oracle computes the same aggregate from
    the raw table, proving the partitioned round-trip is lossless."""
    out = _partitioned_lineitem_fixture(spark, sf_dir)
    back = spark.read.parquet(out).filter(F.col("ship_month") == "1996-03")
    return back.groupBy("ship_month").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)).alias(
            "revenue"
        ),
    )


def _bucketed_tables_fixture(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """The two bucketed table LAYOUTS as durable keyed artifacts (same
    freshness discipline as _partitioned_lineitem_fixture): the bucketed
    write — the one-time shuffle that bucketing exists to amortize — runs
    once per input state; every later invocation (and every later
    SESSION: the vanilla driver included) re-registers external tables
    over the existing files with a CREATE TABLE ... CLUSTERED BY ...
    LOCATION DDL, which is metadata-only. This is precisely bucketing's
    production contract: the layout outlives the session that wrote it."""
    import hashlib
    import shutil
    import uuid

    from iceberg_examples_spark.checkpointing import index_root

    paths = {}
    for tbl, cols, key in (
        ("lineitem", ["l_orderkey", "l_quantity"], "l_orderkey"),
        ("orders", ["o_orderkey", "o_orderstatus", "o_totalprice"], "o_orderkey"),
    ):
        src = os.path.join(sf_dir, f"{tbl}.parquet")
        st = os.stat(src)
        k = hashlib.md5(
            f"bkt-v1:8:{key}:{src}:{st.st_mtime_ns}:{st.st_size}".encode()
        ).hexdigest()[:16]
        path = os.path.join(index_root(spark), f"bkt-{tbl}-{k}")
        if not os.path.exists(os.path.join(path, "_LAYOUT_OK")):
            tmp = f"{path}.build-{uuid.uuid4().hex}"
            tmp_name = f"ies_bkt_build_{uuid.uuid4().hex[:8]}"
            df = load_table(spark, sf_dir, tbl).select(*cols)
            df.write.bucketBy(8, key).sortBy(key).option(
                "path", tmp
            ).mode("overwrite").saveAsTable(tmp_name)
            spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")  # external: files stay
            open(os.path.join(tmp, "_LAYOUT_OK"), "w").close()
            try:
                os.rename(tmp, path)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner
        paths[tbl] = path
    return paths["lineitem"], paths["orders"]


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket co-location end-to-end — the 100 TB join strategy for
    recurring fact-fact joins: both tables are bucketed by the join key
    into the SAME bucket count (+ in-bucket sort), so the join plans as
    a SortMergeJoin with NO Exchange on either side — the shuffle was
    paid once at write time and amortizes over every subsequent join
    (Iceberg's bucket partition transform serves the same role; the
    engine test asserts the no-Exchange plan). Since round 6 the
    amortization is REAL, not simulated: the bucketed layout is a
    durable artifact (see _bucketed_tables_fixture) and each invocation
    only runs the metadata-only external CREATE TABLE + the join.
    Tables are registered with pid-unique names so concurrent processes
    and the vanilla driver session never collide. The oracle recomputes
    the joined aggregate from the raw tables, proving bucketed placement
    is content-neutral."""
    lpath, opath = _bucketed_tables_fixture(spark, sf_dir)
    pid = os.getpid()
    lname, oname = f"ies_bkt_lineitem_{pid}", f"ies_bkt_orders_{pid}"
    try:
        spark.sql(f"DROP TABLE IF EXISTS {lname}")
        spark.sql(f"DROP TABLE IF EXISTS {oname}")
        spark.sql(
            f"CREATE TABLE {lname} (l_orderkey BIGINT, l_quantity DOUBLE) "
            "USING PARQUET CLUSTERED BY (l_orderkey) "
            "SORTED BY (l_orderkey) INTO 8 BUCKETS "
            f"LOCATION '{lpath}'"
        )
        spark.sql(
            f"CREATE TABLE {oname} (o_orderkey BIGINT, "
            "o_orderstatus STRING, o_totalprice DOUBLE) "
            "USING PARQUET CLUSTERED BY (o_orderkey) "
            "SORTED BY (o_orderkey) INTO 8 BUCKETS "
            f"LOCATION '{opath}'"
        )
        # hint("merge"): at toy scale the planner would broadcast the small
        # side, hiding the point — force the SortMergeJoin that bucket
        # co-location makes Exchange-free (at 100 TB SMJ is what the
        # planner picks anyway; the hint is a no-op there)
        joined = spark.table(lname).hint("merge").join(
            spark.table(oname), F.col("l_orderkey") == F.col("o_orderkey")
        )
        result = joined.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(money_sum_sql("l_quantity", scale=100)).alias("sum_qty"),
        )
        # materialize the (3-row) result so the catalog entries can be
        # dropped before returning (external tables: files untouched)
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lname}")
        spark.sql(f"DROP TABLE IF EXISTS {oname}")


def _zorder_scaled_keys_spark(li: DataFrame) -> tuple[str, str]:
    """Range-scale (l_partkey, l_suppkey) into the 10-bit z domain:
    ``key * 1024 div (max_key + 1)`` — monotonic, so z-locality in the
    scaled plane IS locality in the raw keys. A modulo here would alias
    distant keys into the same cell and defeat min/max pruning the moment
    the key domain exceeds 1024. The two max() literals are planning-time
    stats (one tiny agg — the same class of metadata AQE collects;
    Iceberg/Delta z-ordering likewise reads column bounds before
    clustering)."""
    mx = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    ).collect()[0]
    return (
        f"cast((l_partkey * 1024) div {int(mx.mp) + 1} as int)",
        f"cast((l_suppkey * 1024) div {int(mx.ms) + 1} as int)",
    )


def zorder_sql_duckdb_scaled() -> str:
    """The identical scaled interleave for the DuckDB oracle; the key
    bounds come from inline scalar subqueries over the same table."""
    from iceberg_examples_spark.functions.zorder import zorder_sql_duckdb

    return zorder_sql_duckdb(
        "CAST(l_partkey * 1024 // ((SELECT max(l_partkey) FROM lineitem) + 1) AS INTEGER)",
        "CAST(l_suppkey * 1024 // ((SELECT max(l_suppkey) FROM lineitem) + 1) AS INTEGER)",
    )


def zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey): both
    keys range-scaled to 10 bits (`_zorder_scaled_keys_spark`),
    interleaved into a 20-bit z-value, rows summarized per 1024-wide
    z-cell. This is the sort key the layout helper ``write_zordered``
    uses; the declared query checks the interleave itself against the
    identical DuckDB expression (functions/zorder.py renders both from
    one template).

    Scale: computing z is a pure map (whole-stage codegen, no shuffle)
    after one tiny bounds agg; the one exchange is the cell rollup.
    Writing 100 TB z-sorted is a single repartitionByRange(z) +
    sortWithinPartitions(z) pass — after which predicates on EITHER key
    prune files via min/max stats."""
    from iceberg_examples_spark.functions.zorder import zorder_sql_spark

    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_sql_spark(*_zorder_scaled_keys_spark(li))
    return (
        li.withColumn("z", F.expr(z).cast("bigint"))
        .withColumn("z_cell", F.expr("z div 1024"))
        .groupBy("z_cell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
        )
    )


def write_zordered(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    n_files: int = 8,
) -> None:
    """Write lineitem z-sorted on (l_partkey, l_suppkey):
    repartitionByRange on z (contiguous z-ranges per file) +
    sortWithinPartitions(z). Each output file then covers a compact
    rectangle-ish region of the (partkey, suppkey) plane, so min/max file
    stats prune on both columns — measured by
    tests/test_engine.py::test_zorder_layout_locality."""
    from iceberg_examples_spark.functions.zorder import zorder_sql_spark

    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_sql_spark(*_zorder_scaled_keys_spark(li))
    (
        li.withColumn("z", F.expr(z).cast("bigint"))
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-fact join that Spark's runtime bloom-filter rewrite
    accelerates at scale: the filtered orders side (o_totalprice > 400000)
    is small; lineitem is huge. At 100 TB neither side broadcasts, so
    Catalyst injects `might_contain(bloom_filter_agg(o_orderkey), ...)`
    into the lineitem scan — rows that can't join are dropped BEFORE the
    shuffle, which is the whole win (the shuffle of the big side is the
    bottleneck, and most of it would be discarded by the join anyway).

    The session leaves the stock thresholds alone: at test scale Catalyst
    correctly prefers a broadcast join (no bloom needed);
    tests/test_engine.py::test_bloom_filter_injected proves the rewrite
    engages under cluster-scale conditions (broadcast off, scan threshold
    zeroed). Semantics are identical either way — one declared query, two
    physical strategies picked by size."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.expr(
                money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
            ).alias("revenue"),
        )
    )


DPP_QUARTER = "1996Q1"


def dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end-to-end — the star-join scan killer
    at 100 TB: the fact table is partitioned by ship_month, the dim's
    selective filter is on a NON-join column (quarter), so the set of
    surviving months exists only at runtime — static pruning can do
    nothing, and without DPP the fact scan reads every partition.
    Catalyst's DPP injects a dynamicpruning subquery into the fact scan
    (reusing the dim's broadcast), so only the three 1996Q1 month
    directories are read (tests/test_plans.py asserts the
    dynamicpruningexpression survives in the final plan).

    The dim is DERIVED (distinct months + computed quarter label) so the
    optimizer provably can't constant-fold the month set; the oracle
    replays the same join relationally from the raw table."""
    out = _partitioned_lineitem_fixture(spark, sf_dir)
    fact = spark.read.parquet(out)
    dim = (
        load_table(spark, sf_dir, "lineitem")
        .select(month("l_shipdate").alias("ship_month"))
        .distinct()
        .withColumn(
            "q",
            F.expr(
                "concat(substring(ship_month, 1, 4), 'Q', "
                "cast(ceil(cast(substring(ship_month, 6, 2) as int) / 3.0) "
                "as int))"
            ),
        )
    )
    sel = dim.filter(F.col("q") == DPP_QUARTER)
    return (
        fact.join(F.broadcast(sel), "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
            ).alias("revenue"),
        )
    )


BACKFILL_MONTH = "1996-03"


def dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition backfill via DYNAMIC partition overwrite — the
    lakehouse correction workflow: rewrite exactly the partitions the
    corrected frame contains, leaving every other partition's files
    untouched (static overwrite mode would truncate the whole table; at
    100 TB the difference is rewriting one day vs the archive).

    Scenario: lineitem lands partitioned by ship_month; one month's
    rows are then re-landed with a 10% discount correction using
    ``partitionOverwriteMode=dynamic``. Output: per-month rollup of the
    post-backfill table restricted to the backfilled month and its two
    calendar neighbors — proving the target month changed AND the
    neighbors kept their original bytes. The oracle computes the
    expected post-state relationally.

    The mutable table starts as a FILESYSTEM COPY of the shared
    partitioned fixture (this query overwrites a partition, so it can't
    read the shared artifact in place; copying ~80 small directories
    locally costs ~0.1 s vs ~0.8 s to re-write them through Spark —
    the corrected frame is then read straight off the copy, the real
    read-correct-rewrite backfill shape)."""
    import shutil

    out = scratch_dir(sf_dir, "backfill_lineitem", fresh=True)
    src = _partitioned_lineitem_fixture(spark, sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    shutil.copytree(src, out)

    # corrected rows are READ FROM THE SHARED ARTIFACT (same bytes as the
    # copy) — reading the copy itself would be a self-overwrite, which
    # Spark's file sink rejects
    corrected = (
        spark.read.parquet(src)
        .filter(F.col("ship_month") == BACKFILL_MONTH)
        .withColumn("l_discount", F.expr("round(l_discount + 0.10, 2)"))
    )
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        corrected.write.mode("overwrite").partitionBy("ship_month").parquet(
            out
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    back = spark.read.parquet(out).filter(
        F.col("ship_month").isin("1996-02", BACKFILL_MONTH, "1996-04")
    )
    return back.groupBy("ship_month").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(money_sum_sql("l_discount", scale=100)).alias("sum_discount"),
        F.expr(
            money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
        ).alias("revenue"),
    )


def partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level statistics harvest — the min/max/count table that
    powers file skipping and query planning (Iceberg keeps exactly this
    per data file in its manifests; engines prune with it before any
    scan). Computed here per partition of the month-partitioned fixture:
    key bounds, row count, exact revenue. One aggregate over the
    partitioned read (partition column comes free from the directory
    name — no data column read for the grouping key), and the oracle
    recomputes the same stats from the raw table, proving the
    partitioned layout preserves content."""
    out = _partitioned_lineitem_fixture(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
            F.expr(
                money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
            ).alias("revenue"),
        )
    )
