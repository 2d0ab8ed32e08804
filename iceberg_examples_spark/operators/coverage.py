"""Coverage operators: join-type surface (semi/anti/outer), scalar string
functions, snapshot time travel, and the parquet-metadata table surface —
the Spark-native analogue of Iceberg's ``#files``/``#snapshots`` metadata
tables (`IcebergHadoopTables.java:44-47`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import LocalTable, load_table, scratch_dir
from iceberg_examples_spark.functions.exact import money_sum_sql


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join == EXISTS: orders with at least one max-quantity
    lineitem. Catalyst short-circuits per key — no fact-side duplication."""
    orders = load_table(spark, sf_dir, "orders")
    big_items = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 49
    )
    return orders.join(
        big_items, orders.o_orderkey == big_items.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join == NOT EXISTS: customers with no HIGH-VALUE order
    (totalprice > 300k) — the same primitive the equality-delete upsert
    rides on (mutations.upsert_by_key). The build-side filter keeps the
    result non-trivially non-empty at every test SF (plain
    customers-without-orders is EMPTY at sf0.001/sf0.01, which made the
    driver attestation a rows=0 match — no evidence at all)."""
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null-aware aggregation: customer count per
    nation, including nations with zero customers (count of non-null keys)."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left_outer")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/conditional function surface: upper/lower/substring/
    concat/replace/length/LIKE/CASE/greatest — all JVM-side, codegen'd."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_name").like("%1%")).select(
        "c_custkey",
        F.upper("c_name").alias("u"),
        F.lower("c_name").alias("l"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tag"),
        F.expr("replace(c_name, '#', '-')").alias("rep"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.when(F.col("c_acctbal") > 0, F.lit("pos"))
        .otherwise(F.lit("nonpos"))
        .alias("bal_sign"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
    )


def time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning end-to-end (catalog.LocalTable): commit v0 =
    'F' orders, append v1 = 'O' orders, then read BOTH snapshots — the
    table-version surface of `IcebergJavaApiAppend.java:92-94` re-expressed.
    Output: one row per snapshot with its row count; the oracle recomputes
    both counts from the raw table."""
    t = LocalTable(spark, scratch_dir(sf_dir, "time_travel", fresh=True))
    orders = load_table(spark, sf_dir, "orders")
    t.overwrite(orders.filter(F.col("o_orderstatus") == "F"))
    base_version = t.current_version
    t.append(orders.filter(F.col("o_orderstatus") == "O"))
    v0 = t.read(version=base_version).count()
    v1 = t.read().count()
    return spark.createDataFrame(
        [(0, v0), (1, v1)], "version long, n_rows long"
    )


# Single source of truth for the metadata surface's data directory: the
# oracle must name a literal path for DuckDB's parquet_metadata(), so the
# Spark side pins the SAME directory regardless of ``sf_dir`` and the
# oracle renders its literals from this constant (oracles_ext imports it).
# Overridable for deployments where testdata lives elsewhere.
METADATA_SF_DIR = os.environ.get(
    "SPARK_GRAFT_METADATA_SF_DIR", "/root/testdata/sf0.01"
)


def metadata_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File/row-group metadata surface — the engine's ``#files`` metadata
    table (Iceberg surface: `IcebergHadoopTables.java:44-47`): row-group
    row counts and byte sizes straight from the parquet footers via
    pyarrow, no data read. Driver-side by design (metadata reads are
    manifest-sized, like Iceberg's).

    Reads ``METADATA_SF_DIR`` (not ``sf_dir``) so the Spark query and the
    oracle's parquet_metadata() literal always name the same files."""
    import pyarrow.parquet as pq

    fixed_dir = METADATA_SF_DIR
    rows = []
    for table in ["lineitem", "orders"]:
        md = pq.ParquetFile(os.path.join(fixed_dir, f"{table}.parquet")).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            rows.append((table, i, rg.num_rows, rg.total_byte_size))
    return spark.createDataFrame(
        rows,
        "table_name string, row_group_id long, num_rows long, total_byte_size long",
    )


def sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 — the reference's primary interface: a SQL string over catalog
    views (`spark.sql(...)`, e.g. IcebergSQLMerge.java:46). Registers the
    testdata views and runs the revenue-by-nation query as text; Catalyst
    produces the identical plan to the DataFrame formulation."""
    from iceberg_examples_spark.catalog import register_views

    register_views(spark, sf_dir, tables=["orders", "customer", "nation"])
    return spark.sql(f"""
        SELECT n_name,
               count(*) AS n_orders,
               {money_sum_sql('o_totalprice', scale=100)} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """)


def grouped_median_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF surface (applyInPandas): per-priority median order
    price computed in an Arrow-batched pandas function — the escape hatch
    for aggregates Catalyst lacks. numpy's interpolated median equals
    DuckDB's quantile_cont(0.5) bit-for-bit on the same doubles (same
    two-middle average), so this has a real oracle. One shuffle on the
    grouping key; each group fits a pandas frame (the applyInPandas
    contract — for giant groups use a two-phase sketch instead)."""
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders")

    def med(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "median_price": [float(pdf["o_totalprice"].median())],
                "n_orders": [len(pdf)],
            }
        )

    return orders.select("o_orderpriority", "o_totalprice").groupBy(
        "o_orderpriority"
    ).applyInPandas(
        med, schema="o_orderpriority string, median_price double, n_orders long"
    )


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-format source/sink coverage: write a projection as CSV, read
    it back with an explicit schema (never inferSchema at scale — it costs
    a full extra pass), aggregate. The oracle recomputes from the raw
    table, proving the CSV round-trip is lossless for these types."""
    out = scratch_dir(sf_dir, "csv_roundtrip")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    li.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "l_orderkey long, l_linenumber int, l_quantity double, l_returnflag string"
    ).option("header", True).csv(out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(money_sum_sql("l_quantity", scale=100)).alias("sum_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink coverage: columnar alternative format with the same
    pushdown/pruning contract as parquet."""
    out = scratch_dir(sf_dir, "orc_roundtrip")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out).filter(F.col("o_orderstatus") == "F")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(money_sum_sql("o_totalprice", scale=100)).alias("total"),
    )


def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink coverage — the data source Spark 4 absorbed from
    spark-xml (native in spark-sql; no extra jar, unlike spark-avro,
    which this environment cannot provide — see DESIGN.md). Write the
    supplier dimension as XML, read it back with an EXPLICIT schema (XML
    inference costs a full extra document-parse pass at scale, same rule
    as CSV/JSON), and aggregate. The oracle recomputes from the raw
    parquet, proving the XML round-trip is lossless for these types.
    Scale note: one XML document per row under a streaming tag parser —
    splittable across files but not within one (same contract as
    multiline JSON), so shard the write (here: Spark's task-per-partition
    file layout already does)."""
    out = scratch_dir(sf_dir, "xml_roundtrip")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    sup.write.mode("overwrite").format("xml").option("rootTag", "suppliers").option(
        "rowTag", "supplier"
    ).save(out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema("s_suppkey long, s_nationkey long, s_acctbal double")
        .load(out)
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.expr(money_sum_sql("s_acctbal", scale=100)).alias("total_bal"),
    )


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible sampling — the LLM-pipeline requirement rand() can't
    meet: membership must be a pure function of the row key so reruns,
    backfills, and other engines agree. Sample = rows whose md5-derived
    64-bit key hash lands in 1/10 of the space; works identically at any
    scale and in DuckDB (same md5 → same membership)."""
    from iceberg_examples_spark.functions.texthash import md5_int_hash

    orders = load_table(spark, sf_dir, "orders")
    h = md5_int_hash("cast(o_orderkey as string)")
    sampled = orders.filter(F.expr(f"({h}) % 10 = 0"))
    return sampled.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


FIXED_SAMPLE_K = 200


def fixed_size_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-size deterministic sample — the eval-set/holdout requirement
    rate-based sampling can't meet (a 1/10 hash filter yields ~N/10 ± √N
    rows; an eval set must be exactly K). Sample = the K docs with the
    smallest md5-derived hash (doc_id tiebreak): order statistics over a
    pure key function, so reruns, engines, and backfills agree row-for-row
    AND the size is exact.

    Plan: TakeOrderedAndProject — each partition keeps a local top-K heap
    and the driver merges P·K candidate rows, never a global sort; at
    100 TB that's the only correct-and-cheap shape for small K. Output is
    the sample membership itself (doc_id, lang, rank_hash)."""
    from iceberg_examples_spark.functions.texthash import md5_int_hash

    docs = load_table(spark, sf_dir, "documents")
    h = md5_int_hash("cast(doc_id as string)")
    return (
        docs.select("doc_id", "lang", F.expr(h).alias("rank_hash"))
        .orderBy("rank_hash", "doc_id")
        .limit(FIXED_SAMPLE_K)
    )


def incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance over the snapshot changelog: a
    materialized per-priority aggregate of a LocalTable is maintained
    across two append commits by reading ONLY each commit's delta
    (`LocalTable.changes`) — never rescanning the base table — and
    merging the delta aggregate in with a full-outer coalesce-add. The
    lakehouse incremental-pipeline pattern (Iceberg incremental reads /
    streaming-table CDF consumption).

    Exactness: the maintained state keeps money as scaled BIGINT, so
    incremental addition is associative and the final state is
    bit-identical to the full recompute — which is precisely what the
    oracle checks (it aggregates the complete orders table directly).

    Cost honesty: the MAINTENANCE ARITHMETIC (delta aggregate + view
    merge) is O(|delta| + |view|); the changelog extraction here rides
    LocalTable.changes, whose exceptAll-of-snapshots demo implementation
    is O(|table|). A production deployment swaps that layer for a real
    O(|delta|) changelog (Iceberg incremental scan / Delta CDF) — the
    maintenance algebra above it is exactly this code."""
    t = LocalTable(spark, scratch_dir(sf_dir, "ivm", fresh=True))
    orders = load_table(spark, sf_dir, "orders")

    def agg_scaled(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint)")
            ).alias("total_scaled"),
        )

    t.create(orders.filter(F.year("o_orderdate") < 1997))
    view = agg_scaled(t.read())
    for batch in [
        orders.filter(F.year("o_orderdate") == 1997),
        orders.filter(F.year("o_orderdate") >= 1998),
    ]:
        v_before = t.current_version
        t.append(batch)
        delta = t.changes(v_before, t.current_version)
        d = agg_scaled(delta)
        view = (
            view.alias("m")
            .join(d.alias("d"), on="o_orderpriority", how="full_outer")
            .select(
                "o_orderpriority",
                (
                    F.coalesce(F.col("m.n_orders"), F.lit(0))
                    + F.coalesce(F.col("d.n_orders"), F.lit(0))
                ).alias("n_orders"),
                (
                    F.coalesce(F.col("m.total_scaled"), F.lit(0))
                    + F.coalesce(F.col("d.total_scaled"), F.lit(0))
                ).alias("total_scaled"),
            )
        )
    return view.select(
        "o_orderpriority",
        "n_orders",
        (F.col("total_scaled").cast("double") / 100.0).alias("total_value"),
    )


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/validation split over documents —
    the LLM-pipeline staple deterministic_sample generalizes to: split
    membership is a pure function of the doc key (md5-derived hash mod
    100: <90 train, else val), so reruns, backfills, and other engines
    produce the identical split, and the per-language stratification can
    be audited (the output: per (lang, split) doc count + hash-sum
    fingerprint of member ids).

    At scale: a pure map + one tiny aggregation; no shuffle of the
    corpus itself (membership never needs a global pass)."""
    from iceberg_examples_spark.functions.texthash import train_val_split_sql

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", F.expr(train_val_split_sql("doc_id")))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr("cast(doc_id as bigint)")).alias("id_sum"),
        )
    )


def recursive_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate the complete
    month spine between the first and last order date, then left-join
    per-month order counts — the gap-filling time-series pattern a plain
    GROUP BY can't produce (months with zero orders appear with 0). The
    recursion is bounds-driven (anchor/termination from the data, no
    hardcoded calendar); DuckDB runs the same recursive SQL.

    Scale: the spine is O(months) rows on the driver-side of the plan —
    trivially small; the one real cost is the per-month aggregate."""
    from iceberg_examples_spark.catalog import register_views

    register_views(spark, sf_dir, tables=["orders"])
    return spark.sql("""
        WITH RECURSIVE bounds AS (
          SELECT date_trunc('month', min(o_orderdate)) AS lo,
                 date_trunc('month', max(o_orderdate)) AS hi
          FROM orders
        ),
        months(m) AS (
          SELECT lo FROM bounds
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months, bounds WHERE m < hi
        ),
        per_month AS (
          SELECT date_trunc('month', o_orderdate) AS m2, count(*) AS n
          FROM orders GROUP BY 1
        )
        SELECT CAST(months.m AS DATE) AS month_start,
               CAST(coalesce(per_month.n, 0) AS BIGINT) AS n_orders
        FROM months LEFT JOIN per_month ON months.m = per_month.m2
    """)


def variant_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT type (Spark 4): parse_json into the binary semi-structured
    type, typed extraction with variant_get — the modern engine answer to
    schemaless columns (shredded storage, no per-query string parsing;
    from_json/get_json_object are the schema-full/string cousins)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.countDistinct("k").alias("n_distinct_k"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate — the admission checks a lakehouse runs before
    promoting a batch (null keys, domain violations, FK orphans,
    duplicate primary keys), here over a deterministically CORRUPTED
    copy of ``orders`` so every check has planted positives and the
    oracle verifies exact violation sets, not just zeros:

    - ``o_orderkey % 97 == 0``  → customer key shifted +10^9 (FK orphan)
    - ``o_orderkey % 89 == 0``  → total price negated (domain violation)
    - ``o_orderkey % 83 == 0``  → order priority nulled (null check)
    - ``o_orderkey % 101 == 0`` → row duplicated (PK uniqueness)

    Output: one row per check with violation count and key-sum
    fingerprint. Plan: the corrupted batch is staged once (map-only
    derivation + one duplicate union), then each check is a narrow
    aggregate — the FK check is a broadcast-friendly anti-join against
    the customer keys, the PK check a count>1 aggregate on the key
    column; nothing shuffles more than (key, flag) pairs at any scale."""
    from iceberg_examples_spark.checkpointing import stage

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    corrupted = orders.selectExpr(
        "o_orderkey",
        "case when o_orderkey % 97 = 0 then o_custkey + 1000000000 "
        "else o_custkey end as o_custkey",
        "case when o_orderkey % 89 = 0 then -o_totalprice "
        "else o_totalprice end as o_totalprice",
        "case when o_orderkey % 83 = 0 then cast(null as string) "
        "else o_orderpriority end as o_orderpriority",
    ).unionByName(
        orders.filter("o_orderkey % 101 = 0")
    )
    batch = stage(corrupted, "dq-batch")

    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphans = batch.join(
        cust_keys, batch.o_custkey == cust_keys.c_custkey, "left_anti"
    ).agg(
        F.lit("fk_orphan").alias("check"),
        F.count(F.lit(1)).alias("n_violations"),
        F.sum("o_orderkey").alias("key_sum"),
    )
    negative = batch.filter("o_totalprice < 0").agg(
        F.lit("negative_price").alias("check"),
        F.count(F.lit(1)).alias("n_violations"),
        F.sum("o_orderkey").alias("key_sum"),
    )
    nulls = batch.filter("o_orderpriority is null").agg(
        F.lit("null_priority").alias("check"),
        F.count(F.lit(1)).alias("n_violations"),
        F.sum("o_orderkey").alias("key_sum"),
    )
    dups = (
        batch.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n > 1")
        .agg(
            F.lit("dup_key").alias("check"),
            F.count(F.lit(1)).alias("n_violations"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )
    return orphans.unionByName(negative).unionByName(nulls).unionByName(dups)


def observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-cost pipeline instrumentation via ``DataFrame.observe``: the
    quality-gate job over lineitem runs ONCE, and its audit metrics (rows
    seen, rows kept, exact scaled revenue kept) ride the same job as
    accumulator-style observations — no second scan, which is the entire
    value at 100 TB (the naive audit re-aggregates the input; this costs
    nothing beyond the job you were running anyway).

    The observation payload comes back as driver-side scalars (that is
    the mechanism — Spark's QueryExecutionListener path), re-lifted into
    a one-row frame; the oracle recomputes the same three aggregates
    relationally, pinning both the kept-side write-out AND the observed
    metrics to the exact integer arithmetic."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("gate-audit")
    gated = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_seen"),
        F.sum(
            F.expr("case when l_quantity < 30 then 1 else 0 end")
        ).alias("n_kept"),
        F.sum(
            F.expr(
                "case when l_quantity < 30 then "
                "cast(round(l_extendedprice * 100) as bigint) else 0 end"
            )
        ).alias("kept_cents"),
    ).filter(F.col("l_quantity") < 30)
    # the action that would exist anyway (the gate's write-out, here a
    # count); observation scalars are then available without re-scan
    n_out = gated.count()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_seen"], m["n_kept"], int(n_out), m["kept_cents"])],
        "n_seen bigint, n_kept bigint, n_written bigint, kept_cents bigint",
    )


def sql_pipe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's ``|>`` operator chaining — SIGMOD'24
    "SQL Has Problems" Google pipe-syntax proposal, adopted upstream):
    the same declarative plan as a nested SELECT, written as a linear
    stage chain. Catalyst sees identical logical operators — this query
    asserts the surface exists and optimizes normally (the oracle is the
    classic ANSI spelling of the same aggregation).

    Exact-arithmetic discipline as everywhere: revenue summed as scaled
    BIGINT inside the pipe AGGREGATE stage."""
    for t in ("lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> AGGREGATE count(*) AS n_items,
                     sum(cast(round(l_extendedprice * 100) as bigint))
                       AS revenue_cents
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_items > 0
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the
    dimension-lookup edge case where NULL is a real key value (unknown
    category) that must match the dimension's NULL row — a plain
    equi-join silently drops those rows. Fact side: orders with every
    7th key's priority NULLed; dim side: the distinct priorities plus an
    explicit NULL member. One hash join on the null-safe predicate
    (Spark executes `<=>` as a hash join key, not a nested loop), then a
    per-dim-member count — the oracle's IS NOT DISTINCT FROM twin pins
    NULL↔NULL matching exactly."""
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select(
        "o_orderkey",
        F.expr(
            "case when o_orderkey % 7 = 0 then cast(null as string) "
            "else o_orderpriority end"
        ).alias("prio"),
    )
    dim = (
        orders.select(F.col("o_orderpriority").alias("d_prio"))
        .distinct()
        .unionByName(
            spark.range(1).select(
                F.lit(None).cast("string").alias("d_prio")
            )
        )
        .withColumn(
            "prio_label", F.coalesce(F.col("d_prio"), F.lit("UNKNOWN"))
        )
    )
    return (
        fact.join(
            F.broadcast(dim), fact["prio"].eqNullSafe(dim["d_prio"])
        )
        .groupBy("prio_label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


def union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union (`unionByName(allowMissingColumns)`):
    the multi-source ingestion staple — two extracts of the same entity
    with different column sets combine by NAME, absent columns
    null-filled, never by position (positional UNION silently pairs
    wrong columns when sources evolve independently). Here: an old
    extract (key, price) and a new extract (key, priority, clerk) of
    disjoint order ranges; the oracle spells the same thing as UNION ALL
    with explicit NULL literals — which is exactly the plan Spark
    builds, so this is surface coverage with a semantics pin."""
    orders = load_table(spark, sf_dir, "orders")
    old_extract = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
            "price_cents"
        ),
    )
    new_extract = orders.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    )
    return old_extract.unionByName(new_extract, allowMissingColumns=True)


def merge_schema_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema-evolution read (`mergeSchema`): two file
    generations of one dataset — generation 0 (key, price) and
    generation 1 with an added column (key, price, priority) — live in
    one directory; reading with ``mergeSchema=true`` reconciles the
    union schema and null-fills the old files' missing column. This is
    the file-level half of schema evolution (the table-format half is
    `schema_evolution`'s ADD/DROP COLUMN): at scale, footer
    reconciliation is a distributed job over file footers, which is why
    it's opt-in — and why the read-side contract deserves its own pin.
    The oracle replays both generations with explicit NULLs."""
    import os

    from iceberg_examples_spark.catalog import scratch_dir

    out = scratch_dir(sf_dir, "merge_schema", fresh=True)
    orders = load_table(spark, sf_dir, "orders")
    gen0 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
            "price_cents"
        ),
    )
    gen1 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
            "price_cents"
        ),
        F.col("o_orderpriority").alias("priority"),
    )
    gen0.write.parquet(os.path.join(out, "gen=0"))
    gen1.write.parquet(os.path.join(out, "gen=1"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=0"), os.path.join(out, "gen=1")
    )
    return merged.groupBy(
        F.expr("priority is null").alias("is_old_gen")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price_cents").alias("total_cents"),
        F.sum("o_orderkey").alias("key_sum"),
    )


K_ANON = 5


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the training-data
    governance gate: before a customer extract ships, every
    quasi-identifier combination (here nation × market segment) must
    cover at least K_ANON individuals, else those rows re-identify.
    Output: one row per ANONYMITY CLASS SIZE BUCKET (the k-distribution)
    plus the suppression summary the release decision needs — how many
    classes and rows fall below k. Map-side combinable aggregate over
    narrow keys; at 100 TB this is one shuffle of the quasi-identifier
    tuple, and the class-size histogram is how real releases are
    audited (classes, not rows, are the unit of risk)."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    return (
        classes.groupBy(
            F.expr(f"class_size >= {K_ANON}").alias("is_anonymous"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
            F.min("class_size").alias("min_class"),
            F.max("class_size").alias("max_class"),
        )
    )


AGG_TOP_NAMES = 5


def ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string aggregation — report/export cells
    ("first five customers per nation, alphabetical, comma-joined").
    collect_list alone is shuffle-order-nondeterministic, the classic
    flaky-report bug; sorting INSIDE the aggregate expression
    (array_sort before slice/join) pins the result on any partitioning.
    The oracle's ORDER BY-qualified list aggregation must agree
    byte-for-byte."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr(
            f"array_join(slice(array_sort(collect_list(c_name)), 1, "
            f"{AGG_TOP_NAMES}), ',')"
        ).alias("first_names"),
    )


def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent market segment
    per nation, ties broken alphabetically. Built as count + window
    argmax rather than the engine's ``mode()`` aggregate, whose tie
    behavior is expressly non-deterministic in both engines — the same
    reason rand() sampling is banned here: a report that changes between
    identical runs is a defect, not a statistic."""
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("cnt"), F.asc("c_mktsegment")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_nationkey",
            F.col("c_mktsegment").alias("modal_segment"),
            "cnt",
        )
    )


def nested_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data round trip (the Dremel shape: repeated records inside
    a row): lineitems are NESTED into their order as an
    ``array<struct>`` column — the denormalized layout columnar formats
    serve directly — then re-exploded and aggregated; matching the flat
    relational aggregate proves collect→nest→unnest loses nothing.
    Output per order-priority: orders, nested item count, exact item
    revenue recomputed FROM THE NESTED COLUMN (inline explode), plus the
    max per-order item count (the fan-out statistic that sizes repeated
    fields). The nesting aggregate sorts items in-array by linenumber so
    the structure is deterministic, not shuffle-ordered."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "cast(round(l_extendedprice * (1 - l_discount) * 10000) "
            "as bigint)"
        ).alias("rev_fp"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    nested = (
        li.groupBy("l_orderkey")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(l_linenumber, rev_fp)), "
                "(a, b) -> case when a.l_linenumber < b.l_linenumber "
                "then -1 when a.l_linenumber > b.l_linenumber then 1 "
                "else 0 end)"
            ).alias("items")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return nested.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.expr("size(items)")).alias("n_items"),
        F.max(F.expr("size(items)")).alias("max_items_per_order"),
        F.expr(
            "cast(sum(aggregate(items, 0L, (acc, x) -> acc + x.rev_fp)) "
            "as double) / 10000.0"
        ).alias("revenue"),
    )
