"""Pure relational query operators (SURVEY.md §2.1-2.6).

Every builder takes ``(spark, sf_dir)`` and returns a lazily-planned
DataFrame over the driver testdata. All of these compile to stock Catalyst
plans — scans with pushed filters/pruned columns, whole-stage-codegen'd
projections, hash aggregates with partial (map-side) combine, and joins
whose physical strategy (broadcast vs sort-merge) Catalyst/AQE picks from
actual sizes. Nothing here needs custom execution; the engineering is in
expressing each op so the optimizer can do its job:

- filters before joins (pushdown), explicit column selection (pruning),
- broadcast hints only for genuinely-small dimension sides,
- deterministic tie-breaks on every top-k so results are reproducible,
- exact integer accumulation for money sums (functions/exact.py) so the
  result is shuffle-order-independent — at 1000 executors a plain
  sum(double) is not even self-consistent between runs.

Reference parity notes cite the file:line of the op being re-expressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table
from iceberg_examples_spark.functions.exact import (
    money_avg_sql,
    money_sum_sql,
)


# ---- scans / projections (S2, P1, P2) ----------------------------------

def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * catalog-table scan — reference `IcebergSQLMerge.java:27`,
    `IcebergJavaApiAppend.java:67`."""
    return load_table(spark, sf_dir, "nation")


def project_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal/aliased projection — reference `IcebergSQLMerge.java:32`
    (`SELECT 3 as customer_id, ... as name`)."""
    return spark.range(1).select(
        F.lit(3).cast("bigint").alias("customer_id"),
        F.lit("customer_c-insert(with merge sql)").alias("name"),
        F.lit("lastname-3-insert(with merge sql)").alias("lastname"),
    )


# ---- filters (P4) -------------------------------------------------------

def filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive equality predicate — reference `IcebergSQLDelete.java:32`
    (`WHERE customer_id=1 AND name='...'`), here over lineitem so the
    predicate demonstrably pushes to the parquet scan (check
    `.explain`: PushedFilters [EqualTo(l_returnflag,R), ...])."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# ---- joins (J1) ---------------------------------------------------------

def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + residual filter — reference `IcebergSCD2.java:57-58`
    (`stg INNER JOIN dim ON key AND dim.current = true`). Re-expressed on
    the star schema: orders ⋈ customer restricted to one segment. The
    dimension side (customer, filtered) is small relative to facts —
    Catalyst broadcasts it under AQE; no hint needed at sf, and at 100 TB
    the same plan holds while customer stays under the broadcast threshold.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice", "o_orderstatus"
    )


# ---- set ops (U1) -------------------------------------------------------

def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional UNION ALL of heterogeneous sources — reference
    `IcebergSQLMerge.java:32-35` (literal ∪ literal) and
    `IcebergSCD2.java:54-58` (literal-select ∪ join result). Here: customer
    names ∪ supplier names with a tag column."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("side"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return cust.union(supp)


# ---- sorts / limits (T1, T2) -------------------------------------------

def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column global sort — reference `IcebergSCD2.java:47`
    (`orderBy("customer_id","effective_date")`). Global sort = range
    shuffle; at scale prefer sortWithinPartitions unless a total order is
    genuinely required."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    )


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k — reference `show()` = implicit limit (`IcebergSQLMerge.java:27`).
    orderBy+limit compiles to TakeOrderedAndProject: per-partition heap then
    driver-side merge of k rows — no global sort, scales to any input size.
    Tie-break on o_orderkey for determinism."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---- aggregations (§2.4 thin wrappers + TPC-H-style headliners) ---------

def agg_sum_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation: partial (map-side) hash agg →
    shuffle on the 2 low-cardinality keys → final hash agg. Money sums use
    exact integer accumulation (functions/exact.py) so the value is
    identical regardless of partitioning/AQE order."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(money_sum_sql("l_quantity", scale=100)).alias("sum_qty"),
        F.expr(money_sum_sql("l_extendedprice", scale=100)).alias("sum_base_price"),
        F.expr(
            money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
        ).alias("sum_disc_price"),
        F.expr(money_avg_sql("l_discount", scale=100)).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + approximate distinct counts per group. countDistinct expands
    to a two-phase aggregate; approx_count_distinct is a HyperLogLog++
    sketch (constant memory — the 100 TB answer when 2% error is fine).
    The approx column is excluded from oracle queries (engine-specific
    sketch), so this query exposes only exact values."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped selective-scan aggregate: every predicate pushes to
    parquet (row-group skipping via min/max stats — the reference gets the
    same effect from Iceberg manifest metrics, `IcebergJavaApiAppend.java:88-89`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(money_sum_sql("l_extendedprice * l_discount", scale=10000)).alias(
                "revenue"
            )
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + grouped agg + top-k. Join order:
    filter both sides first, join facts on the shuffled key, customer side
    broadcast. TakeOrderedAndProject caps the result at 10 rows."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.expr(
                money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way star join: facts shuffle-join on keys; the
    region→nation→supplier dimension chain is broadcast (each side tiny).
    Demonstrates multi-hop dimension pruning — the region filter prunes
    nations before the fact join ever happens."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nations_in_region = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nations_in_region),
            supp.s_nationkey == nations_in_region.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.expr(
                money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
            ).alias("revenue")
        )
    )


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: order counts by priority where EXISTS a slow lineitem
    (shipped >60 days after order) — semi join + aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    slow = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == orders.o_orderkey,
    ).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey")
    return (
        orders.join(slow, orders.o_orderkey == slow.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: shipping volume between two nation pairs by year —
    double dimension hop (supplier nation × customer nation), year
    extraction, grouped exact revenue."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.expr(
                money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
            ).alias("revenue")
        )
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped: conditional counts — high/low priority order splits for
    lineitems shipped in one year, by linestatus (CASE inside SUM)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("bigint")
    return joined.groupBy("l_linestatus").agg(
        F.sum(high).alias("high_line_count"),
        F.sum(1 - high).alias("low_line_count"),
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: promo revenue ratio — two exact integer-accumulated sums
    and one deterministic trailing division (ratio of exact doubles)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.expr(money_sum_sql(
                "case when p_type like 'PROMO%' then l_extendedprice * (1 - l_discount) else 0.0 end",
                scale=10000,
            ))
            / F.expr(money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000))
        ).alias("promo_revenue_pct")
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: large-volume orders — grouped HAVING subquery feeding a
    customer join; top-20 by total quantity with key tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr(money_sum_sql("l_quantity", scale=100)).alias("total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped: OR-of-ANDs predicate (brand × size-band × quantity-band)
    — the disjunctive-pushdown shape; Catalyst splits the common join key
    out and pushes the residual disjunction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 30)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 50)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return joined.filter(cond).agg(
        F.expr(
            money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: returned-item revenue by customer — 4-way join with a
    selective returnflag filter, grouped exact revenue, top-20."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.expr(
                money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped: top supplier(s) by quarterly revenue — a grouped
    subquery whose MAX feeds an equality filter back onto itself (the
    classic revenue-view pattern). The revenue subquery is computed once
    and reused via self-join against its own max."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.expr(
            money_sum_sql("l_extendedprice * (1 - l_discount)", scale=10000)
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (
        revenue.join(
            F.broadcast(max_rev),
            revenue.total_revenue == max_rev.mr,
        )
        .join(supp, revenue.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )
