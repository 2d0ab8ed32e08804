"""Distributed k-means as pure relational algebra (the IVF coarse
quantizer the similarity-search scale path needs — DESIGN.md round-2
agenda item).

The textbook Spark k-means collects centroids to the driver each round and
broadcasts them back. This implementation never materializes anything on
the driver: vectors are exploded to long form (vec_id, dim, value) and
each Lloyd iteration is a join + two aggregations —

    assign:  e >< centroids on dim  -> sum of squared diffs per (vec, cid)
             -> row_number window picks the nearest cid (ties -> lowest)
    update:  e >< assignment on vec_id -> per-(cid, dim) mean

so the whole NITER-round fit is ONE lazy Catalyst plan. The centroid
relation is k x dims rows (512 here) — every join against it is a
broadcast at any scale; the big sides shuffle once per round on vec_id.

Exactness (the reason this can be hash-checked against DuckDB, where a
float k-means never could): values are scaled to integers
(round(val * 1e6)), distances are BIGINT sums of squared integer diffs
(associative — shuffle-order-proof), and centroid updates floor an
exact double division of integer sum by count. Every comparison both
engines make is over bit-identical values, so the full clustering —
assignments, centroids, inertia — is deterministic cross-engine.
`oracle_kmeans_sql()` renders the SAME iteration chain as DuckDB CTEs
from one template, so the two sides cannot drift.

Init: the K lowest vec_ids seed the centroids (deterministic, no RNG —
`Math.random` is banned from declared queries by the resume contract).
Empty clusters drop out of the centroid relation and stay dropped —
identically on both sides.

At 100 TB: long-form e is rows x dims — explode once, cache/checkpoint it,
and the per-round cost is a broadcast join + partial-agg shuffle keyed on
vec_id; no stage depends on |clusters| fitting anywhere but a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table

K = 8
NITER = 3
SCALE = 1_000_000
DIMS = 64


def _long_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "val")
    ).select(
        "vec_id",
        "d",
        F.round(F.col("val").cast("double") * SCALE)
        .cast("bigint")
        .alias("v"),
    )


def _assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    diff = F.col("v") - F.col("c")
    d2 = (
        e.join(F.broadcast(cent), on="d")
        .groupBy("vec_id", "cid")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "dist")
    )


def _update(e: DataFrame, assign: DataFrame) -> DataFrame:
    return (
        e.join(assign.select("vec_id", "cid"), on="vec_id")
        .groupBy("cid", "d")
        .agg(
            F.floor(
                F.sum("v").cast("double") / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("c")
        )
    )


def _final_assignment(e: DataFrame) -> DataFrame:
    """NITER Lloyd rounds; returns the last (vec_id, cid, dist)."""
    cent = (
        e.filter(F.col("vec_id") < K)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            "d",
            F.col("v").alias("c"),
        )
    )
    assign = None
    for i in range(NITER):
        assign = _assign(e, cent)
        if i < NITER - 1:
            cent = _update(e, assign)
    return assign


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NITER Lloyd rounds over the embeddings table; returns per-cluster
    size and exact integer inertia under the final assignment."""
    e = _long_form(spark, sf_dir)
    assign = _final_assignment(e)
    return assign.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("dist").alias("inertia"),
    )


N_QUERIES = 3
TOP_K = 5


def knn_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over the k-means cells: each query (vec_id < N_QUERIES)
    scores ONLY the vectors assigned to its own final cluster — the
    learned-quantizer upgrade of `knn_cosine_ivf` (which prunes by the
    dataset's given label). Cosine from exact integer dot products and
    norms, so ranking is bit-identical cross-engine; top-TOP_K per query
    with (cosine DESC, neighbor_id) tie-break.

    At scale: assignment is the k-means plan (amortized — persist it);
    the search is an equi-join on cid (1/|cells| of the pairs a
    cross-join would score) + one vec-pair aggregation."""
    e = _long_form(spark, sf_dir)
    a = _final_assignment(e)
    norms = e.groupBy("vec_id").agg(
        F.sum(F.col("v") * F.col("v")).alias("nrm")
    )
    qa = a.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "cid"
    )
    xa = a.select(F.col("vec_id").alias("neighbor_id"), "cid")
    cand = (
        qa.join(xa, on="cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    eq = e.select(
        F.col("vec_id").alias("query_id"), "d", F.col("v").alias("vq")
    )
    ex = e.select(
        F.col("vec_id").alias("neighbor_id"), "d", F.col("v").alias("vx")
    )
    dots = (
        cand.join(eq, on="query_id")
        .join(ex, on=["neighbor_id", "d"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("vq") * F.col("vx")).alias("dot"))
    )
    nq = norms.select(
        F.col("vec_id").alias("query_id"), F.col("nrm").alias("nq")
    )
    nx = norms.select(
        F.col("vec_id").alias("neighbor_id"), F.col("nrm").alias("nx")
    )
    scored = (
        dots.join(nq, on="query_id")
        .join(nx, on="neighbor_id")
        .withColumn(
            "cosine",
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("nq").cast("double"))
                * F.sqrt(F.col("nx").cast("double"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _chain_ctes() -> list[str]:
    """The Lloyd-iteration chain as DuckDB CTEs (rendered, not
    hand-written, so Spark and oracle share one definition)."""
    ctes = [
        f"""e AS (
  SELECT vec_id, r.range AS d,
         CAST(round(CAST(embedding[r.range + 1] AS DOUBLE) * {SCALE})
              AS BIGINT) AS v
  FROM embeddings, range({DIMS}) r
)""",
        f"""c0 AS (
  SELECT CAST(vec_id AS INTEGER) AS cid, d, v AS c
  FROM e WHERE vec_id < {K}
)""",
    ]
    for i in range(1, NITER + 1):
        prev = f"c{i - 1}"
        ctes.append(f"""d{i} AS (
  SELECT e.vec_id, c.cid,
         CAST(sum((e.v - c.c) * (e.v - c.c)) AS BIGINT) AS dist
  FROM e JOIN {prev} c ON e.d = c.d
  GROUP BY e.vec_id, c.cid
)""")
        ctes.append(f"""a{i} AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cid ASC) AS rn
    FROM d{i}) t
  WHERE rn = 1
)""")
        if i < NITER:
            ctes.append(f"""c{i} AS (
  SELECT a.cid, e.d,
         CAST(floor(CAST(sum(e.v) AS DOUBLE) / count(*)) AS BIGINT) AS c
  FROM e JOIN a{i} a ON e.vec_id = a.vec_id
  GROUP BY a.cid, e.d
)""")
    return ctes


def oracle_kmeans_sql() -> str:
    body = ",\n".join(_chain_ctes())
    return f"""WITH {body}
SELECT cid AS cluster_id, count(*) AS n_points,
       CAST(sum(dist) AS BIGINT) AS inertia
FROM a{NITER} GROUP BY cid
"""


def oracle_knn_kmeans_sql() -> str:
    """IVF search over the same chain: candidates share the query's final
    cell; exact integer dots/norms -> bit-identical cosine ranking."""
    extra = [
        """norms AS (
  SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS nrm FROM e GROUP BY vec_id
)""",
        f"""cand AS (
  SELECT qa.vec_id AS query_id, xa.vec_id AS neighbor_id
  FROM a{NITER} qa JOIN a{NITER} xa ON qa.cid = xa.cid
  WHERE qa.vec_id < {N_QUERIES} AND xa.vec_id <> qa.vec_id
)""",
        """dots AS (
  SELECT c.query_id, c.neighbor_id, CAST(sum(eq.v * ex.v) AS BIGINT) AS dot
  FROM cand c
  JOIN e eq ON eq.vec_id = c.query_id
  JOIN e ex ON ex.vec_id = c.neighbor_id AND ex.d = eq.d
  GROUP BY 1, 2
)""",
        """scored AS (
  SELECT d.query_id, d.neighbor_id,
         CAST(d.dot AS DOUBLE)
           / (sqrt(CAST(nq.nrm AS DOUBLE)) * sqrt(CAST(nx.nrm AS DOUBLE)))
           AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nx ON nx.vec_id = d.neighbor_id
)""",
    ]
    body = ",\n".join(_chain_ctes() + extra)
    return f"""WITH {body}
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT scored.*,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
  FROM scored) t
WHERE rnk <= {TOP_K}
"""
