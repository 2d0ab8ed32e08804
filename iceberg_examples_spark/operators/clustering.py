"""Distributed k-means as pure relational algebra (the IVF coarse
quantizer the similarity-search scale path needs — DESIGN.md round-2
agenda item).

Two equivalent paths, cross-checked against ONE oracle:

1. **Relational baseline** (`kmeans_clusters`, and the chain the DuckDB
   oracle unrolls): never materializes anything on the driver — vectors
   are exploded to long form (vec_id, dim, value) and each Lloyd
   iteration is a join + two aggregations.
2. **Vectorized hot path** (`kmeans_large`): Arrow-batched numpy assign
   over a driver-broadcast codebook (kilobytes of model state — the
   MLlib iteration pattern), avoiding the k-fold join blowup; same
   int64 arithmetic, hash-matched to the same oracle.

The baseline iteration —

    assign:  e >< centroids on dim  -> sum of squared diffs per (vec, cid)
             -> row_number window picks the nearest cid (ties -> lowest)
    update:  e >< assignment on vec_id -> per-(cid, dim) mean

so the whole NITER-round fit is one declarative plan (the rollup
entry materializes the exploded relation once via localCheckpoint —
a deliberate staging write, not a driver hop). The centroid
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
from iceberg_examples_spark.checkpointing import stage

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


def _final_assignment(
    e: DataFrame, k: int = K, niter: int = NITER
) -> DataFrame:
    """niter Lloyd rounds; returns the last (vec_id, cid, dist)."""
    cent = (
        e.filter(F.col("vec_id") < k)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            "d",
            F.col("v").alias("c"),
        )
    )
    assign = None
    for i in range(niter):
        assign = _assign(e, cent)
        if i < niter - 1:
            # stage the round's centroid relation (k x dims rows): keeps
            # the next round's plan flat instead of nesting the whole
            # prior iteration chain under the broadcast side
            cent = stage(_update(e, assign), f"kmeans-cent-r{i}")
    return assign


def _kmeans_rollup(
    spark: SparkSession, sf_dir: str, k: int, niter: int
) -> DataFrame:
    # materialize the exploded relation once: every round's assign AND
    # update branch reads e, so an unmaterialized lineage re-runs the
    # explode+scale 2*niter times (checkpointing.stage: a reliable
    # staging write when configured — the docstring's contract)
    e = stage(_long_form(spark, sf_dir), "kmeans-long-form")
    assign = _final_assignment(e, k=k, niter=niter)
    return assign.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("dist").alias("inertia"),
    )


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NITER Lloyd rounds over the embeddings table; returns per-cluster
    size and exact integer inertia under the final assignment."""
    return _kmeans_rollup(spark, sf_dir, k=K, niter=NITER)


K_LARGE = 64
NITER_LARGE = 5


def kmeans_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The realistic-parameter fit (k=64, 5 rounds — DESIGN.md round-2
    agenda) on the vectorized hot path: Arrow-batched numpy assign over a
    broadcast codebook (no k-fold join blowup), driver-mediated 4 KB
    centroid updates — the MLlib iteration pattern. All arithmetic stays
    int64-exact, so it hash-matches the SAME unrolled relational oracle
    as kmeans_clusters — the fast path's equivalence to the declarative
    spec is verified every round, not asserted."""
    return _kmeans_rollup_vectorized(
        spark, sf_dir, k=K_LARGE, niter=NITER_LARGE
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
    # staged: the fit, the norms, and both dot-product sides read e
    e = stage(_long_form(spark, sf_dir), "ivf-long-form")
    a = stage(_final_assignment(e), "ivf-assignment")
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


def _chain_ctes(
    k: int = K, niter: int = NITER, e_sql: str | None = None
) -> list[str]:
    """The Lloyd-iteration chain as DuckDB CTEs (rendered, not
    hand-written, so Spark and oracle share one definition). ``e_sql``
    overrides the long-form source CTE (semantic dedup plants near-dup
    copies and uses a narrower integer scale there)."""
    ctes = [
        e_sql
        or f"""e AS (
  SELECT vec_id, r.range AS d,
         CAST(round(CAST(embedding[r.range + 1] AS DOUBLE) * {SCALE})
              AS BIGINT) AS v
  FROM embeddings, range({DIMS}) r
)""",
        f"""c0 AS (
  SELECT CAST(vec_id AS INTEGER) AS cid, d, v AS c
  FROM e WHERE vec_id < {k}
)""",
    ]
    for i in range(1, niter + 1):
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
        if i < niter:
            ctes.append(f"""c{i} AS (
  SELECT a.cid, e.d,
         CAST(floor(CAST(sum(e.v) AS DOUBLE) / count(*)) AS BIGINT) AS c
  FROM e JOIN a{i} a ON e.vec_id = a.vec_id
  GROUP BY a.cid, e.d
)""")
    return ctes


def oracle_kmeans_sql(k: int = K, niter: int = NITER) -> str:
    body = ",\n".join(_chain_ctes(k=k, niter=niter))
    return f"""WITH {body}
SELECT cid AS cluster_id, count(*) AS n_points,
       CAST(sum(dist) AS BIGINT) AS inertia
FROM a{niter} GROUP BY cid
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


# ---- product quantization (PQ) ------------------------------------------
#
# Same exact-integer relational machinery, applied per subspace: dim-64
# vectors split into N_SUB=8 contiguous 8-dim subvectors, each quantized
# by its own tiny k-means (PQ_K=4 codes, PQ_NITER=2 rounds). A vector's
# PQ code is its per-subspace centroid ids — 8 small ints instead of 64
# floats (the standard memory-bound ANN compression; at 100 TB the codes
# table is ~1/30 the size of the raw embeddings and the ADC search below
# never touches the raw vectors of the candidates).

N_SUB = 8
SUB_DIMS = 8
PQ_K = 4
PQ_NITER = 2


def _pq_long_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    # staged: the fit loop, the final assign, and the ADC LUT all read
    # this relation — unmaterialized, each consumer re-runs the explode
    return stage(
        _long_form(spark, sf_dir).withColumn(
            "sub", F.expr(f"cast(d div {SUB_DIMS} as int)")
        ),
        "pq-long-form",
    )


def _pq_assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    diff = F.col("v") - F.col("c")
    d2 = (
        e.join(F.broadcast(cent), on=["sub", "d"])
        .groupBy("vec_id", "sub", "cid")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("dist"), F.asc("cid")
    )
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "cid", "dist")
    )


def _pq_update(e: DataFrame, assign: DataFrame) -> DataFrame:
    return (
        e.join(assign.select("vec_id", "sub", "cid"), on=["vec_id", "sub"])
        .groupBy("sub", "cid", "d")
        .agg(
            F.floor(F.sum("v").cast("double") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("c")
        )
    )


def _pq_fit(e: DataFrame) -> DataFrame:
    """Returns the final codebook; callers re-assign under it (the
    in-loop assignments are one codebook behind by construction)."""
    cent = e.filter(F.col("vec_id") < PQ_K).select(
        "sub", F.col("vec_id").cast("int").alias("cid"), "d", F.col("v").alias("c")
    )
    for i in range(PQ_NITER):
        # stage each round's codebook (N_SUB x PQ_K x SUB_DIMS = 256 rows):
        # without it the unrolled iteration lineage nests into every
        # downstream consumer and plan size grows with NITER
        cent = stage(
            _pq_update(e, _pq_assign(e, cent)), f"pq-cent-r{i}"
        )
    return cent


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector PQ code: (vec_id, sub, code) plus the exact integer
    quantization error of that subvector under the final codebook."""
    e = _pq_long_form(spark, sf_dir)
    cent = _pq_fit(e)
    final = _pq_assign(e, cent)
    return final.select(
        "vec_id",
        "sub",
        F.col("cid").alias("code"),
        F.col("dist").alias("qerr"),
    )


def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) search over PQ codes: each query
    (vec_id < N_QUERIES) builds its lookup table of exact distances to
    every (subspace, code) centroid — N_SUB x PQ_K rows — then a
    candidate's approximate distance is the code-indexed SUM of LUT
    entries, never touching the candidate's raw vector. Top-TOP_K by
    (adc ASC, neighbor_id ASC).

    At scale this is the memory-bound ANN pattern: the LUT is built once
    per query against the broadcast codebook; the scan side reads only
    the 8-small-int codes table."""
    e = _pq_long_form(spark, sf_dir)
    cent = _pq_fit(e)
    codes = _pq_assign(e, cent).select(
        F.col("vec_id").alias("neighbor_id"), "sub", F.col("cid").alias("code")
    )
    lut = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent), on=["sub", "d"])
        .groupBy(
            F.col("vec_id").alias("query_id"),
            "sub",
            F.col("cid").alias("code"),
        )
        .agg(
            F.sum(
                (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
            ).alias("lut_dist")
        )
    )
    adc = (
        codes.join(F.broadcast(lut), on=["sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("lut_dist").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "adc", "rnk")
    )


def _pq_chain_ctes() -> list[str]:
    """PQ fit chain as DuckDB CTEs (shared by both PQ oracles)."""
    ctes = [
        f"""pe AS (
  SELECT vec_id, r.range AS d, CAST(r.range // {SUB_DIMS} AS INTEGER) AS sub,
         CAST(round(CAST(embedding[r.range + 1] AS DOUBLE) * {SCALE})
              AS BIGINT) AS v
  FROM embeddings, range({DIMS}) r
)""",
        f"""pc0 AS (
  SELECT sub, CAST(vec_id AS INTEGER) AS cid, d, v AS c
  FROM pe WHERE vec_id < {PQ_K}
)""",
    ]
    for i in range(1, PQ_NITER + 1):
        prev = f"pc{i - 1}"
        ctes.append(f"""pd{i} AS (
  SELECT pe.vec_id, pe.sub, c.cid,
         CAST(sum((pe.v - c.c) * (pe.v - c.c)) AS BIGINT) AS dist
  FROM pe JOIN {prev} c ON pe.sub = c.sub AND pe.d = c.d
  GROUP BY pe.vec_id, pe.sub, c.cid
)""")
        ctes.append(f"""pa{i} AS (
  SELECT vec_id, sub, cid, dist FROM (
    SELECT vec_id, sub, cid, dist,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist ASC, cid ASC) AS rn
    FROM pd{i}) t
  WHERE rn = 1
)""")
        ctes.append(f"""pc{i} AS (
  SELECT a.sub, a.cid, pe.d,
         CAST(floor(CAST(sum(pe.v) AS DOUBLE) / count(*)) AS BIGINT) AS c
  FROM pe JOIN pa{i} a ON pe.vec_id = a.vec_id AND pe.sub = a.sub
  GROUP BY a.sub, a.cid, pe.d
)""")
    # final assignment under the final codebook
    ctes.append(f"""pdf AS (
  SELECT pe.vec_id, pe.sub, c.cid,
         CAST(sum((pe.v - c.c) * (pe.v - c.c)) AS BIGINT) AS dist
  FROM pe JOIN pc{PQ_NITER} c ON pe.sub = c.sub AND pe.d = c.d
  GROUP BY pe.vec_id, pe.sub, c.cid
)""")
    ctes.append("""paf AS (
  SELECT vec_id, sub, cid, dist FROM (
    SELECT vec_id, sub, cid, dist,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist ASC, cid ASC) AS rn
    FROM pdf) t
  WHERE rn = 1
)""")
    return ctes


def oracle_pq_codes_sql() -> str:
    body = ",\n".join(_pq_chain_ctes())
    return f"""WITH {body}
SELECT vec_id, sub, cid AS code, dist AS qerr FROM paf
"""


def oracle_pq_adc_sql() -> str:
    extra = [
        f"""lut AS (
  SELECT pe.vec_id AS query_id, pe.sub, c.cid AS code,
         CAST(sum((pe.v - c.c) * (pe.v - c.c)) AS BIGINT) AS lut_dist
  FROM pe JOIN pc{PQ_NITER} c ON pe.sub = c.sub AND pe.d = c.d
  WHERE pe.vec_id < {N_QUERIES}
  GROUP BY pe.vec_id, pe.sub, c.cid
)""",
        """adc AS (
  SELECT l.query_id, x.vec_id AS neighbor_id,
         CAST(sum(l.lut_dist) AS BIGINT) AS adc
  FROM paf x
  JOIN lut l ON l.sub = x.sub AND l.code = x.cid
  WHERE x.vec_id <> l.query_id
  GROUP BY l.query_id, x.vec_id
)""",
    ]
    body = ",\n".join(_pq_chain_ctes() + extra)
    return f"""WITH {body}
SELECT query_id, neighbor_id, adc, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT adc.*,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc ASC, neighbor_id ASC) AS rnk
  FROM adc) t
WHERE rnk <= {TOP_K}
"""


# ---- vectorized hot path (kmeans_large) ---------------------------------
#
# The long-form join formulation above is the exactness-preserving
# baseline, but its assign step duplicates every (vec, dim) row k times
# through the join on d — at k=64 that is a 64x row blowup per round.
# The pragmatic Spark pattern (what MLlib does) broadcasts the codebook —
# k x d int64s, ~4 KB here — and computes all k distances per vector in
# one vectorized numpy kernel inside an Arrow-batched mapInPandas stage:
# zero shuffle for the assign, the only exchange per round is the tiny
# centroid update. Every operation stays int64-exact, so the fast path
# hash-matches the SAME DuckDB oracle as the relational chain — the
# equivalence is verified, not asserted.


def _collect_codebook(cent: DataFrame) -> tuple[list[int], list[list[int]]]:
    """Driver-side materialization of the k x d codebook (model state,
    kilobytes — the one legitimate driver hop in the iterative loop)."""
    rows = cent.collect()
    by_cid: dict[int, dict[int, int]] = {}
    for r in rows:
        by_cid.setdefault(r.cid, {})[r.d] = r.c
    cids = sorted(by_cid)
    mat = [
        [by_cid[cid][d] for d in range(DIMS)]
        for cid in cids
    ]
    return cids, mat


def _assign_vectorized(
    e_arr: DataFrame, cids: list[int], mat: list[list[int]]
) -> DataFrame:
    """(vec_id, varr) -> (vec_id, cid, dist): argmin over all centroids,
    ties to the lowest cid (cids sorted ascending + numpy first-min)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(mat, dtype=np.int64)
    cid_arr = np.asarray(cids, dtype=np.int64)
    c_sq = (C * C).sum(axis=1)  # k-vector, int64-exact

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf["varr"].to_numpy()).astype(np.int64)
            # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2 via int64 matmul:
            # O(rows x k) memory — the naive (V-C)**2 broadcast tensor is
            # O(rows x k x dims) and would OOM at realistic batch sizes
            v_sq = (V * V).sum(axis=1)
            d2 = v_sq[:, None] - 2 * (V @ C.T) + c_sq[None, :]
            best = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": cid_arr[best].astype(np.int32),
                    "dist": d2[np.arange(len(best)), best],
                }
            )

    return e_arr.mapInPandas(fn, "vec_id long, cid int, dist long")


def _kmeans_rollup_vectorized(
    spark: SparkSession, sf_dir: str, k: int, niter: int
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # ONE checkpointed copy; the long form derives from it (cheap
    # recompute from cached blocks — no second scan, and the
    # scale-and-round idiom exists in exactly one place: _long_form's)
    e_arr = emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> "
            f"cast(round(cast(x as double) * {SCALE}) as bigint))"
        ).alias("varr"),
    )
    e_arr = stage(e_arr, "kmeans-emb-arr")
    e_long = e_arr.select(
        "vec_id", F.posexplode("varr").alias("d", "v")
    )

    cent = e_long.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), "d", F.col("v").alias("c")
    )
    cids, mat = _collect_codebook(cent)
    assign = None
    for i in range(niter):
        assign = _assign_vectorized(e_arr, cids, mat)
        if i < niter - 1:
            # centroid update: the SAME _update the relational path uses
            # (one floor definition), collected as the next codebook
            cids, mat = _collect_codebook(_update(e_long, assign))
    return assign.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("dist").alias("inertia"),
    )


# ---- semantic dedup (SemDeDup) -------------------------------------------
#
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the embedding
# space, then look for near-duplicates ONLY within a cluster — the trick
# that turns the O(n²) all-pairs cosine comparison into per-cluster
# pair generation (cluster count grows with the corpus, so cluster SIZE
# — and with it the pair blowup — stays bounded at 100 TB; the
# all-pairs form is a non-starter there). The corpus has no natural
# near-dups (max pairwise cosine ≈ 0.51), so the scenario PLANTS them:
# every 25th vector gets a copy (vec_id + 10000) perturbed by +0.3 on
# dimension 0 — cosine ≈ 0.96 against its original, far above every
# natural pair. Exactness: its own integer scale (1000, not the k-means
# 1e6 — the threshold test squares a dot product, and 100·dot² must fit
# BIGINT on both engines) and a rational threshold τ = 0.9 tested as
# 100·dot² ≥ 81·‖u‖²·‖w‖² with dot > 0 — every comparison bit-identical
# in Spark and DuckDB. Drop rule (SemDeDup's): a vector dies when ANY
# lower-id vector in its cluster clears τ; the survivor reported is the
# lowest such id.

SEM_SCALE = 1_000
# K is SemDeDup's pair-blowup knob: within-cluster pairs ~ (n/K)²·K, so
# K must scale WITH the corpus to hold cluster SIZE constant (the paper
# clusters 50K-wide) — a fixed-small K re-grows pairs quadratically,
# which the round-10 sweep caught at K=8. Round 11 puts the scaling in
# the code, not a comment: semantic_dedup derives K = max(SEM_K,
# ceil(n / SEM_TARGET_CLUSTER)) from a cheap distinct count unless the
# caller passes one. SEM_K doubles as the floor AND the oracle's pinned
# value: the DuckDB CTE chain is a static string evaluated at the
# driver's sf0.01, where the derivation lands exactly on 16
# (n_eff = 520, width 33); at larger corpora the Spark side grows K
# (sf0.1: n_eff = 2080 -> K = 64, cluster width unchanged) while the
# oracle contract stays pinned to its declared scale. The recall cost
# of more clusters (a near-dup pair split across cells is missed) is
# SemDeDup's documented tradeoff.
SEM_K = 16
SEM_TARGET_CLUSTER = 33


def sem_derived_k(n_vectors: int) -> int:
    """ceil(n / target-cluster-width), floored at SEM_K — the knob that
    keeps within-cluster pair count LINEAR in corpus size."""
    return max(SEM_K, -(-int(n_vectors) // SEM_TARGET_CLUSTER))
SEM_NITER = 2
SEM_STEP = 25
SEM_OFFSET = 10_000
SEM_PERTURB = 300  # +0.3 on dim 0, in SEM_SCALE units
SEM_T_NUM2 = 81  # τ² = 81/100 → τ = 0.9
SEM_T_DEN2 = 100


def _sem_long_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "val")
    ).select(
        "vec_id",
        "d",
        F.round(F.col("val").cast("double") * SEM_SCALE)
        .cast("bigint")
        .alias("v"),
    )
    planted = base.filter(F.col("vec_id") % SEM_STEP == 0).select(
        (F.col("vec_id") + SEM_OFFSET).alias("vec_id"),
        "d",
        (
            F.col("v")
            + F.when(F.col("d") == 0, F.lit(SEM_PERTURB)).otherwise(
                F.lit(0)
            )
        ).cast("bigint").alias("v"),
    )
    return base.unionByName(planted)


def semantic_dedup(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> DataFrame:
    """SemDeDup over the planted corpus: k-means buckets the pair
    search, within-cluster exact-integer cosine kills near-dups, and
    each dropped vector reports its lowest-id survivor. ``k`` defaults
    to sem_derived_k(corpus size) — one distinct-count job — so the
    100 TB posture (cluster width constant, pair count linear in n) is
    the code path, not a constant. The oracle unrolls the IDENTICAL
    chain (same CTE template as the k-means queries) with K pinned at
    the derivation's value for the declared scales (16), so the
    clustering, the pair set, and every threshold comparison are
    bit-identical cross-engine at the correctness gate."""
    e = stage(_sem_long_form(spark, sf_dir), "semdedup-long-form")
    if k is None:
        k = sem_derived_k(e.select("vec_id").distinct().count())
    assign = _final_assignment(e, k=k, niter=SEM_NITER).select(
        "vec_id", "cid"
    )
    pairs = (
        assign.alias("u")
        .join(
            assign.alias("w"),
            (F.col("u.cid") == F.col("w.cid"))
            & (F.col("u.vec_id") < F.col("w.vec_id")),
        )
        .select(
            F.col("u.vec_id").alias("u"), F.col("w.vec_id").alias("w")
        )
    )
    norms = e.groupBy("vec_id").agg(
        F.sum(F.col("v") * F.col("v")).alias("n2")
    )
    dots = (
        pairs.join(e.alias("eu"), F.col("u") == F.col("eu.vec_id"))
        .join(
            e.alias("ew"),
            (F.col("w") == F.col("ew.vec_id"))
            & (F.col("eu.d") == F.col("ew.d")),
        )
        .groupBy("u", "w")
        .agg(F.sum(F.col("eu.v") * F.col("ew.v")).alias("dot"))
    )
    sim = (
        dots.join(
            norms.select(
                F.col("vec_id").alias("u"), F.col("n2").alias("n2u")
            ),
            "u",
        )
        .join(
            norms.select(
                F.col("vec_id").alias("w"), F.col("n2").alias("n2w")
            ),
            "w",
        )
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(SEM_T_DEN2) * F.col("dot") * F.col("dot")
                >= F.lit(SEM_T_NUM2) * F.col("n2u") * F.col("n2w")
            )
        )
    )
    return (
        sim.groupBy(F.col("w").alias("dropped_vec_id"))
        .agg(F.min("u").alias("kept_vec_id"))
        .orderBy("dropped_vec_id")
    )


def _sem_e_sql() -> str:
    base = f"""SELECT vec_id, r.range AS d,
           CAST(round(CAST(embedding[r.range + 1] AS DOUBLE)
                * {SEM_SCALE}) AS BIGINT) AS v
    FROM embeddings, range({DIMS}) r"""
    return f"""e AS (
  SELECT vec_id, d, v FROM ({base})
  UNION ALL
  SELECT vec_id + {SEM_OFFSET}, d,
         v + CASE WHEN d = 0 THEN {SEM_PERTURB} ELSE 0 END
  FROM ({base}) WHERE vec_id % {SEM_STEP} = 0
)"""


def oracle_semantic_dedup_sql() -> str:
    extra = [
        f"""pairs AS (
  SELECT u.vec_id AS u, w.vec_id AS w
  FROM a{SEM_NITER} u JOIN a{SEM_NITER} w
    ON u.cid = w.cid AND u.vec_id < w.vec_id
)""",
        """norms AS (
  SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2 FROM e GROUP BY vec_id
)""",
        """dots AS (
  SELECT p.u, p.w, CAST(sum(eu.v * ew.v) AS BIGINT) AS dot
  FROM pairs p
  JOIN e eu ON eu.vec_id = p.u
  JOIN e ew ON ew.vec_id = p.w AND ew.d = eu.d
  GROUP BY 1, 2
)""",
        f"""sim AS (
  SELECT d.u, d.w
  FROM dots d
  JOIN norms nu ON nu.vec_id = d.u
  JOIN norms nw ON nw.vec_id = d.w
  WHERE d.dot > 0
    AND {SEM_T_DEN2} * d.dot * d.dot >= {SEM_T_NUM2} * nu.n2 * nw.n2
)""",
    ]
    body = ",\n".join(
        _chain_ctes(k=SEM_K, niter=SEM_NITER, e_sql=_sem_e_sql()) + extra
    )
    return f"""WITH {body}
SELECT w AS dropped_vec_id, min(u) AS kept_vec_id
FROM sim GROUP BY w ORDER BY dropped_vec_id
"""
