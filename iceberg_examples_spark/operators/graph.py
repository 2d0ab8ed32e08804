"""Iterative graph analytics over the corpus: integer-exact PageRank.

Crawl pipelines rank pages to prioritize fetch/curation budgets; the
canonical algorithm is PageRank, and it is the third iterative family in
this engine beside connected components (dedup.dedup_components) and
k-means (clustering). The formulation here is chosen for CLUSTER
execution and cross-engine exactness:

- The link graph is synthesized deterministically: every document emits
  OUT_DEGREE edges whose targets are md5-derived (``h('link#id#k') %
  (max_id + 1)``) — both engines build the identical graph, and targets
  that miss a real doc are dangling links whose mass simply evaporates
  (the standard simplified treatment; determinism is unaffected).
- ALL arithmetic is scaled-integer (rank × 10^6, damping 85/100 via
  BIGINT ``div``). Floating-point PageRank cannot be hash-compared
  across engines — parallel summation orders differ and double addition
  is non-associative; integer sums are associative, so the result is
  bit-identical regardless of partitioning, parallelism, or engine.
- Each iteration is one equi-join (edges ⋈ ranks on src) + one
  aggregate (sum of contributions by dst) + one left join back to the
  node set — shuffles keyed on node id, exactly the shape Pregel-style
  systems distribute. Iterations are staged (checkpointing.stage) so
  the plan depth stays constant and a cluster run truncates lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table
from iceberg_examples_spark.checkpointing import stage
from iceberg_examples_spark.functions.texthash import md5_int_hash

OUT_DEGREE = 3
PR_ITERATIONS = 3
PR_SCALE = 1_000_000  # rank fixed-point scale
PR_TOPK = 20
# Lineage-truncation interval: staging EVERY iteration paid one eager
# materialization job per round (r12 bench: pagerank_links 2.6 s at
# sf0.1, nearly all job fixed cost — and 8 cores beat 32, the
# tiny-task signature). Plan depth only threatens planning time /
# lineage recovery after MANY rounds, so truncate every K rounds
# instead of every round: a 3-iteration query is one job, a 50-round
# cluster loop still checkpoints periodically (guide §2.4/§3.3 —
# materialize when the plan gets wide, not by reflex).
PR_STAGE_EVERY = 8


def _edges(docs: DataFrame) -> DataFrame:
    """(src, dst): OUT_DEGREE deterministic md5-derived links per doc."""
    n_expr = docs.agg((F.max("doc_id") + 1).alias("n_ids"))
    h = md5_int_hash(
        "concat('link#', cast(src as string), '#', cast(k as string))"
    )
    return (
        docs.select(F.col("doc_id").alias("src"))
        .crossJoin(F.broadcast(n_expr))
        .select(
            "src",
            F.explode(F.expr(f"sequence(1, {OUT_DEGREE})")).alias("k"),
            "n_ids",
        )
        .select("src", F.expr(f"({h}) % n_ids").alias("dst"))
    )


def pagerank_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR_ITERATIONS rounds of integer-exact PageRank over the synthetic
    link graph; output = the PR_TOPK highest-ranked documents
    (rank desc, doc_id asc — fully deterministic order and values)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = stage(_edges(docs), "pr-edges")
    ranks = docs.withColumn("rank", F.lit(PR_SCALE).cast("long"))
    base = int(0.15 * PR_SCALE)
    for i in range(PR_ITERATIONS):
        recv = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .select("dst", F.expr(f"rank div {OUT_DEGREE}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = docs.join(recv, docs.doc_id == recv.dst, "left").select(
            "doc_id",
            F.expr(
                f"{base} + (85 * coalesce(in_mass, 0L)) div 100"
            ).alias("rank"),
        )
        # periodic truncation only (see PR_STAGE_EVERY): each round's
        # output feeds exactly the next round, so an unstaged chain
        # recomputes nothing — one deep plan, one job, and AQE sizes
        # every shuffle from runtime stats instead of 32 static tasks
        if (i + 1) % PR_STAGE_EVERY == 0 and i + 1 < PR_ITERATIONS:
            ranks = stage(ranks, f"pr-iter-{i}")
    return (
        ranks.orderBy(F.desc("rank"), F.asc("doc_id"))
        .limit(PR_TOPK)
        .select("doc_id", "rank")
    )


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census over the synthetic link graph (the
    graph-quality / community-density signal crawl curation reads):
    one row (n_nodes, n_edges, n_wedges, n_triangles) over the
    undirected simple graph derived from _edges.

    The naive edge³ self-join explodes on high-degree nodes ("the curse
    of the last reducer" — Suri & Vassilvitskii, WWW'11); the standard
    fix implemented here is DEGREE ORIENTATION: direct every undirected
    edge from its lower-degree endpoint to the higher (id tiebreak),
    making the directed out-degree ≤ O(√m) for every node, so the
    wedge join (e(a,b) ⋈ e(b,c)) — the expensive step — is bounded
    regardless of skew. Triangles = wedges that close (join against the
    oriented edge set). Three equi-joins keyed on node ids, one tiny
    final aggregate; every shuffle carries 16-byte edge rows."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # undirected simple edges (lo, hi): dedup both directions, drop loops
    und = (
        _edges(docs)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
    )
    und = stage(und, "tri-edges")
    deg = (
        und.select(F.col("lo").alias("v"))
        .unionAll(und.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient lo->hi edge by (degree, id): from the smaller endpoint
    withdeg = (
        und.join(deg.withColumnRenamed("v", "lo").withColumnRenamed("d", "d_lo"), "lo")
        .join(deg.withColumnRenamed("v", "hi").withColumnRenamed("d", "d_hi"), "hi")
    )
    oriented = stage(
        withdeg.select(
            F.when(
                (F.col("d_lo") < F.col("d_hi"))
                | ((F.col("d_lo") == F.col("d_hi")) & (F.col("lo") < F.col("hi"))),
                F.struct(F.col("lo").alias("s"), F.col("hi").alias("t")),
            )
            .otherwise(F.struct(F.col("hi").alias("s"), F.col("lo").alias("t")))
            .alias("e")
        ).select(F.col("e.s").alias("s"), F.col("e.t").alias("t")),
        "tri-oriented",
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    wedges = e1.join(e2, F.col("e1.t") == F.col("e2.s")).select(
        F.col("e1.s").alias("a"), F.col("e1.t").alias("b"), F.col("e2.t").alias("c")
    )
    tri = wedges.join(
        e3,
        (F.col("a") == F.col("e3.s")) & (F.col("c") == F.col("e3.t")),
        "left_semi",
    )
    n_nodes = docs.select(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("n_wedges"))
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        n_nodes.crossJoin(n_edges).crossJoin(n_wedges).crossJoin(n_tri)
    )


BFS_SOURCE = 0
BFS_MAX_LEVEL = 8


def bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reachability levels from BFS_SOURCE over the
    synthetic link graph (crawl-frontier / link-distance analysis — the
    fourth iterative family beside PageRank, connected components, and
    k-means). Level = first-visit round ≡ shortest hop distance; output
    is the per-level census (level, n_nodes, id_sum).

    Iteration shape: frontier ⋈ edges (keyed on src) → subtract visited
    (left_anti on node id) → next frontier; visited and frontier are
    staged per round (constant plan depth, cluster-safe lineage), and
    the loop stops on an empty frontier via an 8-byte head() probe —
    dedup_components' convergence discipline. Levels are capped at
    BFS_MAX_LEVEL so the DuckDB twin (a recursive CTE, which cannot
    early-stop on cycles) terminates on the identical bound; with
    out-degree 3 the reachable set saturates well before the cap."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = stage(_edges(docs), "bfs-edges")
    frontier = stage(
        docs.filter(F.col("doc_id") == BFS_SOURCE).select(
            "doc_id", F.lit(0).cast("bigint").alias("level")
        ),
        "bfs-visited",
    )
    # visited = the UNION of the staged per-level frontiers. Each
    # frontier is materialized exactly once (it feeds both the next
    # level's anti-join and the final census); re-staging the growing
    # union as well paid a second eager materialization job per level
    # for rows that were all already checkpointed — at BFS_MAX_LEVEL=8
    # that was 8 extra job waves of pure fixed cost (r12: bfs_levels
    # 3.4 s, ratio 0.66 — tiny-task signature). A union of ≤8
    # checkpoint scans is a trivially small plan at any scale.
    fronts = [frontier]
    for lvl in range(1, BFS_MAX_LEVEL + 1):
        visited = fronts[0]
        for f in fronts[1:]:
            visited = visited.unionByName(f)
        nxt = (
            frontier.join(edges, frontier["doc_id"] == edges["src"])
            .select(F.col("dst").alias("doc_id"))
            .distinct()
            .join(visited, "doc_id", "left_anti")
            .withColumn("level", F.lit(lvl).cast("bigint"))
        )
        frontier = stage(nxt, f"bfs-frontier-{lvl}")
        if frontier.isEmpty():
            break
        fronts.append(frontier)
    out = fronts[0]
    for f in fronts[1:]:
        out = out.unionByName(f)
    return out.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("doc_id").alias("id_sum"),
    )
