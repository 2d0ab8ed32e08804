"""ANN recall/latency curve for the learned-quantizer IVF search.

The round-6 verdict named one gap worth new code: "a real ANN
recall/latency curve for knn_kmeans_ivf at sweep scale". This script
produces it: k-means IVF (the same exact-integer Lloyd fit as
operators/clustering.py, K=64 x 5 rounds — the kmeans_large
parameters) searched at nprobe in {1, 2, 4, 8}, recall@10 measured
against the exact brute-force cosine top-10, latency as the min of 3
timed search passes (fit time reported separately — it amortizes across
every query the index ever serves, exactly like a real IVF deployment).

Search shape per nprobe (all DataFrame algebra, no driver loops):
  1. query -> cell shortlist: the query vectors' long-form join against
     the BROADCAST centroid relation (K x 64 rows), squared-L2 per
     (query, cid), rank <= nprobe — the coarse quantizer probe;
  2. candidates: shortlist equi-join the assignment table on cid — the
     pruned candidate set (nprobe/K of the corpus, never all pairs);
  3. exact scoring: candidates join the array-form vectors both sides,
     zip_with dot product / norms, cosine DESC top-10 per query.
Recall@10 = |IVF top-10 ∩ exact top-10| / 10, averaged over queries.

Run: python scripts/ann_curve.py [sf_dir]   (default /root/testdata/sf0.1)
Output: one markdown table + one JSON line (recorded in DESIGN.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_examples_spark.checkpointing import stage
from iceberg_examples_spark.operators.clustering import (
    K_LARGE,
    NITER_LARGE,
    SCALE,
    _final_assignment,
    _update,
)
from iceberg_examples_spark.operators.relational import load_table
from iceberg_examples_spark.session import get_spark

N_QUERIES = 50
TOP_K = 10
NPROBES = (1, 2, 4, 8)


def _arrays(spark, sf_dir: str, scale: int = 1) -> DataFrame:
    """(vec_id, vec: array<double>, nrm: double) — the scoring relation.

    ``scale`` > 1 replicates the corpus deterministically (vec_id offset
    + a per-copy elementwise tweak derived from (copy, vec_id, dim) —
    no RNG, so the fixture is stable across runs/engines) to measure the
    brute-force vs IVF latency crossover beyond the testdata's size; the
    queries stay the original sf vectors."""
    base = load_table(spark, sf_dir, "embeddings")
    if scale > 1:
        copies = spark.range(scale).select(F.col("id").alias("copy"))
        base = (
            base.crossJoin(F.broadcast(copies))
            .select(
                (F.col("vec_id") + F.col("copy") * 10_000_000).alias(
                    "vec_id"
                ),
                F.expr(
                    "transform(embedding, (x, d) -> x * (1.0 + "
                    "((copy * 131071 + vec_id * 31 + d) % 13 - 6) / 50.0))"
                ).alias("embedding"),
            )
        )
    return (
        base
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
        )
        .withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    "vec", F.lit(0.0), lambda acc, x: acc + x * x
                )
            ),
        )
    )


def _score_topk(cand: DataFrame, vecs: DataFrame) -> DataFrame:
    """cand(query_id, neighbor_id) -> exact-cosine top-K per query."""
    q = vecs.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    x = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vec").alias("xv"),
        F.col("nrm").alias("xn"),
    )
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(x, on="neighbor_id")
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with("qv", "xv", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / (F.col("qn") * F.col("xn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(app_name="ann-curve")
    vecs = stage(_arrays(spark, sf_dir, scale=scale), "ann-vecs")
    n_vecs = vecs.count()

    # ---- exact ground truth: brute-force cosine top-10 ----------------
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id")
    )
    all_cand = queries.crossJoin(
        vecs.select(F.col("vec_id").alias("neighbor_id"))
    ).filter(F.col("neighbor_id") != F.col("query_id"))

    def timed(df: DataFrame) -> tuple[float, list]:
        runs, rows = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = df.collect()
            runs.append(time.perf_counter() - t0)
        return min(runs), rows

    exact_sec, exact_rows = timed(_score_topk(all_cand, vecs))
    truth: dict[int, set] = {}
    for r in exact_rows:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    # ---- IVF fit (amortized): exact-integer Lloyd, K=64 x 5 rounds ----
    # long form derived from the (possibly scaled) scoring relation so
    # the index covers the same corpus the search runs over
    t0 = time.perf_counter()
    e = stage(
        vecs.select(
            "vec_id", F.posexplode("vec").alias("d", "val")
        ).select(
            "vec_id",
            "d",
            F.round(F.col("val") * SCALE).cast("bigint").alias("v"),
        ),
        "ann-long-form",
    )
    assign = stage(
        _final_assignment(e, k=K_LARGE, niter=NITER_LARGE), "ann-assign"
    )
    cent = stage(_update(e, assign), "ann-centroids")
    assign.count(), cent.count()
    fit_sec = time.perf_counter() - t0

    # query -> centroid squared-L2 table (tiny: N_QUERIES x K rows)
    eq = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "d", "v"
    )
    diff = F.col("v") - F.col("c")
    qcell = stage(
        eq.join(F.broadcast(cent), on="d")
        .groupBy("query_id", "cid")
        .agg(F.sum(diff * diff).alias("dist")),
        "ann-qcell",
    )
    xa = assign.select(F.col("vec_id").alias("neighbor_id"), "cid")

    results = []
    for nprobe in NPROBES:
        w = Window.partitionBy("query_id").orderBy(
            F.asc("dist"), F.asc("cid")
        )
        shortlist = (
            qcell.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= nprobe)
            .select("query_id", "cid")
        )
        cand = (
            shortlist.join(xa, on="cid")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
        )
        n_cand = cand.count()
        sec, rows = timed(_score_topk(cand, vecs))
        hits = sum(
            1
            for r in rows
            if r["neighbor_id"] in truth.get(r["query_id"], set())
        )
        recall = hits / (TOP_K * len(truth))
        results.append(
            {
                "nprobe": nprobe,
                "recall_at_10": round(recall, 4),
                "search_sec": round(sec, 4),
                "cand_frac": round(n_cand / (len(truth) * (n_vecs - 1)), 4),
            }
        )

    print(f"\nexact brute force: {exact_sec:.3f} s  (the recall=1.0 baseline)")
    print(f"IVF fit (amortized): {fit_sec:.3f} s  K={K_LARGE} x {NITER_LARGE} rounds")
    print(f"\n| nprobe | recall@10 | search sec | candidate frac |")
    print(f"|---|---|---|---|")
    for r in results:
        print(
            f"| {r['nprobe']} | {r['recall_at_10']:.3f} "
            f"| {r['search_sec']:.3f} | {r['cand_frac']:.3f} |"
        )
    print()
    print(
        json.dumps(
            {
                "metric": "ann_curve",
                "sf_dir": sf_dir,
                "n_vecs": n_vecs,
                "n_queries": len(truth),
                "exact_sec": round(exact_sec, 4),
                "fit_sec": round(fit_sec, 4),
                "curve": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
