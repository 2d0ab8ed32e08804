"""End-to-end LLM training-data preparation capstone (the composition the
north-star extension operators exist for — `BASELINE.json:6`): one declared
query chaining quality filtering → exact dedup → near-dup removal →
deterministic train/val split → per-(lang, split) corpus stats, each stage
the already-verified operator it reuses:

    quality   operators/text.quality_score   (HOF token folds, no UDF)
    exact     char_poly_hash fingerprint -> min-doc_id representative
    near-dup  operators/dedup.lsh_verified_pairs (banded MinHash + verify)
    split     md5-derived hash mod 100 (deterministic_sample's idiom)

Stage order matters at 100 TB: the cheap map-only quality filter runs
first (shrinks everything downstream), exact dedup's one shuffle runs
before the LSH join (near-dup buckets never see byte-identical copies),
and the split is a pure map at the end. Every intermediate stays
distributed; the only driver traffic is the final tiny aggregate.

Near-dup removal policy: any doc appearing as the LARGER id of a verified
pair is dropped (greedy keep-lowest — deterministic and engine-mirrored;
the transitive-closure variant is dedup_components' job).

The DuckDB oracle (oracles_ext) recomposes the SAME stage fragments the
individual oracles use, so the pipeline is hash-checked end-to-end, not
just stage-by-stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table
from iceberg_examples_spark.checkpointing import stage
from iceberg_examples_spark.functions.texthash import train_val_split_sql
from iceberg_examples_spark.operators.dedup import (
    exact_loser_ids,
    lsh_verified_pairs,
)
from iceberg_examples_spark.operators.text import with_quality_metrics

QUALITY_MIN = 4


def llm_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → LSH near-dup removal → deterministic
    train/val split → per-(lang, split) corpus stats, end-to-end (see
    module docstring for stage order rationale)."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gate — genuinely map-only: the metric columns are pure
    # per-row expressions appended to the ONE corpus scan (no re-scan,
    # no self-join). An Arrow-batched gate twin was built and A/B'd in
    # round 4 and LOST (0.69 s vs 0.51 s at sf0.1): with tokens factored
    # through one materialized column the HOF folds stay JVM-side and
    # beat the Python round-trip — see DESIGN.md round-4 notes.
    # staged: stages 2-3 reference the gated corpus from multiple
    # plan branches (representative join, LSH signatures, anti-joins) —
    # without materialization each branch would re-run the quality folds
    # (checkpointing.stage: a real staging write when configured)
    kept = stage(
        with_quality_metrics(docs)
        .filter(F.col("quality") >= QUALITY_MIN)
        .select("doc_id", "lang", "text", "n_tokens"),
        "gated-corpus",
    )

    # 2. exact dedup: drop the non-min members of duplicate groups via
    # the two-phase fp-first plan (dedup.exact_loser_ids) — only
    # duplicate groups' text crosses a shuffle, and the anti-join's build
    # side is just the surplus copies, not a corpus-sized keep set.
    # The deduped corpus is staged: three consumers follow (LSH
    # signatures, the near-dup anti-join, the final aggregate), and an
    # un-staged dedup subtree would replicate into each branch.
    losers = exact_loser_ids(kept.select("doc_id", "text"))
    kept = stage(
        kept.join(losers, on="doc_id", how="left_anti"), "exact-deduped"
    )

    # 3. near-dup removal: drop the larger id of every verified LSH pair
    pairs = lsh_verified_pairs(kept.select("doc_id", "text"))
    near_dups = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = kept.join(near_dups, on="doc_id", how="left_anti")

    # 4. deterministic split + 5. corpus stats
    return (
        kept.withColumn(
            "split", F.expr(train_val_split_sql("doc_id"))
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.expr("cast(doc_id as bigint)")).alias("id_sum"),
        )
    )


BIN_TOKENS = 512
# Docs per packing shard.  Each shard is a contiguous doc_id range packed
# independently — a bounded, parallel window instead of a total-order sort.
# 128 keeps several shards live even at the 500-doc test corpus; a cluster
# deployment raises it so a shard is a few executor-memory-sized GB.
SHARD_DOCS = 128


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing — the step that turns a dedup'd
    corpus into fixed-budget training sequences: documents are laid out
    in deterministic (doc_id) order and each doc's bin is its starting
    offset in the concatenated token stream div the bin budget (exactly
    how GPT-style pipelines pack: stream, then cut every BIN_TOKENS).

    Packing is SHARDED: docs are grouped into contiguous doc_id ranges of
    SHARD_DOCS and each shard packs independently (`Window.partitionBy`),
    so the cumsum window is a parallel per-shard operation — no task ever
    sees more than one shard, and the plan survives a 100× corpus where a
    total-order window would funnel everything through one task.  The
    per-shard kernel is pure BIGINT arithmetic (integer `div`, NOT
    `/`+cast: float division then cast truncates in Spark but ROUNDS in
    DuckDB), so bin assignment is bit-identical cross-engine.

    Output: per-(shard, bin) doc count, token total, id-sum fingerprint.
    """
    docs = with_quality_metrics(load_table(spark, sf_dir, "documents"))
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = (
        docs.select("doc_id", "n_tokens")
        .withColumn("shard_id", F.expr(f"doc_id div {SHARD_DOCS}"))
        .withColumn(
            "offset",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
        .withColumn("bin_id", F.expr(f"offset div {BIN_TOKENS}"))
    )
    return binned.groupBy("shard_id", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.sum("doc_id").alias("id_sum"),
    )


def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing — the multilingual-LM
    standard (XLM-R / mT5 style: sample source s with p ∝ n_s^α, α<1,
    upweighting low-resource sources). Deterministic formulation at
    α = 0.5: keep-rate_s = floor(10000·sqrt(min_s n / n_s)) out of
    10000, so the smallest source keeps everything and a source 4× its
    size keeps half; membership is the hash-pure doc_id threshold (no
    RNG — reruns and engines agree). sqrt on doubles is IEEE
    correctly-rounded in both engines, so the rates are bit-identical.
    The rate resolution is SAMPLE_MOD (one definition, interpolated into
    both this plan and the DuckDB oracle).

    Plan: tiny per-source count agg → window-min over the handful of
    rate rows → broadcast join back → map-only filter → final agg. The
    corpus is touched twice (count + filter) but shuffles only bytes of
    source keys; at 100 TB both passes are map-side against the scan."""
    docs = load_table(spark, sf_dir, "documents")
    from iceberg_examples_spark.functions.texthash import md5_int_hash

    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w_all = Window.partitionBy()
    rates = counts.select(
        "source",
        F.floor(
            SAMPLE_MOD
            * F.sqrt(
                F.min("n_s").over(w_all).cast("double") / F.col("n_s").cast("double")
            )
        ).alias("rate"),
    )
    h = md5_int_hash("cast(doc_id as string)")
    kept = docs.join(F.broadcast(rates), "source").filter(
        F.expr(f"({h}) % {SAMPLE_MOD}") < F.col("rate")
    )
    return kept.groupBy("source", "rate").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
    )


N_EXPORT_SHARDS = 8


def jsonl_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded JSONL delivery — the standard handoff format from a
    curation pipeline to a training stack: the corpus lands as N
    directories of newline-delimited JSON, shard membership a pure
    function of doc_id (hash mod N, the deterministic_sample idiom) so
    reruns, backfills, and downstream loaders agree on placement without
    coordination. The write repartitions ON the shard column first, so
    each output directory is produced by the tasks that own that shard
    (hash-partitioned write; no shard's rows scatter across all tasks'
    files), then ``partitionBy`` lays out ``shard=K/`` directories.
    Read-back uses an explicit schema (JSONL inference is an extra full
    pass at scale) with the shard recovered from directory layout, and
    the returned manifest — per-shard counts, byte totals, id-sum
    fingerprint — is what a delivery job would publish beside the data.
    The oracle recomputes the manifest from the raw table, proving the
    JSONL round trip is lossless and placement deterministic. At 100 TB
    N_EXPORT_SHARDS scales with the corpus (shards ≈ files × target
    size); the plan is one hash shuffle + map-side write either way."""
    from iceberg_examples_spark.catalog import scratch_dir
    from iceberg_examples_spark.functions.texthash import md5_int_hash

    docs = load_table(spark, sf_dir, "documents")
    h = md5_int_hash("cast(doc_id as string)")
    sharded = docs.withColumn(
        "shard", F.expr(f"({h}) % {N_EXPORT_SHARDS}").cast("int")
    )
    out = scratch_dir(sf_dir, "jsonl_export", fresh=True)
    (
        sharded.repartition(N_EXPORT_SHARDS, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(out)
    )
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, "
        "n_chars long, shard int"
    ).json(out)
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length("text")).alias("total_text_bytes"),
        F.sum("doc_id").alias("id_sum"),
    )


MIXTURE = {"src0": 100, "src1": 50, "src2": 25}  # pct*100 kept per source


def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixture sampling: each source gets a keep-rate
    (src0 all, src1 half, src2 quarter, everything else dropped) and
    membership is the hash-pure train_val_split idiom generalized to
    per-source thresholds — reweighting corpus composition without an
    RNG, reproducibly across engines and reruns. Map-only + one tiny
    aggregate."""
    from iceberg_examples_spark.functions.texthash import md5_int_hash

    docs = load_table(spark, sf_dir, "documents")
    h = md5_int_hash("cast(doc_id as string)")
    rate = F.lit(0)
    for src, pct in sorted(MIXTURE.items()):
        rate = F.when(F.col("source") == src, F.lit(pct)).otherwise(rate)
    return (
        docs.withColumn("keep_rate", rate)
        .filter(F.expr(f"({h}) % 100") < F.col("keep_rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


# quality→rate calibration: rate = quality² · QUALITY_RATE_SCALE out of
# SAMPLE_MOD. Shared with the DuckDB oracle by interpolation (module
# policy: one definition, so the engines cannot drift silently).
QUALITY_RATE_SCALE = 625
SAMPLE_MOD = 10_000


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-calibrated sampling — the production shape of "keep
    high-quality data at a higher rate": each document's keep
    probability is a function of its quality score (here the shared
    4-point heuristic standing in for a classifier: rate = q² · 625 out
    of 10000, so top-quality docs always survive, quality-0 never does),
    and membership is the hash-pure doc_id threshold — deterministic
    across engines, reruns, and backfills, unlike rand()-based sampling
    which silently resamples every run. Map-only over the corpus (the
    quality metrics and the hash are per-row expressions); one tiny
    final aggregate."""
    from iceberg_examples_spark.functions.texthash import md5_int_hash
    from iceberg_examples_spark.operators.text import with_quality_metrics

    docs = with_quality_metrics(load_table(spark, sf_dir, "documents"))
    h = md5_int_hash("cast(doc_id as string)")
    kept = docs.withColumn(
        "rate", F.expr(f"quality * quality * {QUALITY_RATE_SCALE}")
    ).filter(F.expr(f"({h}) % {SAMPLE_MOD}") < F.col("rate"))
    return kept.groupBy("quality", "rate").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
    )


N_WORKERS = 8


def balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced worker assignment — the data-parallel loading step
    after packing: spread documents over N_WORKERS so per-worker token
    totals are even, deterministically. Greedy LPT needs a sequential
    fold, so this uses its classic parallel approximation: rank docs by
    n_tokens DESC within each shard (the contiguous doc_id ranges of
    SHARD_DOCS, as in sequence_packing) and fold the rank serpentine
    (boustrophedon) over 2·N_WORKERS slots — consecutive heavy docs land
    on different workers and each worker gets one heavy + one light doc
    per zig-zag, the standard balanced-static-partitioning trick.

    Plan: per-shard window rank (bounded partitions — no total-order
    sort), map-only slot arithmetic, one final aggregate. Output:
    per-worker doc count, token total, id-sum fingerprint; the imbalance
    is readable directly off the token totals."""
    from iceberg_examples_spark.operators.text import with_quality_metrics

    docs = with_quality_metrics(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("shard_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    two_w = 2 * N_WORKERS
    return (
        docs.select("doc_id", "n_tokens")
        .withColumn("shard_id", F.expr(f"doc_id div {SHARD_DOCS}"))
        .withColumn("slot", (F.row_number().over(w) - 1) % two_w)
        .withColumn(
            "worker",
            F.expr(
                f"case when slot < {N_WORKERS} then slot "
                f"else {two_w - 1} - slot end"
            ),
        )
        .groupBy("worker")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


# epoch_shuffle: range-bucket fan-out + tiny offset table instead of a
# one-partition global window. 2^60 hash space / EPOCH_BUCKETS ranges.
EPOCH_SEED = "epoch1"
EPOCH_BUCKETS = 32
_EPOCH_BUCKET_WIDTH = (1 << 60) // EPOCH_BUCKETS


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order (epoch shuffle): every doc gets
    an exact position 1..N in the order of a seeded hash — the "shuffle
    once, replay anywhere" requirement of distributed training (a rerun,
    a resumed job, and a different engine must all agree on the order,
    which rand()-shuffles cannot give).

    The naive formulation — ``row_number() OVER (ORDER BY hash)`` — is a
    single-partition global sort window: one task materializes the whole
    corpus at 100 TB. This uses the distributed enumeration instead:
    the 60-bit hash space is cut into EPOCH_BUCKETS equal RANGES (range,
    not mod — bucket order must agree with hash order), per-bucket counts
    (a tiny aggregate: 32 rows to the driver, planning-scalar hop) become
    prefix-sum offsets, and the exact global position is
    ``offset[bucket] + row_number within bucket``. Each bucket's window
    sorts only ~N/32 rows in parallel — the same two-phase shape as
    zipWithIndex, expressed declaratively. Hash uniformity bounds bucket
    skew; more buckets = more parallelism, same arithmetic."""
    from iceberg_examples_spark.functions.texthash import md5_int_hash

    docs = load_table(spark, sf_dir, "documents")
    h = md5_int_hash(f"concat('{EPOCH_SEED}:', cast(doc_id as string))")
    hashed = docs.select(
        "doc_id",
        F.expr(h).alias("rank_hash"),
    ).withColumn("bucket", F.expr(f"rank_hash div {_EPOCH_BUCKET_WIDTH}"))

    counts = {
        r["bucket"]: r["n"]
        for r in hashed.groupBy("bucket").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    offsets, acc = [], 0
    for b in range(EPOCH_BUCKETS):
        offsets.append((b, acc))
        acc += counts.get(b, 0)
    off = F.broadcast(
        spark.createDataFrame(offsets, "bucket bigint, offset bigint")
    )

    w = Window.partitionBy("bucket").orderBy("rank_hash", "doc_id")
    return (
        hashed.join(off, "bucket")
        .withColumn("pos", F.col("offset") + F.row_number().over(w))
        .select("pos", "doc_id", "rank_hash")
    )


DOMAIN_CAP = 15


def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling — cap any one source's contribution at
    DOMAIN_CAP docs so a crawl dominated by a few giant domains cannot
    dominate the training mix (the source-balancing step every web-scale
    corpus applies). Selection within a domain is by seeded-hash order
    (deterministic; reruns and engines agree), not arrival order.

    Plan: one shuffle by source + per-source window rank over ~equal
    groups. A pathological mega-domain makes that group's sort big; the
    fix at scale is the two-phase top-K (per-partition local top-K, then
    the final rank over ≤ P·K survivors) — same output, and AQE's skew
    splitting already covers the moderate cases. Output is the kept
    membership itself (doc_id, source, pick rank)."""
    from iceberg_examples_spark.functions.texthash import md5_int_hash

    docs = load_table(spark, sf_dir, "documents")
    h = md5_int_hash(f"concat('cap:', cast(doc_id as string))")
    w = Window.partitionBy("source").orderBy("pick_hash", "doc_id")
    return (
        docs.select("doc_id", "source", F.expr(h).alias("pick_hash"))
        .withColumn("pick", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pick") <= DOMAIN_CAP)
        .select("doc_id", "source", "pick")
    )


LEN_BUCKET_MAX_P = 30


def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution in power-of-two buckets — the packing
    / context-window planning histogram (what share of docs fit 2^k
    tokens, and where the token mass lives). Bucket = floor(log2(n)) is
    computed in INTEGER arithmetic (count of set powers via a shiftleft
    fold), never float log: both engines agree exactly at boundaries,
    where log2(2^k) in doubles can land on either side of k.

    Map-only bucket assignment + one tiny aggregate; the cumulative
    share columns are a window over the ≤30-row grouped result. The
    token count is materialized ONCE before the bucket fold consumes it
    (the with_tokens lesson: inlining the tokenizer into a second
    expression doubles the per-row regex work — measured 1.97 s → 0.55 s
    median at sf0.1 for this query)."""
    from iceberg_examples_spark.functions.texthash import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        F.expr(f"cast(size({tokens_expr('text')}) as bigint)").alias(
            "n_tokens"
        )
    )
    bucket = (
        f"size(filter(sequence(0, {LEN_BUCKET_MAX_P}), "
        f"p -> shiftleft(1L, p) <= n_tokens)) - 1"
    )
    grouped = (
        counted.select(
            F.expr(f"cast({bucket} as bigint)").alias("bucket"),
            "n_tokens",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn("lo", F.expr("shiftleft(1L, cast(bucket as int))"))
        .withColumn("hi", F.expr("shiftleft(1L, cast(bucket as int) + 1) - 1"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return grouped.select(
        "bucket",
        "lo",
        "hi",
        "n_docs",
        "total_tokens",
        F.sum("n_docs").over(w).alias("cum_docs"),
    )


MEDIA_MIN_BYTES, MEDIA_MAX_BYTES = 16, 100_000


def multimodal_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal training-manifest capstone: a training record ships
    only if ALL modalities pass — text quality gate (the shared 4-point
    heuristic), embedding not a sign-LSH bucket duplicate (keep-min, the
    embedding_neardup rule), media payload unique by digest AND within
    byte bounds. The three modality frames join on the record id and the
    per-language report counts each reject reason separately — the
    shape every multimodal curation run reports (you fix different
    pipelines depending on WHICH modality rejects).

    Plan: three map-only flag derivations (quality folds; 12 sign bits;
    md5 digest) + two keep-min windows over narrow keys (bucket, digest)
    + two equi-joins on the record id + one aggregate. Each modality
    stage is the already-verified standalone operator's expression —
    one definition, shared with its oracle fragment, so the capstone
    and the parts cannot drift."""
    from iceberg_examples_spark.operators.text import with_quality_metrics
    from iceberg_examples_spark.sources.multimodal import build_media_table

    docs = with_quality_metrics(load_table(spark, sf_dir, "documents"))
    text_side = docs.select(
        "doc_id",
        "lang",
        (F.col("quality") >= QUALITY_MIN).alias("q_ok"),
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bucket = " + ".join(
        f"(case when embedding[{i}] >= 0 then {2 ** i} else 0 end)"
        for i in range(12)
    )
    w_b = Window.partitionBy("bucket")
    emb_side = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            F.expr(f"cast({bucket} as int)").alias("bucket"),
        )
        .withColumn("keep_min", F.min("doc_id").over(w_b))
        .select(
            "doc_id", (F.col("doc_id") == F.col("keep_min")).alias("e_ok")
        )
    )

    media = build_media_table(spark, sf_dir)
    w_d = Window.partitionBy("digest")
    media_side = (
        media.select(
            F.col("media_id").alias("doc_id"),
            F.md5("payload").alias("digest"),
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .withColumn("keep_min", F.min("doc_id").over(w_d))
        .select(
            "doc_id",
            (F.col("doc_id") == F.col("keep_min")).alias("m_uniq"),
            F.col("n_bytes")
            .between(MEDIA_MIN_BYTES, MEDIA_MAX_BYTES)
            .alias("m_bytes_ok"),
        )
    )

    joined = text_side.join(emb_side, "doc_id").join(media_side, "doc_id")
    ok = "q_ok and e_ok and m_uniq and m_bytes_ok"
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.expr("case when q_ok then 0 else 1 end")).alias(
            "n_quality_fail"
        ),
        F.sum(F.expr("case when e_ok then 0 else 1 end")).alias(
            "n_embed_dup"
        ),
        F.sum(
            F.expr("case when m_uniq and m_bytes_ok then 0 else 1 end")
        ).alias("n_media_fail"),
        F.sum(F.expr(f"case when {ok} then 1 else 0 end")).alias("n_final"),
        F.sum(F.expr(f"case when {ok} then doc_id else 0 end")).alias(
            "id_sum_final"
        ),
    )
