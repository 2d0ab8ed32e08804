"""Corpus-quality and retrieval operators over the ``documents`` table
(north-star LLM-pipeline surface, SURVEY §2.9 continuation): TF-IDF top
terms, BM25 keyword search, Gopher-style repetition filtering, and
train/val contamination checking (decontamination).

These extend the text-analysis family (``operators/text.py``) with the
four remaining staples of a production training-data pipeline:

- term salience (``tfidf_topterms``): the inverted-index build — explode
  to (doc, term), two-level aggregation, per-doc top-k window;
- keyword retrieval (``bm25_search``): map-only per-doc term frequencies
  (HOF folds, NO explode) × one broadcast corpus-stats row;
- repetition filtering (``repetition_topgram``): the Gopher/MassiveText
  most-frequent-2-gram fraction (Rae et al. 2021, §A1.1.2) — docs whose
  top bigram dominates are boilerplate/spam candidates;
- decontamination (``contamination_check``): n-gram overlap between the
  train and validation splits of the deterministic splitter — the
  benchmark-leakage audit every eval pipeline needs.

Float determinism: every scoring formula here is built exclusively from
``+ - * /`` on identically-typed operands with parenthesized, identical
expression trees on both engines. IEEE 754 requires those operators to be
correctly rounded, so Spark and DuckDB produce bit-identical doubles and
the driver's repr()-exact value hash matches. This is why ``bm25_search``
uses the rational Robertson idf ``(N - df + 0.5) / (df + 0.5)`` WITHOUT
the conventional log: ``ln`` is a transcendental whose last ulp is
implementation-defined, so a logged variant could not be oracle-checked
exactly (ranking is order-preserved either way since log is monotone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table
from iceberg_examples_spark.checkpointing import stage
from iceberg_examples_spark.functions.texthash import (
    md5_int_hash,
    tokens_expr,
    train_val_split_sql,
)

# BM25 constants (conventional values), pre-folded so both engines see
# the same literals: k1=1.2, b=0.75, (k1+1)=2.2, (1-b)=0.25.
BM25_QUERY_TERMS = ["table", "merge", "spark", "join"]
BM25_TOPK = 20

# Gopher repetition gate: docs whose most frequent word-bigram exceeds
# this fraction of all bigrams are flagged (MassiveText uses 0.2 on
# real web text; the synthetic word-soup corpus needs a tighter bar to
# exercise both branches of the flag).
REPETITION_MAX_FRAC = 0.03

# Contamination shingle width (tokens). 3 is deliberately small for the
# ~30-word synthetic vocabulary so chance overlap plus planted near-dups
# both surface; production decontamination uses 8-13 (e.g. GPT-3 used 13).
CONTAM_NGRAM = 3


def bm25_term_score_sql(t: str) -> str:
    """Per-term BM25 partial score over columns ``tf_<t>``, ``dl``,
    ``df_<t>``, ``nd``, ``avgdl`` (all DOUBLE). Plain SQL arithmetic —
    the SAME string is evaluated by Spark and DuckDB so the double
    result is bit-identical (see module docstring)."""
    return (
        f"(((nd - df_{t}) + 0.5) / (df_{t} + 0.5)) * "
        f"((tf_{t} * 2.2) / (tf_{t} + 1.2 * (0.25 + 0.75 * (dl / avgdl))))"
    )


def bm25_total_sql() -> str:
    """Fixed left-to-right sum of the per-term scores (pinned
    association order — double addition is not associative)."""
    return " + ".join(bm25_term_score_sql(t) for t in BM25_QUERY_TERMS)


def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    Plan shape (the inverted-index build, linear at any scale): explode
    tokens → (doc, term) counts → vocabulary doc-frequencies → score →
    per-doc top-k window. The corpus size joins in as a one-row aggregate
    (auto-broadcast), never a driver-side collect. Score is the rational
    ``tf * N / df`` (idf without log — monotone-equivalent ranking,
    bit-exact across engines; see module docstring).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.expr(tokens_expr("text"))).alias("term")
    )
    # (single tokenizer occurrence — no with_tokens factoring needed)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(ndocs)  # 1 row — broadcast nested loop, no shuffle
        .withColumn("score", F.expr("cast(tf as double) * n_docs / df"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "score", "rk")
    )


def bm25_ranked(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """(doc_id, bm25) for the fixed query terms, top-``k`` by
    (bm25 DESC, doc_id) — the ONE construction of the BM25 score text,
    shared by ``bm25_search`` and ``hybrid_rrf_search`` so the scoring
    expression (which must stay bit-identical to its DuckDB oracle
    twin) can never drift between the two.

    Scale design: per-term tf and doc length are HOF folds inside ONE
    map-only projection over the corpus — no explode, no shuffle of the
    documents themselves. Corpus statistics (N, avgdl, per-term df) are a
    single aggregated row cross-joined back (broadcast). The only
    corpus-wide movement is the final top-k, which AQE executes as a
    partial per-partition top-k + single-reducer merge. At 100 TB this is
    one pass over the data plus kilobytes of coordination.
    """
    from iceberg_examples_spark.operators.text import with_tokens

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    per_doc = docs.select(
        "doc_id",
        F.expr("cast(size(tk) as double)").alias("dl"),
        *[
            F.expr(
                f"cast(size(filter(tk, x -> x = '{t}')) as double)"
            ).alias(f"tf_{t}")
            for t in BM25_QUERY_TERMS
        ],
    )
    stats = per_doc.agg(
        F.expr("cast(count(*) as double)").alias("nd"),
        F.expr("sum(dl) / cast(count(*) as double)").alias("avgdl"),
        *[
            F.expr(
                f"cast(sum(case when tf_{t} > 0 then 1 else 0 end) as double)"
            ).alias(f"df_{t}")
            for t in BM25_QUERY_TERMS
        ],
    )
    # Per-term partial scores (absent terms contribute exactly 0.0: the
    # numerator is 0, the denominator strictly positive) summed in pinned
    # left-to-right order — the identical expression string runs on the
    # oracle side, so the double result is bit-identical.
    scored = per_doc.crossJoin(stats).select(
        "doc_id", F.expr(f"({bm25_total_sql()})").alias("bm25")
    )
    return (
        scored.filter(F.col("bm25") > 0.0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (rational-idf variant) for a fixed query,
    top-20 docs. See :func:`bm25_ranked` for the construction."""
    return bm25_ranked(spark, sf_dir, BM25_TOPK)


def repetition_topgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metric: fraction of all word-bigrams taken
    by the single most frequent bigram, with the quality flag.

    Plan: bigram explode → (doc, gram) counts → per-doc max/sum. Two
    narrow aggregations over the exploded stream; the heavy token work is
    in the first map stage. Exact rational fraction → bit-stable flag.
    """
    from iceberg_examples_spark.operators.text import with_tokens

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    bigrams = (
        docs.filter(F.expr("size(tk) >= 2"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), "
                    "i -> concat(element_at(tk, i), ' ', "
                    "element_at(tk, i + 1)))"
                )
            ).alias("gram"),
        )
    )
    counts = bigrams.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.max("cnt").alias("top_count"),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "top_count",
        F.expr("cast(top_count as double) / n_bigrams").alias("top_frac"),
        F.expr(
            f"cast(top_count as double) / n_bigrams > {REPETITION_MAX_FRAC}"
        ).alias("flagged"),
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination audit: train-split docs sharing at least one
    {CONTAM_NGRAM}-token shingle with ANY validation-split doc, with the
    count of distinct shared shingle hashes per contaminated doc.

    The split is the engine's deterministic hash split
    (``train_val_split_sql`` — identical membership to the
    ``train_test_split`` operator), so this is a true self-audit of the
    pipeline's own leakage. Shingles are 60-bit md5 hashes, NOT strings:
    the join shuffles 8-byte keys no matter how long the documents are.
    The val side is dropped to distinct hashes and broadcast — the
    benchmark/holdout side of a decontamination pass is orders of
    magnitude smaller than the train corpus (here 10%, in production a
    fixed eval suite), which turns the audit into one map-side hash join
    over the train shingle stream.
    """
    from iceberg_examples_spark.operators.text import with_tokens

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    n = CONTAM_NGRAM
    shingle_str = f"concat_ws(' ', slice(tk, i, {n}))"
    shingled = docs.filter(F.expr(f"size(tk) >= {n}")).select(
        "doc_id",
        F.expr(train_val_split_sql("doc_id")).alias("split"),
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, size(tk) - {n - 1}), "
                f"i -> {md5_int_hash(shingle_str)}))"
            )
        ).alias("sh"),
    )
    train = shingled.filter(F.col("split") == "train")
    val_hashes = (
        shingled.filter(F.col("split") == "val").select("sh").distinct()
    )
    return (
        train.join(F.broadcast(val_hashes), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
    )


def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM quality gate (the KenLM-style statistical
    filter, MLE without smoothing — the corpus scores itself): each
    document's score is the average conditional probability of its
    bigrams under corpus counts, P(w2|w1) = c(w1 w2) / c(w1 ·), so
    documents full of rare transitions (gibberish, boilerplate mashes)
    score low. Arithmetic is exact for the cross-engine hash: each bigram
    contributes ``c2 * 10^6 div c1`` (integer division — identical floor
    semantics in Spark's ``div`` and DuckDB's ``//``), and the per-doc
    aggregate is a BIGINT sum + count, so no float log or division-order
    effect can diverge.

    Plan (the inverted-index shape, linear at scale): one explode to
    bigram rows; the bigram count aggregate; the CONTEXT counts derived
    from the bigram counts (c(w1·) = Σ_w2 c(w1,w2) — algebraically
    identical and |vocab|²-bounded input, so the corpus is never
    re-tokenized for the second statistic); join back on the bigram key;
    per-doc sum. The corpus tokenize+explode runs twice (count-build and
    probe sides of the self-join) — at production scale the probe side
    re-reads the staged bigram relation instead; the count tables are
    vocab-bounded and the context side broadcasts."""
    from iceberg_examples_spark.operators.text import with_tokens

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    big = (
        docs.filter(F.expr("size(tk) >= 2"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), i -> "
                    "struct(element_at(tk, i) as w1, "
                    "element_at(tk, i + 1) as w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    bgc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = bgc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        big.join(bgc, ["w1", "w2"])
        .join(ctx, "w1")
        .withColumn("p_scaled", F.expr("c2 * 1000000 div c1"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_scaled").alias("p_scaled_sum"),
        )
        .withColumn("avg_p_scaled", F.expr("p_scaled_sum div n_bigrams"))
    )


VOCAB_SIZE = 1000


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: induce the top-VOCAB_SIZE vocabulary
    by global occurrence count (ties broken lexicographically, so the cut
    is fully deterministic) and report per-language OOV statistics —
    the analysis that sizes a tokenizer's vocab against a corpus (what
    fraction of token OCCURRENCES fall outside the vocab, per language).

    Plan: one explode→count aggregate (map-side combine reduces each
    partition to its distinct tokens before the shuffle), a top-V via
    TakeOrdered (V rows to the driver side of the plan, never the corpus),
    then the vocab — kilobytes — broadcasts back onto the token stream
    for a map-only membership tag and a per-language aggregate. At 100 TB
    the only corpus-sized exchange is the (token, count) aggregate."""
    from iceberg_examples_spark.operators.text import with_tokens

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    tokens = docs.select("lang", F.explode("tk").alias("token"))
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        counts.orderBy(F.desc("n"), F.asc("token"))
        .limit(VOCAB_SIZE)
        .select("token")
        .withColumn("in_vocab", F.lit(1))
    )
    tagged = tokens.join(F.broadcast(vocab), "token", "left")
    return tagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.sum(
            F.expr("case when in_vocab is null then 1 else 0 end")
        ).alias("oov_tokens"),
        F.count_distinct(
            F.expr("case when in_vocab is null then token end")
        ).alias("oov_types"),
    )


BPE_TOPN = 20


def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full iteration of BPE tokenizer training, relationally — the
    distributed hot loop of fitting a subword vocabulary on a corpus:

    1. word-frequency table (the classical optimization: after one
       corpus-scale token count, every BPE iteration runs over the
       VOCABULARY — thousands of rows weighted by count — never the
       corpus again);
    2. frequency-weighted adjacent character-pair counts (explode +
       groupBy of 2-char keys, map-side combined);
    3. the merge choice: argmax pair, count-desc / pair-asc tie-break
       (deterministic, as real BPE trainers specify);
    4. the merge APPLIED — non-overlapping left-to-right, BPE's exact
       rule, which is precisely the semantics of string ``replace``
       (both engines replace left-to-right non-overlapping): the merged
       pair becomes sentinel '_' (impossible in [a-z0-9]+ tokens);
    5. post-merge pair counts — the next iteration's input.

    Output: the BPE_TOPN post-merge pairs (rendered with the sentinel
    expanded back to the merged symbol) plus the chosen merge itself as
    rank-0 rows. A K-merge trainer is a driver loop over exactly this
    query shape with the growing sentinel alphabet; the per-iteration
    cost stays O(vocabulary), which is what makes BPE training cheap
    even on a 100 TB corpus — the corpus is touched once, in step 1."""
    from iceberg_examples_spark.functions.texthash import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.expr(tokens_expr("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    pair_of = (
        "transform(sequence(1, length({col}) - 1), "
        "i -> substring({col}, i, 2))"
    )
    pairs1 = (
        words.filter(F.expr("length(w) >= 2"))
        .select("n_w", F.explode(F.expr(pair_of.format(col="w"))).alias("p"))
        .groupBy("p")
        .agg(F.sum("n_w").alias("cnt"))
    )
    top = F.broadcast(
        pairs1.orderBy(F.desc("cnt"), F.asc("p")).limit(1).select(
            F.col("p").alias("merge_pair"), F.col("cnt").alias("merge_cnt")
        )
    )
    merged = words.crossJoin(top).select(
        "n_w",
        F.expr("replace(w, merge_pair, '_')").alias("w2"),
        "merge_pair",
    )
    pairs2 = (
        merged.filter(F.expr("length(w2) >= 2"))
        .select(
            "n_w",
            "merge_pair",
            F.explode(F.expr(pair_of.format(col="w2"))).alias("p"),
        )
        .groupBy("merge_pair", "p")
        .agg(F.sum("n_w").alias("cnt"))
        .select(
            "merge_pair",
            F.expr("replace(p, '_', merge_pair)").alias("pair"),
            "cnt",
        )
    )
    ranked = (
        pairs2.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("pair"))
            ).cast("bigint"),
        )
        .filter(F.col("rank") <= BPE_TOPN)
        .select("rank", "pair", "cnt", "merge_pair")
    )
    chosen = top.select(
        F.lit(0).cast("bigint").alias("rank"),
        F.col("merge_pair").alias("pair"),
        F.col("merge_cnt").alias("cnt"),
        "merge_pair",
    )
    return chosen.unionByName(ranked)


def fit_bpe(spark: SparkSession, sf_dir: str, k: int) -> list[str]:
    """The K-merge BPE trainer the bpe_merge_step docstring promises: a
    driver loop over exactly that query shape — per iteration one
    weighted pair count over the (tiny) vocabulary and one argmax, with
    each learned merge applied via the same left-to-right replace rule,
    sentinelled into a private-use alphabet so later merges can span
    earlier ones (real BPE's growing symbol set). Returns the learned
    merge list in order (each rendered back to its base characters).

    Scale posture: the corpus is scanned ONCE (word-frequency table,
    staged); every iteration after that is O(vocabulary) — pair
    explode + groupBy over thousands of weighted words — which is why
    BPE training is cheap even on a 100 TB corpus. The declared query
    (bpe_merge_step) hash-verifies one full iteration cross-engine;
    this loop is unit-tested for the multi-merge contract
    (tests/test_bpe_trainer.py): merges can chain (a learned symbol
    participates in a later pair) and each merge strictly reduces the
    corpus symbol count."""
    from iceberg_examples_spark.functions.texthash import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    words = stage(
        docs.select(F.explode(F.expr(tokens_expr("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w")),
        "bpe-vocab",
    )
    # sentinel alphabet for learned symbols: private-use plane chars,
    # impossible in [a-z0-9]+ tokens
    sentinels = [chr(0xE000 + i) for i in range(k)]
    rendering: dict[str, str] = {}
    merges: list[str] = []
    pair_of = (
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
    )
    for step in range(k):
        top = (
            words.filter(F.expr("length(w) >= 2"))
            .select(
                "n_w", F.explode(F.expr(pair_of)).alias("p")
            )
            .groupBy("p")
            .agg(F.sum("n_w").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair = top[0]["p"]
        sent = sentinels[step]
        rendered = "".join(rendering.get(c, c) for c in pair)
        rendering[sent] = rendered
        merges.append(rendered)
        words = stage(
            words.select(
                F.expr(
                    "replace(w, '"
                    + pair.replace("'", "\\'")
                    + f"', '{sent}') as w"
                ),
                "n_w",
            ),
            f"bpe-merge-{step}",
        )
    return merges


def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus health report — the one-page dashboard a curation run
    opens with, per language: document and token volume, quality-gate
    pass count (the shared 4-point heuristic), content uniqueness
    (distinct texts — exact-dup pressure), and vocabulary size (distinct
    tokens — diversity). Every column is an exact integer; every
    expression is the already-verified standalone operator's fragment,
    so the report and the operators cannot drift.

    Plan: the tokens materialize once; volume/quality/uniqueness are one
    grouped aggregate over the corpus scan; vocabulary size is the one
    genuinely separate shape (distinct over exploded tokens — at 100 TB
    this is the HLL sketch's job, see hll_distinct; exact here because
    the oracle must cross engines)."""
    from iceberg_examples_spark.operators.llm_pipeline import QUALITY_MIN
    from iceberg_examples_spark.operators.text import with_quality_metrics

    docs = with_quality_metrics(load_table(spark, sf_dir, "documents"))
    base = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(
            F.expr(f"case when quality >= {QUALITY_MIN} then 1 else 0 end")
        ).alias("n_quality_pass"),
        F.count_distinct("text").alias("n_distinct_texts"),
    )
    vocab = (
        docs.select(
            "lang", F.explode(F.expr(tokens_expr("text"))).alias("tok")
        )
        .groupBy("lang")
        .agg(F.count_distinct("tok").alias("vocab_size"))
    )
    return base.join(vocab, "lang")


# ---- DSIR importance weights ---------------------------------------------

DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"
DSIR_RATIO_SCALE = 1_000_000


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    hashed unigram features fit a target distribution (the English
    slice) against the raw corpus, and every document is weighted by
    how target-like its feature profile is — the importance weights a
    pretraining mixture samples by. Deviation from the paper, stated
    out loud: per-token contributions are the SCALED PROBABILITY RATIO
    ``c_t(b)·10⁶ div c_r(b)`` summed per doc (integer division), not
    the sum of float log-ratios — log is not bit-stable across
    engines, the ratio-sum is monotone per bucket, and the constant
    corpus-size factor N_r/N_t drops out of any ranking. Shape at
    scale: the bucket table is ≤ 256 rows (broadcast); the corpus is
    tokenized once and aggregated per bucket — one shuffle on a
    256-key column, then a per-doc sum."""
    from iceberg_examples_spark.functions.texthash import md5_int_hash
    from iceberg_examples_spark.operators.text import with_tokens

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "lang", F.explode("tk").alias("t")
    ).withColumn(
        "b", F.expr(f"{md5_int_hash('t')} % {DSIR_BUCKETS}")
    )
    # ONE conditional aggregate yields both distributions: cr = all
    # tokens per bucket, ct = target-language tokens per bucket. The
    # former raw-vs-target formulation tokenized and exploded the whole
    # corpus TWICE and joined the two 256-row aggregates back together;
    # tgt ⊆ raw by construction, so the left join + fill(0) is exactly
    # sum(case when target)=0 — one full pass and one join removed
    # (guide §2.4: don't run two passes over the same data for two
    # aggregates of it). Integer arithmetic unchanged.
    scores = (
        tok.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.sum(
                F.expr(
                    f"case when lang = '{DSIR_TARGET_LANG}' "
                    "then 1 else 0 end"
                )
            ).alias("ct"),
        )
        .withColumn(
            "s", F.expr(f"ct * {DSIR_RATIO_SCALE} div cr")
        )
        .select("b", "s")
    )
    per_doc = (
        tok.join(F.broadcast(scores), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("s").alias("w_sum"),
            F.count(F.lit(1)).alias("n_tok"),
        )
        .withColumn("weight", F.expr("w_sum div n_tok"))
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("sum(weight) div count(1)").alias("avg_weight"),
            F.max("weight").alias("max_weight"),
            F.min("weight").alias("min_weight"),
        )
        .orderBy("lang")
    )
