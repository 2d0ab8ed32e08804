"""Text-analysis operators over the ``documents`` table (north-star
extension surface, SURVEY §2.9): token counting, language ID, quality
scoring, document fingerprinting.

SimHash follows Charikar 2002 (random-hyperplane rounding, the
word-hash-bit voting variant popularized for web near-dup detection by
Manku et al. 2007).

Scale design: every op here is a *per-row projection* — no explode, no
shuffle, no UDF. Token arrays are built and folded inside one whole-stage
codegen'd projection via higher-order functions (``transform`` /
``filter`` / ``aggregate``), so a 100 TB documents table streams through
map-only tasks. The only shuffles in this module are the final tiny
aggregations where a query's contract asks for grouped output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table
from iceberg_examples_spark.functions.texthash import (
    REMIX_MOD,
    char_poly_hash,
    md5_int_hash,
    remix,
    tokens_expr,
)

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deterministic and mirrored verbatim in the DuckDB oracle.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "en", "que", "los"],
    "de": ["der", "die", "das", "und", "ist", "von"],
    "fr": ["le", "les", "de", "et", "la", "des"],
    "zh": ["de", "shi", "le", "zai", "he"],
}
LANG_ORDER = ["en", "es", "de", "fr", "zh"]  # argmax tie-break order


def _sw_array(lang: str) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + ")"


def with_tokens(docs: DataFrame, col: str = "text", out: str = "tk") -> DataFrame:
    """Materialize the token array as a column BEFORE any lambda uses it.

    Inlining ``tokens_expr`` k times inside higher-order-function lambdas
    multiplies the expression tree k-fold, and Catalyst's analysis/
    optimization passes are super-linear in tree size — measured at sf0.1,
    a projection with the tokenizer inlined 4× inside ``transform`` costs
    ~7 s of pure PLANNING time vs ~0.2 s execution; factoring the tokens
    through one Project cuts rebuild latency ~8×. Execution cost is
    unchanged (the column is fused into the same whole-stage-codegen
    pipeline); this is about plan-build time, which recurs on every fresh
    query (interactive use, the driver gate, the bench)."""
    return docs.withColumn(out, F.expr(tokens_expr(col)))


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (alnum runs) per document.
    Both counts are higher-order-function folds — map-only at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"cast(size({tokens_expr('text')}) as bigint)").alias("n_tokens"),
        F.expr(
            "cast(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) as bigint)"
        ).alias("n_re_tokens"),
        F.length("text").cast("bigint").alias("n_chars_seen"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language heuristic: score = # token occurrences in
    each language's stopword list; prediction = argmax with a fixed
    tie-break order. (The synthetic corpus is English-ish word soup, so
    'en' dominates — the point is the deterministic scoring machinery.)"""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            F.expr(
                f"cast(size(filter(tk, t -> array_contains({_sw_array(lang)}, t))) as bigint)"
            ).alias(f"score_{lang}")
            for lang in LANG_ORDER
        ],
    )
    # argmax with LANG_ORDER tie-break: first lang whose score equals the max
    scored = scored.withColumn(
        "__max", F.greatest(*[F.col(f"score_{lang}") for lang in LANG_ORDER])
    )
    pred_expr = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        pred_expr = F.when(
            F.col(f"score_{lang}") == F.col("__max"), F.lit(lang)
        ).otherwise(pred_expr)
    return scored.withColumn("pred_lang", pred_expr).drop("__max")


def with_quality_metrics(docs: DataFrame) -> DataFrame:
    """Append the quality-metric columns to any (text, ...) DataFrame —
    pure per-row expressions, map-only, no extra scan. Shared by the
    quality_score declared query and the llm_prep_pipeline quality gate
    (one definition, so the gate and the standalone score cannot drift).
    Tokens are factored through one materialized column (see
    :func:`with_tokens`) and dropped before returning."""
    sw = _sw_array("en")
    return with_tokens(docs, out="__qtk").withColumns(
        {
            "n_tokens": F.expr("cast(size(__qtk) as bigint)"),
            "avg_token_len": F.expr(
                "cast(aggregate(__qtk, 0L, (acc, t) -> acc + length(t)) as double)"
                " / cast(size(__qtk) as double)"
            ),
            "stopword_ratio": F.expr(
                f"cast(size(filter(__qtk, t -> array_contains({sw}, t))) as double)"
                " / cast(size(__qtk) as double)"
            ),
            "alnum_ratio": F.expr(
                "cast(size(regexp_extract_all(lower(text), '[a-z0-9]', 0)) as double)"
                " / cast(length(text) as double)"
            ),
        }
    ).drop("__qtk").withColumn(
        "quality",
        F.expr(
            "cast(cast(n_tokens >= 10 as int) + cast(n_tokens <= 2000 as int)"
            " + cast(avg_token_len >= 2.0 as int)"
            " + cast(stopword_ratio >= 0.01 as int) as bigint)"
        ),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: token count band, average token length,
    stopword ratio, alnum ratio → integer score 0-4. All ratios are
    int/int divisions (deterministic doubles across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    return with_quality_metrics(docs).select(
        "doc_id",
        "n_tokens",
        "avg_token_len",
        "stopword_ratio",
        "alnum_ratio",
        "quality",
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: polynomial rolling hash of the
    raw text (identity fingerprint — equal texts ⇒ equal fingerprints) plus
    a remixed variant. Map-only; at 100 TB this is the cheap first pass of
    exact dedup (group by fingerprint instead of by full text)."""
    docs = load_table(spark, sf_dir, "documents")
    h = char_poly_hash("text")
    return docs.select(
        "doc_id",
        F.expr(h).alias("fingerprint"),
        F.expr(remix(h)).alias("fingerprint_mix"),
    )


def simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: token → md5-int → remix → each bit
    votes ±1; fingerprint bit i = sign of the vote sum. Near-duplicate
    texts differ in few bits (popcount of XOR downstream). Computed in an
    Arrow-batched mapInPandas stage (operators/signatures.py) — identical
    values to :func:`simhash16_sql`, ~5× faster."""
    from iceberg_examples_spark.operators.signatures import simhash_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(docs, n_bits=16)


def simhash16_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst SimHash (the oracle-shaped spec): one ``aggregate``
    fold per bit over the token-hash array — no explode, no shuffle.
    Correct at any scale but HOF lambdas are interpreted per element;
    the mapInPandas twin above is the hot path."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    tok_hash = remix(f"{md5_int_hash('t')} % {REMIX_MOD}")
    # materialize the hashed-token array once — inlining it into all 16
    # bit folds would blow the plan-analysis time up 16× (see with_tokens)
    hashed = docs.select(
        "doc_id", F.expr(f"transform(tk, t -> {tok_hash})").alias("th")
    )
    bit_sums = [
        F.expr(
            f"aggregate(th, 0L, (acc, h) -> acc + "
            f"(case when h % {2 ** (i + 1)} >= {2 ** i} then 1 else -1 end))"
        ).alias(f"bit{i}")
        for i in range(16)
    ]
    with_bits = hashed.select("doc_id", *bit_sums)
    fp = None
    for i in range(16):
        term = F.when(F.col(f"bit{i}") >= 0, F.lit(2**i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return with_bits.select(
        "doc_id", fp.cast("bigint").alias("simhash")
    )


def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLODE/unnest surface: global token frequencies (top-20, tie-broken
    by token). The one text op where explode is the right tool — the
    aggregation needs cross-document state, so a shuffle on the token is
    inherent; partial aggregation keeps it one round."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_expr("text")
    return (
        docs.select(F.explode(F.expr(toks)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


def chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4): split each document into 32-word
    chunks via a user-defined TABLE function in a LATERAL join — the
    row-expanding shape (one input row -> N output rows with custom
    logic) that scalar UDFs can't express. The reference has no UDFs of
    any kind (SURVEY §2.8); this completes the UDF/UDAF/UDTF coverage
    triple alongside grouped_median_pandas (UDAF) and the mapInPandas
    stages (UDF).

    Posture: UDTFs are Python-side — the slow path. This op is genuinely
    custom row expansion (the chunking loop); anything expressible with
    explode/split built-ins should use those (see explode_tokens). The
    chunking here is also exactly what an LLM-ingest pipeline does before
    tokenization, so the demo is the real operator, not a toy.

    At scale: UDTF evaluation is per-partition streaming (no state, no
    shuffle); the plan is scan -> Generate -> project."""
    import re

    from pyspark.sql.functions import udtf

    from iceberg_examples_spark.catalog import register_views

    @udtf(returnType="chunk_idx int, chunk_text string, n_words int")
    class ChunkDoc:
        def eval(self, text: str):
            # explicit ASCII class: Python's \s is Unicode-aware, RE2's is
            # ASCII-only — the shared class pins identical semantics
            words = [
                w for w in re.split(r"[ \t\n\r\f\v]+", text or "") if w
            ]
            for i in range(0, len(words), 32):
                chunk = words[i : i + 32]
                yield i // 32, " ".join(chunk), len(chunk)

    spark.udtf.register("chunk_doc", ChunkDoc)
    register_views(spark, sf_dir, tables=["documents"])
    return spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_words
        FROM documents d, LATERAL chunk_doc(d.text) c
    """)
