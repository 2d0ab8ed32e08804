"""Corpus scrubbing / curation operators over the ``documents`` table
(SURVEY §2.9 continuation): PII redaction, paragraph-level exact dedup,
and language-balanced stratified sampling.

Three more staples of a production training-data pipeline, each expressed
as a declarative DataFrame plan with a DuckDB oracle twin:

- :func:`pii_scrub` — regex redaction of emails / phone numbers. The
  synthetic corpus contains no PII, so the query first *plants*
  deterministic PII derived from ``doc_id`` (both engines plant the same
  strings), then scrubs it back out — which makes the redaction
  observable and the oracle meaningful: the scrub must find exactly the
  planted occurrences, and the cleaned text must hash identically.
- :func:`paragraph_dedup` — exact dedup at sub-document granularity:
  split each document into fixed-width token windows ("paragraphs"),
  keep the globally-first occurrence of each distinct paragraph
  (ordered by doc_id, then position), and report per-document survival.
  This is the within-corpus boilerplate-removal pass (headers, footers,
  licence blocks) that document-level dedup cannot catch.
- :func:`stratified_sample_lang` — language-balanced downsampling: every
  language keeps ~``min_lang_count`` documents via a hash-pure integer
  rule, the standard mixture-rebalancing step before training.

Scale notes (100 TB design):

- ``pii_scrub`` is map-only: one projection, no shuffle, whole-stage
  codegen end-to-end. Regexes are anchored character classes (linear
  scan, no catastrophic backtracking).
- ``paragraph_dedup`` shuffles only (hash, doc_id, pos) triples — 24
  bytes per paragraph regardless of text size — and the keep-first rule
  is a window over the 60-bit hash (equivalently a groupBy-argmin, which
  AQE executes with partial aggregation). Text never moves.
- ``stratified_sample_lang`` aggregates per-language counts (|langs|
  rows), broadcasts them back, and filters map-side: one tiny shuffle +
  one map pass. Membership is a pure function of (doc_id, lang count),
  so the sample is reproducible on reruns and backfills.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table
from iceberg_examples_spark.checkpointing import persisted_index, stage
from iceberg_examples_spark.functions.texthash import md5_int_hash

# Paragraph width (tokens) for sub-document dedup. Real pipelines split on
# '\n\n'; the synthetic corpus is one line, so fixed token windows stand in
# for paragraph boundaries (the plan is identical either way: only the
# splitter expression changes).
PARA_TOKENS = 20

# Small modulus keeping per-doc hash sums well inside BIGINT.
PARA_SUM_MOD = 1_000_003

# Regexes shared with the DuckDB oracle (same RE2/Java-compatible subset:
# character classes + quantifiers only, no backrefs/lookaround).
EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PHONE_RE = "555-[0-9]{4}"


def _spark_re(pattern: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal: Spark's
    literal parser consumes one level of backslash escaping (so '\\.'
    would reach the regex engine as a bare '.', silently matching any
    character while the DuckDB twin matches a literal dot). Doubling the
    backslashes makes both engines execute the same pattern."""
    return pattern.replace("\\", "\\\\")


def _with_tokens(docs: DataFrame) -> DataFrame:
    """Tokens materialized once as column ``tk`` (plan-build cost: see
    operators/text.py::with_tokens)."""
    from iceberg_examples_spark.operators.text import with_tokens

    return with_tokens(docs)


# Fixed-width token windows over the materialized ``tk`` column (shared by
# paragraph_dedup and the curation capstones).
_PARA_TRANSFORM = (
    f"transform(sequence(1, cast(ceil(size(tk) / "
    f"cast({PARA_TOKENS} as double)) as int)), "
    f"i -> concat_ws(' ', slice(tk, (i - 1) * {PARA_TOKENS} + 1, "
    f"{PARA_TOKENS})))"
)


def _paras(docs: DataFrame) -> DataFrame:
    """(doc_id, para_idx, h): the paragraph explode+hash stage shared by
    paragraph_dedup and both curation pipelines — one source of truth for
    the window/hash formulation (the oracle twins mirror it once)."""
    return docs.filter(F.expr("size(tk) >= 1")).select(
        "doc_id",
        F.posexplode(F.expr(_PARA_TRANSFORM)).alias("para_idx", "para"),
    ).select("doc_id", "para_idx", F.expr(md5_int_hash("para")).alias("h"))


def _repetition_gate(docs: DataFrame, staged: bool = True) -> DataFrame:
    """doc_ids passing the Gopher top-bigram repetition gate (same
    formulation as llm_quality.repetition_topgram). By default the gate
    is materialized eagerly: the output is one bigint per surviving doc,
    and callers with multiple consuming branches would otherwise re-run
    the bigram explode+aggregate subtree per branch. Pass ``staged=False``
    when the CALLER checkpoints the joined result instead (the incremental
    pipeline stages the gated batch WITH its text, so staging the bare ids
    too would be a wasted job)."""
    from iceberg_examples_spark.operators.llm_quality import (
        REPETITION_MAX_FRAC,
    )

    # Formulation note (measured, round 5): a shuffle-free per-row fold
    # (top count = longest equal-adjacent run in the array_sort'ed bigram
    # array) is expressible with HOFs, but Spark evaluates HOF lambdas
    # interpreted — at sf0.1 it ran the full-corpus gate ~4× SLOWER than
    # this explode+groupBy, which stays inside whole-stage codegen with
    # map-side partial aggregation. The shuffle rows are (doc_id, gram,
    # cnt) — bounded by distinct bigrams per doc — and all of a doc's
    # rows co-locate, so the agg is one exchange of narrow rows; that is
    # the right trade until HOFs codegen.
    bigrams = docs.filter(F.expr("size(tk) >= 2")).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1), "
                "i -> concat(element_at(tk, i), ' ', "
                "element_at(tk, i + 1)))"
            )
        ).alias("gram"),
    )
    gate = (
        bigrams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_bigrams"), F.max("cnt").alias("top_count"))
        .filter(
            F.expr(
                f"cast(top_count as double) / n_bigrams <= {REPETITION_MAX_FRAC}"
            )
        )
        .select("doc_id")
    )
    return stage(gate, "repetition-gate") if staged else gate


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant deterministic PII into each document, then redact it.

    Output: planted-occurrence counts found by the scrubber plus the md5
    of the cleaned text — the oracle plants the identical strings and
    must observe identical counts and identical cleaned bytes.
    """
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.expr(
            "concat(text, ' contact user', cast(doc_id % 50 as string), "
            "'@example.com or 555-', "
            "lpad(cast(doc_id % 10000 as string), 4, '0'))"
        ).alias("dirty"),
    )
    email_re, phone_re = _spark_re(EMAIL_RE), _spark_re(PHONE_RE)
    return planted.select(
        "doc_id",
        F.expr(f"cast(regexp_count(dirty, '{email_re}') as bigint)").alias(
            "n_emails"
        ),
        F.expr(f"cast(regexp_count(dirty, '{phone_re}') as bigint)").alias(
            "n_phones"
        ),
        F.expr(
            f"md5(regexp_replace(regexp_replace(dirty, '{email_re}', "
            f"'<EMAIL>'), '{phone_re}', '<PHONE>'))"
        ).alias("clean_md5"),
        F.expr("cast(length(dirty) as bigint)").alias("dirty_len"),
    )


def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup over fixed-width token windows.

    Keep rule: a paragraph survives iff (doc_id, para_idx) is the
    lexicographically-first occurrence of its 60-bit hash corpus-wide.
    Output per document: paragraphs, survivors, and a bounded hash-sum
    fingerprint of the surviving set.
    """
    docs = _with_tokens(load_table(spark, sf_dir, "documents"))
    paras = _paras(docs)
    w = Window.partitionBy("h").orderBy("doc_id", "para_idx")
    kept = (
        paras.withColumn("rk", F.row_number().over(w))
        .withColumn("is_first", F.col("rk") == 1)
        .drop("rk")
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.expr("case when is_first then 1 else 0 end")).alias("n_kept"),
        F.sum(
            F.expr(f"case when is_first then h % {PARA_SUM_MOD} else 0 end")
        ).alias("kept_fp"),
    )


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation capstone: the round-3 operators composed into one
    hash-checked pipeline, the curation half of a training-data prep run
    (the quality/dedup/split half is ``llm_prep_pipeline``):

        1. repetition gate   — drop docs whose top bigram exceeds
                               REPETITION_MAX_FRAC of all bigrams
                               (Gopher/MassiveText boilerplate rule);
        2. paragraph dedup   — within survivors, keep only globally-first
                               paragraphs (sub-document boilerplate);
        3. language rebalance — hash-pure stratified keep rule computed
                               over the SURVIVING corpus (rates must
                               reflect post-filter counts, not raw ones);
        4. corpus report     — per-language doc counts, paragraph
                               survival, and id-sum fingerprint.

    Plan shape: two explode→aggregate pipelines over the corpus (bigrams
    for the gate, token windows for the dedup) joined on doc_id, then two
    kilobyte-scale aggregations broadcast back for the rebalance. Each
    explode stream reduces to fixed-width keys before its shuffle; at
    100 TB nothing wider than (hash, doc_id, count) crosses the wire and
    no stage depends on corpus-wide ordering.
    """
    docs = _with_tokens(load_table(spark, sf_dir, "documents"))

    # stage 1: repetition gate (shared helper; checkpointed — three
    # consumers below)
    rep = _repetition_gate(docs)

    # stage 2: paragraph survival per doc (keep-first by global hash),
    # restricted to gate survivors via broadcast semi join (the gate
    # output is doc ids only — kilobytes per million docs)
    w = Window.partitionBy("h").orderBy("doc_id", "para_idx")
    survival = (
        _paras(docs).join(rep, "doc_id", "left_semi")
        .withColumn("rk", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.expr("case when rk = 1 then 1 else 0 end")).alias(
                "n_kept"
            ),
        )
    )

    # stage 3: language rebalance over the surviving corpus
    survivors = docs.join(rep, "doc_id", "left_semi").select("doc_id", "lang")
    lang_counts = survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_lang")
    )
    n_min = lang_counts.agg(F.min("n_lang").alias("n_min"))
    h = md5_int_hash("concat('curate#', cast(doc_id as string))")
    sampled = (
        survivors.join(F.broadcast(lang_counts), "lang")
        .crossJoin(F.broadcast(n_min))
        .filter(F.expr(f"({h}) % n_lang < n_min"))
    )

    # stage 4: corpus report
    return (
        sampled.join(survival, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_paras").alias("total_paras"),
            F.sum("n_kept").alias("kept_paras"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


def curation_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental recuration: process ONLY a newly-arrived batch against
    the already-curated corpus — the steady-state shape of a production
    crawl pipeline, where reprocessing the whole corpus per batch would
    be O(corpus) instead of O(delta).

    Fixture: the delta is ``doc_id % 10 == 7`` (a deterministic ~10%
    "new crawl"); the base is everything else, standing in for the
    curated store. The fixture additionally plants 10 cross-corpus
    near-dups INTO the delta (near-copies of base docs ``doc_id % 10 ==
    0, doc_id < 100`` at ``doc_id + 2000007`` — first word dropped, so
    every token window shifts and paragraph hashes DON'T match: exactly
    the boilerplate shape paragraph dedup misses and near-dup LSH
    catches).

    Stages, all delta-sized except the two index probes:

        1. repetition gate over the DELTA only;
        2. near-dup probe of the batch against the base corpus's
           persisted LSH index (``dedup.minhash_index``: fixed-width
           (mh0..8, band0..2) rows, staged via checkpointing.stage) —
           band-collision candidates verified by MinHash component
           agreement; a verified near-dup drops the batch doc. Base
           TEXT is never read and base signatures are never recomputed
           at probe time: the probe consumes only the index artifact
           (built once here from the fixture; in steady state the
           indexes are maintained by ``curation_index.CurationIndex``,
           whose ``append_batch`` writes accepted batch rows' own index
           entries as an O(batch) append — tested end-to-end in
           tests/test_curation_index.py: batch N's accepted docs are
           visible to batch N+1's probe);
        3. paragraph dedup of surviving paragraphs against the base
           paragraph-hash index — same probe discipline, 8-byte keys —
           then keep-first within the delta;
        4. per-language report: accepted docs, near-dup-dropped docs,
           fresh/kept paragraphs and id_sum over accepted docs only
           (a fully-paragraph-deduplicated survivor reports 0 kept).

    Scale: the corpus-sized objects are the two indexes, which join as
    fixed-width keys (shuffle or broadcast depending on size) — the
    delta never rescans base text, and base is never rewritten.
    """
    raw = load_table(spark, sf_dir, "documents")
    planted = raw.filter(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 100)
    ).select(
        (F.col("doc_id") + 2000007).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        "lang",
        "source",
    ).withColumn(
        # recompute from the DERIVED text (the planted copy drops its
        # first word) so the fixture row stays internally consistent
        "n_chars",
        F.length("text").cast("long"),
    )
    docs = _with_tokens(raw.unionByName(planted))
    is_delta = F.col("doc_id") % 10 == 7
    base = docs.filter(~is_delta)
    delta = docs.filter(is_delta)
    docs_file = os.path.join(sf_dir, "documents.parquet")
    return incremental_curate(
        spark, base, delta, [docs_file], base_tag="mod10ne7"
    )


def incremental_curate(
    spark: SparkSession,
    base: DataFrame,
    delta: DataFrame,
    index_deps: list[str],
    base_tag: str,
) -> DataFrame:
    """The incremental-curation core: gate + probe + report for an
    arbitrary (base, delta) pair — shared by the declared query (the
    %10 fixture above) and scripts/odelta_sweep.py, which holds the
    delta FIXED while the base grows 10× to demonstrate the O(delta)
    steady state. Both frames must carry (doc_id, text, lang) and a
    materialized ``tk`` column (``_with_tokens``). ``base_tag`` feeds
    the persisted-index fingerprint so two different base DEFINITIONS
    over the same input files can never share an artifact."""
    # stage 1: repetition gate over the delta, then checkpoint the GATED
    # BATCH — ids + text + lang + its own LSH index columns (mh*/band*)
    # — in ONE materialization job. Everything O(delta) and Arrow-bound
    # (the bigram gate explode, the MinHash signature stage) happens
    # exactly once here; the three consuming branches (probe, the
    # accepted/flagged split, the paragraph stage) read the checkpoint.
    # Before this fold the gate ids were staged separately and each
    # consumer re-scanned the corpus fixture and re-ran the semi join /
    # signature pass — at sf0.1 those repeats were ~40% of the warm
    # probe's wall clock.
    from iceberg_examples_spark.operators.dedup import (
        MOD,
        N_BANDS,
        N_MINHASH,
        ROWS_PER_BAND,
        lsh_index_probe,
        minhash_index,
    )

    gated_raw = delta.join(
        _repetition_gate(delta, staged=False), "doc_id", "left_semi"
    )
    # Explicit widen before the CPU-bound Arrow stage: the gate's output
    # is a post-shuffle frame that AQE coalesces to ~1 partition, which
    # would run the batch's signature computation on one core (wide=True's
    # spread() can't see this — a join's plan-size estimate is inflated).
    # The shuffle moved is the batch itself — delta-sized, trivial. keep=
    # carries text + lang THROUGH the Arrow stage, so the checkpoint holds
    # (row + index columns) without evaluating the gate subtree twice.
    batch_wide = gated_raw.repartition(
        spark.sparkContext.defaultParallelism
    )
    gated = stage(
        minhash_index(batch_wide, wide=False, keep=("text", "lang")),
        "gated-batch-indexed",
    )

    # stage 2: probe the base corpus's persisted LSH index with the
    # batch's checkpointed index columns — a pure JVM join; verified
    # near-dups are dropped from the batch. The base index is a
    # persisted_index ARTIFACT keyed on the documents file state: built
    # at most once per input, re-read (a plain parquet scan) by every
    # later invocation — the steady-state probe never recomputes base
    # signatures, which is what makes this query O(delta)

    # fingerprint = the parameters that determine index CONTENT, so a
    # definition change invalidates the artifact like a data change does
    lsh_fp = f"v1:mh{N_MINHASH}:b{N_BANDS}:r{ROWS_PER_BAND}:m{MOD}:{base_tag}"
    para_fp = f"v1:pt{PARA_TOKENS}:pm{PARA_SUM_MOD}:{base_tag}"
    # The two base-index artifacts are fully independent builds
    # (different labels, different content); on the COLD path build them
    # from a 2-thread driver pool so the paragraph-hash job back-fills
    # executors the LSH build's tail leaves idle (guide §2.6). On the
    # warm path both are cache hits and the pool is overhead-free.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _lsh_f = _pool.submit(
            persisted_index,
            spark,
            lambda: minhash_index(base.select("doc_id", "text")),
            "base-lsh-index",
            index_deps,
            lsh_fp,
        )
        _para_f = _pool.submit(
            persisted_index,
            spark,
            lambda: _paras(base).select("h").distinct(),
            "base-para-index",
            index_deps,
            para_fp,
        )
        base_lsh = _lsh_f.result()
        base_hashes = _para_f.result()
    batch_lsh = gated.select(
        "doc_id",
        *[f"mh{i}" for i in range(N_MINHASH)],
        *[f"band{b}" for b in range(N_BANDS)],
    )
    # staged: two downstream branches (the flagged split and the
    # accepted anti-join feeding the paragraph stage) consume the probe
    # result; without materialization each branch re-runs the probe join
    # against the CORPUS-sized base index. (Measured at sf0.1 the two
    # choices tie — the barrier costs one extra job, the recompute costs
    # one extra join — but at scale the join side grows with the corpus
    # and the staged rows stay candidate-sized, so the barrier wins.)
    neardup = stage(
        lsh_index_probe(batch_lsh, base_lsh)
        .select(F.col("batch_doc").alias("doc_id"))
        .distinct(),
        "batch-neardup",
    )
    flagged = gated.select("doc_id", "lang").join(
        neardup.withColumn("is_nd", F.lit(True)), "doc_id", "left"
    ).withColumn("is_nd", F.coalesce(F.col("is_nd"), F.lit(False)))
    accepted = gated.join(neardup, "doc_id", "left_anti")

    # stage 3: anti-join the accepted paragraphs against the base
    # paragraph-hash index (built above, same persisted-artifact
    # discipline), then keep-first within the delta
    # re-derive tk from the checkpointed text (JVM regex over the
    # accepted batch — cheaper than shipping token arrays through Arrow
    # and storing them in the checkpoint)
    fresh = _paras(_with_tokens(accepted)).join(base_hashes, "h", "left_anti")
    w = Window.partitionBy("h").orderBy("doc_id", "para_idx")
    survival = (
        fresh.withColumn("rk", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fresh"),
            F.sum(F.expr("case when rk = 1 then 1 else 0 end")).alias(
                "n_kept"
            ),
        )
    )

    # stage 4: per-language report (left join: an accepted doc whose
    # every paragraph was deduped still reports with 0)
    return (
        flagged.join(survival, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.sum(F.expr("case when is_nd then 0 else 1 end")).alias(
                "n_docs"
            ),
            F.sum(F.expr("case when is_nd then 1 else 0 end")).alias(
                "neardup_docs"
            ),
            F.sum(
                F.expr("case when is_nd then 0 else coalesce(n_fresh, 0) end")
            ).alias("fresh_paras"),
            F.sum(
                F.expr("case when is_nd then 0 else coalesce(n_kept, 0) end")
            ).alias("kept_paras"),
            F.sum(F.expr("case when is_nd then 0 else doc_id end")).alias(
                "id_sum"
            ),
        )
    )


def stratified_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced sample: each language keeps ~min-language-count
    docs via the hash-pure rule ``h(doc_id) % n_lang < n_min``.

    Membership is integer-exact and identical across engines; the
    per-language keep probability n_min/n_lang equalizes expected counts
    without any global sort or per-row random state.
    """
    docs = load_table(spark, sf_dir, "documents")
    lang_counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_lang")
    )
    n_min = lang_counts.agg(F.min("n_lang").alias("n_min"))
    h = md5_int_hash("concat('strat#', cast(doc_id as string))")
    return (
        docs.join(F.broadcast(lang_counts), "lang")
        .crossJoin(F.broadcast(n_min))
        .withColumn("keep", F.expr(f"({h}) % n_lang < n_min"))
        .filter(F.col("keep"))
        .groupBy("lang")
        .agg(
            F.max("n_lang").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


def curation_steady_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CurationIndex steady state as an oracle-checked query: two
    successive batches flow through build → probe → accept → APPEND, and
    the fixture is built so the second batch's planted near-dups copy
    FIRST-batch docs — they are only caught if batch 1's accepted rows
    actually joined the index (the round-4 verdict's maintenance spec,
    here hash-verified against a DuckDB twin rather than just unit-
    tested).

    Fixture: base = ``doc_id % 4 ∈ {0, 1}``; epoch 1 = ``% 4 == 2``;
    epoch 2 = ``% 4 == 3`` plus near-copies (first word dropped) of the
    epoch-1 docs ``doc_id % 4 == 2, doc_id < 80`` at ``doc_id +
    3000001``. Each epoch probes the index (LSH band collision + MinHash
    component agreement >= MINHASH_EST_AGREE, never text), drops
    verified near-dups, and appends the survivors' own index rows —
    O(batch) maintenance, the index is never rebuilt.

    Output: one row per epoch — batch size, near-dups dropped, docs
    accepted, accepted id-sum. A maintenance bug (append skipped, probe
    reading stale state) zeroes epoch 2's near-dup count and the hash
    mismatches.

    Scale: identical posture to curation_incremental — probes join
    fixed-width index rows; appends write only the batch's rows."""
    from iceberg_examples_spark.catalog import scratch_dir
    from iceberg_examples_spark.operators.curation_index import CurationIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 4 == 2) & (F.col("doc_id") < 80))
        .select(
            (F.col("doc_id") + 3000001).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    base = docs.filter(F.col("doc_id") % 4 < 2)
    epochs = [
        docs.filter(F.col("doc_id") % 4 == 2),
        docs.filter(F.col("doc_id") % 4 == 3).unionByName(planted),
    ]

    idx = CurationIndex(spark, scratch_dir(sf_dir, "steady_idx", fresh=True))
    idx.build(base)
    reports = []
    for e, batch in enumerate(epochs, start=1):
        # ONE signature pass per epoch: the batch's index rows (text
        # carried through for the paragraph hashes) are staged, then the
        # probe, the accept split, the append, and the report all consume
        # the materialized rows — unstaged, the probe/append/report plan
        # branches each re-ran the batch's Arrow stage and the probe join
        # (measured 5.0 → 3.5 s median at sf0.1).
        from iceberg_examples_spark.operators.dedup import minhash_index

        batch_idx = stage(
            minhash_index(batch, wide=False, keep=("text",)),
            f"steady-batch{e}-idx",
        )
        nd = (
            idx.probe_indexed(batch_idx)
            .select(F.col("batch_doc").alias("doc_id"))
            .distinct()
        )
        accepted = stage(
            batch_idx.join(nd, "doc_id", "left_anti"), f"steady-acc{e}"
        )
        idx.append_indexed(accepted)  # eager; epoch e+1 probes see it
        reports.append(
            batch.agg(
                F.lit(e).alias("epoch"),
                F.count(F.lit(1)).alias("n_batch"),
            ).crossJoin(
                accepted.agg(
                    F.count(F.lit(1)).alias("n_accepted"),
                    F.sum("doc_id").alias("id_sum"),
                )
            ).selectExpr(
                "epoch",
                "n_batch",
                "n_batch - n_accepted as n_neardup",
                "n_accepted",
                "id_sum",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
