"""Deduplication operators (north-star extension, SURVEY §2.9): exact,
MinHash+LSH near-dup, n-gram Jaccard.

Algorithms are the classic public constructions: MinHash resemblance
estimation (Broder 1997, "On the resemblance and containment of
documents") with banded LSH (Leskovec/Rajaraman/Ullman, Mining of Massive
Datasets ch. 3); the affine universal-hash family is Carter-Wegman.

The synthetic ``documents`` corpus contains no duplicates, so the declared
queries *plant* deterministic duplicates/near-duplicates (offset doc_ids,
text perturbations expressible identically in the DuckDB oracle) — the
oracle then independently verifies that each algorithm finds exactly the
planted structure and nothing else.

Scale design notes (the real targets are ~10^10 documents):

- exact dedup: group by a 64-bit fingerprint of the text, not the text
  itself — shuffle keys are 8 bytes, not kilobytes. Collisions are
  resolved by grouping on (fingerprint, text) — same plan shape, long key
  only within a fingerprint bucket.
- MinHash-LSH: per-row signature computation is map-only (higher-order
  functions, no UDF); the only shuffle is by band hash, whose cardinality
  ~#docs×bands with tiny payloads; candidate verification joins back only
  the colliding pairs. This is the canonical linear-scale near-dup
  pipeline (vs O(n²) all-pairs).
- pair outputs use (a < b) canonical ordering so results are set-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table
from iceberg_examples_spark.checkpointing import stage
from iceberg_examples_spark.functions.texthash import (
    MOD,
    char_ngram_shingles,
    char_poly_hash,
    int_combine_expr,
    int_minhash_expr,
    md5_int_hash,
    tokens_expr,
    word_bigram_shingles,
)

N_MINHASH = 9
N_BANDS = 3  # 3 bands × 3 rows
ROWS_PER_BAND = N_MINHASH // N_BANDS
JACCARD_THRESHOLD = 0.5


def _with_planted_exact_dups(docs: DataFrame, n: int = 100) -> DataFrame:
    """documents ∪ exact copies of doc_id < n (copies get doc_id+1000000)."""
    copies = docs.filter(F.col("doc_id") < n).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(copies)


def _with_planted_near_dups(docs: DataFrame, n: int = 40) -> DataFrame:
    """documents ∪ near-copies of doc_id < n: the copy drops the first word
    (high bigram-Jaccard to its original, low to everything else)."""
    near = docs.filter(F.col("doc_id") < n).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(near)


def _with_fp(corpus: DataFrame, oracle_hash: bool = False) -> DataFrame:
    """(doc_id, text, fp): the 64-bit content-fingerprint column.

    The CHOICE of hash is results-invariant for every consumer that
    groups on (fp, text): fp is a pure function of text, so (fp, text)
    groups ≡ text groups for any deterministic hash — collisions are
    disambiguated by the text column either way. Default is therefore
    ``xxhash64``, which is codegen-native (measured ~3× faster than the
    char-fold poly hash at sf0.1: 0.19 s vs 0.55 s for the fingerprint
    pass). ``oracle_hash=True`` selects the cross-engine poly hash for
    the one query whose OUTPUT exposes fp (dedup_exact) — there the
    DuckDB oracle must reproduce the exact value."""
    expr = char_poly_hash("text") if oracle_hash else "xxhash64(text)"
    return corpus.select("doc_id", "text", F.expr(expr).alias("fp"))


def _multi_fp_rows(fp: DataFrame) -> DataFrame:
    """The two-phase exact-dedup core — the rows of fp-groups with >1
    member, the ONLY rows whose text ever crosses a shuffle.

    Semantics are identical to a direct ``groupBy(fp, text)`` (the
    fingerprint + full text disambiguates hash collisions exactly), but
    the plan shuffles differently: phase 1 groups on fp alone — 16-byte
    (fp, doc_id) rows — and phase 2 joins text back ONLY for fps with
    more than one member (true duplicates + the ~birthday-bound handful
    of 64-bit collisions). A curated corpus is overwhelmingly singleton
    fps, so the text column stays in its map tasks for ~all rows; the
    direct formulation would shuffle every document's text as a grouping
    key, which is the kind of claim-vs-plan gap this module's "8-byte
    shuffle" scale note exists to rule out. The price is a second
    column-pruned pass over the corpus for the multi-member resolution —
    local scan I/O traded for network shuffle, the right direction on
    any cluster (and free here when the input is a staged frame)."""
    multi_fps = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n0"))
        .filter(F.col("n0") > 1)
        .select("fp")
    )
    return fp.join(multi_fps, "fp", "left_semi")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: group on the 64-bit poly-hash
    fingerprint (+ text to disambiguate collisions), keep min(doc_id) as
    the canonical representative. Returns the duplicate groups (the planted
    100 copies). Two-phase plan: see :func:`_multi_fp_rows` — only
    multi-member fp-groups (duplicates) carry text into the final
    grouping; a colliding pair of distinct singleton texts yields
    per-(fp, text) counts of 1 and is correctly filtered out.

    The fingerprint frame is STAGED before the two-phase core: this
    query's output exposes fp, forcing the cross-engine char-fold poly
    hash (not codegen-native xxhash64), and _multi_fp_rows references
    its input from two plan branches — unstaged, the per-character fold
    over every document runs twice (measured 1.5 s → 0.64 s median at
    sf0.1). The xxhash64 consumers (exact_rep_ids/exact_loser_ids) skip
    this: their fingerprint pass is cheaper than a materialization."""
    corpus = _with_planted_exact_dups(load_table(spark, sf_dir, "documents"))
    return (
        _multi_fp_rows(stage(_with_fp(corpus, oracle_hash=True), "exact-fp"))
        .groupBy("fp", "text")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select("rep_doc_id", "n_copies", "fp")
    )


def exact_rep_ids(corpus: DataFrame) -> DataFrame:
    """One surviving doc_id per distinct text: min(doc_id) per (fp, text)
    group, via the two-phase plan (:func:`_multi_fp_rows`). Singleton-fp
    docs are their own representative and never shuffle their text;
    multi-member fps resolve per (fp, text) exactly. Shared by
    dedup_exact_keep and the llm_prep_pipeline exact-dedup stage."""
    fp = _with_fp(corpus)
    by_fp = fp.select("fp", "doc_id").groupBy("fp").agg(
        F.min("doc_id").alias("rep0"), F.count(F.lit(1)).alias("n0")
    )
    solo = by_fp.filter(F.col("n0") == 1).select(
        F.col("rep0").alias("doc_id")
    )
    multi_reps = (
        fp.join(
            by_fp.filter(F.col("n0") > 1).select("fp"), "fp", "left_semi"
        )
        .groupBy("fp", "text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return solo.unionByName(multi_reps)


def exact_loser_ids(corpus: DataFrame) -> DataFrame:
    """The DROP-side of exact dedup: every doc_id that is a non-min
    member of its (fp, text) duplicate group — the complement of
    :func:`exact_rep_ids`, produced without materializing a corpus-sized
    keep set. The loser set's size is the number of surplus copies (a
    small fraction of any curated corpus), so the caller's anti-join
    carries a tiny build side instead of an N-row semi-join relation.
    Same two-phase shuffle discipline: fp-only aggregate first, text only
    for multi-member groups."""
    from pyspark.sql import Window

    fp = _with_fp(corpus)
    multi = _multi_fp_rows(fp)
    w = Window.partitionBy("fp", "text")
    return (
        multi.withColumn("m", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("m"))
        .select("doc_id")
    )


def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-side of exact dedup: one surviving doc_id per distinct
    text over the planted corpus (count must equal the original corpus)."""
    corpus = _with_planted_exact_dups(load_table(spark, sf_dir, "documents"))
    return exact_rep_ids(corpus)


def _minhash_sig(corpus: DataFrame) -> DataFrame:
    """Arrow-batched signature computation (see operators/signatures.py) —
    values identical to the pure-SQL formulation below, ~10× faster."""
    from iceberg_examples_spark.operators.signatures import minhash_signatures

    return minhash_signatures(corpus, N_MINHASH, N_BANDS, ROWS_PER_BAND)


def _minhash_sig_sql(corpus: DataFrame) -> DataFrame:
    """doc_id → (shingles, band0..bandN): each shingle is md5-hashed to an
    int ONCE, then the k MinHash components are cheap affine maps over
    those ints; band hashes are integer combines of signature slices.
    Entirely per-row (map-only). Pure-Catalyst reference formulation of
    :func:`_minhash_sig` — kept because it is the DuckDB-oracle-shaped
    spec and the fallback if Arrow is unavailable."""
    toks = tokens_expr("text")
    shingles = word_bigram_shingles(toks)
    sig = (
        corpus.select("doc_id", F.expr(shingles).alias("shingles"))
        .withColumn(
            "xs",
            F.expr(f"transform(shingles, s -> {md5_int_hash('s')} % {MOD})"),
        )
        .select(
            "doc_id",
            "shingles",
            *[
                F.expr(int_minhash_expr("xs", seed)).alias(f"mh{seed}")
                for seed in range(N_MINHASH)
            ],
        )
    )
    band_cols = []
    for b in range(N_BANDS):
        parts = [f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        band_cols.append(F.expr(int_combine_expr(parts)).alias(f"band{b}"))
    return sig.select("doc_id", "shingles", *band_cols)


def _minhash_bands(sig: DataFrame) -> DataFrame:
    """signature → slim exploded (doc_id, band_idx, band_hash). No shingle
    payloads here — the LSH self-join shuffles 3 small rows per doc; the
    (kilobyte) shingle arrays are joined back only for candidate pairs."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_hash")
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")


MINHASH_EST_AGREE = 5  # of N_MINHASH components — estimated Jaccard ≥ 0.5


def minhash_index(
    corpus: DataFrame, wide: bool = True, keep: tuple[str, ...] = ()
) -> DataFrame:
    """The persisted-LSH-index artifact of a curated corpus: one
    fixed-width row per doc — (doc_id, mh0..mh8, band0..band2), no text,
    no shingles. An incremental pipeline stores this (O(1) bytes/doc) and
    probes it with each new batch; the indexed corpus's text is never
    rescanned. Maintenance is O(batch): accepted batch docs append their
    own index rows. ``wide=False``: see signatures.minhash_signatures —
    pass it when the corpus is an incremental batch, not a full corpus."""
    from iceberg_examples_spark.operators.signatures import (
        minhash_component_index,
    )

    return minhash_component_index(
        corpus, N_MINHASH, N_BANDS, ROWS_PER_BAND, wide=wide, keep=keep
    )


def lsh_index_probe(batch_index: DataFrame, base_index: DataFrame) -> DataFrame:
    """Probe a persisted base LSH index with a new batch's index rows.

    Candidates: band-hash equality on any of the N_BANDS bands (the same
    banded-LSH candidate rule as lsh_verified_pairs, but across two
    corpora). Verification: MinHash component agreement — matching
    components / N_MINHASH is the unbiased Jaccard estimate (Broder
    1997), so ``n_agree >= MINHASH_EST_AGREE`` ≈ J ≥ 0.5 — computed
    entirely from the two fixed-width index rows, never from text.

    Returns (batch_doc, base_doc, n_agree) for verified near-dup links.

    Plan shape: the exploded band rows CARRY their row's mh components
    (~9 longs — the index row is fixed-width, so this is bounded), which
    makes the whole probe ONE equi-join on (band_idx, band_hash) with the
    agreement computed inline, then one distinct. The alternative — join
    slim band rows, then join each side's components back on doc_id —
    re-shuffles the corpus-sized index twice more; carrying ~72 B/band of
    payload through the single join is cheaper at every scale where the
    index dominates (it always does: candidates ≪ index)."""
    agree = " + ".join(
        f"(case when batch_mh{i} = base_mh{i} then 1 else 0 end)"
        for i in range(N_MINHASH)
    )

    def banded(idx: DataFrame, side: str) -> DataFrame:
        # one selectExpr per step: plan construction is driver-side py4j
        # round-trips, and the warm incremental probe rebuilds this plan
        # per run — string expressions batch it to a handful of calls
        structs = ", ".join(
            f"named_struct('band_idx', {b}, 'band_hash', band{b})"
            for b in range(N_BANDS)
        )
        return idx.selectExpr(
            f"doc_id as {side}_doc",
            *[f"mh{i} as {side}_mh{i}" for i in range(N_MINHASH)],
            f"explode(array({structs})) as band",
        ).selectExpr(
            f"{side}_doc",
            *[f"{side}_mh{i}" for i in range(N_MINHASH)],
            "band.band_idx",
            "band.band_hash",
        )

    return (
        banded(batch_index, "batch")
        .join(banded(base_index, "base"), ["band_idx", "band_hash"])
        .selectExpr(
            "batch_doc",
            "base_doc",
            f"{agree} as n_agree",
        )
        # NO identity-pair exclusion here: a batch doc whose doc_id is
        # already indexed IS a near-dup (exact re-ingestion must be
        # flagged, not silently re-accepted — ADVICE r7). The one caller
        # that legitimately re-probes its own entries (a retried
        # foreachBatch epoch) excludes its own epoch-keyed append from
        # the probed index instead (CurationIndex.probe_indexed
        # exclude_key), which converges without masking re-ingestion.
        .where(f"n_agree >= {MINHASH_EST_AGREE}")
        .distinct()
    )


def minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection over the planted corpus:

    1. per-row: tokens → distinct word-bigram shingles → 9 md5-minhashes →
       3 band hashes (map-only),
    2. shuffle on (band_idx, band_hash); self-join within buckets →
       candidate pairs (a < b),
    3. verify candidates with exact shingle Jaccard ≥ 0.5.

    Output is exact w.r.t. the threshold *given* the LSH recall; both
    engines compute identical bands, so spark and oracle see identical
    candidates. Planted near-dups (bigram Jaccard ≈ 0.9+) pass; unrelated
    word-soup pairs don't."""
    corpus = _with_planted_near_dups(load_table(spark, sf_dir, "documents"))
    return lsh_verified_pairs(corpus)


def lsh_verified_pairs(corpus: DataFrame) -> DataFrame:
    """The LSH band/verify machinery over any (doc_id, text, ...) corpus:
    returns verified near-dup pairs (doc_a < doc_b, jaccard ≥ threshold).
    Shared by minhash_lsh (planted-corpus declared query), the component
    clustering, and the llm_prep_pipeline capstone."""
    # stage the signatures so the self-join + verify joins read them
    # once instead of recomputing shingles+hashes per branch
    # (checkpointing.stage: localCheckpoint here, a reliable-storage
    # staging write when stagingDir is configured on a cluster)
    sig = stage(_minhash_sig(corpus), "lsh-signatures")
    bands = _minhash_bands(sig)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh = sig.select("doc_id", "shingles")
    cand = (
        pairs.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("sa.shingles").alias("sh_a"),
            F.col("sb.shingles").alias("sh_b"),
        )
    )
    jacc = F.expr(
        "cast(size(array_intersect(sh_a, sh_b)) as double)"
        " / cast(size(array_distinct(concat(sh_a, sh_b))) as double)"
    )
    return (
        cand.withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-3-gram Jaccard similarity for adjacent doc_id pairs — the
    bounded pairwise-similarity primitive (the all-pairs version is what
    LSH exists to avoid; this declared query exercises the measure itself
    on a linear number of pairs)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(char_ngram_shingles("text", 3)).alias("grams")
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr(
                "cast(size(array_intersect(a.grams, b.grams)) as double)"
                " / cast(size(array_distinct(concat(a.grams, b.grams))) as double)"
            ).alias("jaccard3"),
        )
    )


def connected_components(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Connected components over an undirected edge list ``(doc_a, doc_b)``:
    every node labeled with the min node id reachable from it.

    Min-label propagation with POINTER DOUBLING (Shiloach–Vishkin-style
    shortcutting): each round every node (1) hooks — takes the min of its
    own and its neighbors' labels, then (2) shortcuts — replaces its label
    with its label's label. Shortcutting halves the remaining propagation
    distance, so rounds are O(log diameter), not O(diameter): the default
    20-round cap terminates for any graph a near-dup pipeline can produce
    (diameter up to ~2^20). Everything stays distributed; the driver only
    checks a one-row convergence count per round (cf. Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond" — label propagation
    plus shortcutting, the right tool at near-dup graph densities where
    components are small).

    Correctness invariants: ``label(v) <= v`` always (labels start as own
    id and only decrease), so ``label(label(v)) <= label(v)`` and the
    shortcut is monotone; a label is always the id of a node in the same
    component, so at fixpoint labels are constant per component and equal
    to the component min.
    """
    # symmetric edge list, checkpointed: reused every iteration
    sym = (
        edges.select("doc_a", "doc_b")
        .union(
            edges.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sym = stage(sym, "cc-edges")
    labels = (
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    labels = stage(labels, "cc-labels-init")
    # Convergence probe: labels are per-node non-increasing, so the label
    # SUM strictly decreases every non-converged round — an unchanged sum
    # is exactly the fixpoint. A scalar agg over the just-checkpointed
    # frame is far cheaper than the old/new join-and-count.
    prev_sum = None
    for round_idx in range(max_rounds):
        # (1) hook: min over own + neighbor labels
        neighbor_min = (
            sym.join(labels, sym.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nbr_label"))
        )
        hooked = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.doc_a, "left"
        ).select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # (2) shortcut: label(v) <- label(label(v)) — the pointer-doubling
        # step that makes convergence logarithmic in diameter
        parent = hooked.select(
            F.col("doc_id").alias("p_id"), F.col("label").alias("p_label")
        )
        new_labels = stage(
            hooked.join(parent, hooked.label == parent.p_id, "left")
            .select(
                "doc_id",
                F.coalesce(F.col("p_label"), F.col("label")).alias("label"),
            ),
            f"cc-labels-r{round_idx}",
        )
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            return labels.select("doc_id", F.col("label").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: did not converge in {max_rounds} rounds — "
        "with pointer doubling this means diameter > 2^rounds; raise "
        "max_rounds rather than returning partially-propagated labels"
    )


# SimHash near-dup search (Manku/Jain/Sarma, WWW'07 shape): F-bit
# fingerprints, Hamming-ball candidate search via band tables. With B
# bands, any pair within Hamming distance B-1 agrees on >= 1 whole band
# (pigeonhole), so bucketing on band values finds every such pair without
# an all-pairs scan. Production tunes F up (64) and uses rotated tables;
# the constants here keep the planted fixture's recall meaningful at the
# toy token counts (the fingerprint has ~REMIX_MOD entropy, 31 bits max).
SIMHASH_DEDUP_BITS = 24
SIMHASH_DEDUP_BANDS = 3  # -> 8-bit bands, 256 buckets each
SIMHASH_DEDUP_HAMMING_MAX = SIMHASH_DEDUP_BANDS - 1  # pigeonhole-complete


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection over the planted corpus — the third
    dedup family beside exact-hash and MinHash-LSH: per-doc 24-bit
    SimHash (Arrow kernel, signatures.simhash_fingerprints), candidates
    by band-bucket equality (NO all-pairs join; the band explode is 3
    fixed-width rows/doc), verified by exact Hamming distance
    ``bit_count(a ^ b) <= 2`` — which the banding provably covers
    (pigeonhole over 3 bands). Output: per-Hamming-distance pair counts,
    id sums, and how many pairs are the planted original→copy links —
    compact at any sf, and the oracle recomputes fingerprints + an
    all-pairs Hamming check in DuckDB, so a banding bug that DROPS a
    within-ball pair hash-mismatches.

    Scale: fingerprints are map-only Arrow; the self-join shuffles
    (band_idx, band_val, fp, doc_id) rows — ~24 B/doc × 3. Band width
    trades bucket size vs recall radius: at corpus scale you raise F to
    64 and keep buckets sparse (the classic 4-table/64-bit layout)."""
    from iceberg_examples_spark.operators.signatures import (
        simhash_fingerprints,
    )

    corpus = _with_planted_near_dups(load_table(spark, sf_dir, "documents"))
    fps = stage(
        simhash_fingerprints(corpus, n_bits=SIMHASH_DEDUP_BITS),
        "simhash-fp",
    )
    width = SIMHASH_DEDUP_BITS // SIMHASH_DEDUP_BANDS
    structs = ", ".join(
        f"named_struct('band_idx', {b}, "
        f"'band_val', (simhash div {2 ** (b * width)}) % {2 ** width})"
        for b in range(SIMHASH_DEDUP_BANDS)
    )
    bands = fps.selectExpr(
        "doc_id", "simhash", f"explode(array({structs})) as band"
    ).selectExpr("doc_id", "simhash", "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .selectExpr(
            "a.doc_id as doc_a",
            "b.doc_id as doc_b",
            "bit_count(a.simhash ^ b.simhash) as hamming",
        )
        .where(f"hamming <= {SIMHASH_DEDUP_HAMMING_MAX}")
        .distinct()
    )
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("doc_a").alias("a_sum"),
        F.sum("doc_b").alias("b_sum"),
        F.sum(
            F.expr("case when doc_b = doc_a + 1000000 then 1 else 0 end")
        ).alias("n_planted"),
    )


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    MinHash-LSH pair graph, each doc labeled with the min doc_id reachable
    from it (the canonical cluster representative). See
    :func:`connected_components` for the distributed algorithm."""
    pairs = minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs)


def intra_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-repetition scrub accounting — duplicate paragraph windows
    WITHIN a document (boilerplate repeats, template spam), the
    complement of paragraph_dedup's cross-document pass. Keep-first
    semantics: occurrence 1 of a window hash survives, later occurrences
    are the intra-doc duplicates; the output is the per-doc audit
    (window count, surviving count, and a mod-bounded hash fingerprint of
    the dropped occurrences so the oracle checks WHICH windows dropped,
    not just how many).

    Plan: the shared paragraph explode+hash stage (scrub._paras — one
    source of truth for the window/hash formulation), then a window
    partitioned BY DOC over (hash, position): the partition key is the
    document, the natural parallel unit — no global sort, no cross-doc
    traffic, and a 100×-bigger corpus just means more doc partitions.
    Docs shorter than one window (size < 1 token) simply don't appear —
    same contract as the paragraph stage it reuses."""
    from iceberg_examples_spark.operators.scrub import (
        PARA_SUM_MOD,
        _paras,
        _with_tokens,
    )

    docs = _with_tokens(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("doc_id", "h").orderBy("para_idx")
    return (
        _paras(docs)
        .withColumn("occ", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.expr("case when occ = 1 then 1 else 0 end")).alias(
                "n_kept"
            ),
            F.sum(
                F.expr(
                    f"case when occ > 1 then h % {PARA_SUM_MOD} else 0 end"
                )
            ).alias("dup_h_sum"),
        )
    )


FUZZY_PREFIX = 40


def fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity on bounded pairs: levenshtein over the
    first FUZZY_PREFIX chars of adjacent-doc_id documents — the
    character-level fuzzy-dedup measure (OCR noise, minor edits) that
    token/shingle methods miss. Both engines implement the classic DP
    edit distance, so the integer result crosses engines exactly
    (verified on a probe set before this query landed).

    Scale posture mirrors ngram_jaccard: the MEASURE is exercised on a
    linear number of pairs; candidate GENERATION at scale is the LSH
    family's job (levenshtein is O(p²) per pair — you never all-pairs
    it). Prefix-bounding caps the DP cost per pair regardless of
    document length — the standard production guard."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"substring(text, 1, {FUZZY_PREFIX})").alias("pre")
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("cast(levenshtein(a.pre, b.pre) as bigint)").alias(
                "edit_dist"
            ),
        )
    )


CONTAIN_N = 40
CONTAIN_TOKENS = 8


def minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment C(A,B) = |A∩B| / |A| (Broder's second
    resemblance measure): detects SUB-document inclusion — quotes,
    excerpts, boilerplate wrappers — which symmetric Jaccard misses (a
    short doc embedded in a long one has tiny Jaccard but containment
    ≈ 1). Planted fixture: the first CONTAIN_TOKENS tokens of each low
    doc_id re-enter as a sub-document; its word-bigram shingles are by
    construction a subset of the original's, so the query must report
    full containment one way and partial the other. Output stays exact
    integers (|A∩B|, |A|, |B|) — the ratio is the consumer's one float.

    Bounded planted pairs exercise the measure; at scale candidates come
    from the SAME banded-LSH machinery as Jaccard (containment's MinHash
    estimator just normalizes differently), so no new join shape."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < CONTAIN_N
    )
    toks = tokens_expr("text")
    sub = docs.select(
        "doc_id",
        F.expr(
            f"concat_ws(' ', slice({toks}, 1, {CONTAIN_TOKENS}))"
        ).alias("text"),
    )
    sh = word_bigram_shingles(tokens_expr("text"))
    full_sh = docs.select("doc_id", F.expr(sh).alias("sh_full"))
    sub_sh = sub.select("doc_id", F.expr(sh).alias("sh_sub"))
    return (
        full_sh.join(sub_sh, "doc_id")
        .select(
            "doc_id",
            F.expr(
                "cast(size(array_intersect(sh_sub, sh_full)) as bigint)"
            ).alias("n_common"),
            F.expr("cast(size(sh_sub) as bigint)").alias("n_sub"),
            F.expr("cast(size(sh_full) as bigint)").alias("n_full"),
        )
    )


def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution — the dedup QUALITY report:
    how much of the corpus sits in clusters of what size (a heavy tail
    of large clusters means template spam; all-singletons means the
    threshold is too strict). One aggregate over the connected-components
    labeling: component → cluster size → (size, #clusters,
    representative-id sum) — the fingerprint ties the histogram to WHICH
    clusters, not just how many."""
    comp = dedup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("component").alias("rep_sum"),
    )
