"""fit_bpe: the K-merge driver loop over the bpe_merge_step query shape.

The declared query hash-verifies ONE iteration cross-engine; these tests
pin the multi-merge contract the loop adds: determinism, chaining (a
learned symbol participating in a later merge), and monotone compression
of the weighted symbol count.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _weighted_symbols(spark, sf_dir, merges):
    """Total corpus symbol count after applying `merges` in order with
    the same left-to-right replace rule (computed in plain Python on the
    collected vocabulary — the test-side reference)."""
    from iceberg_examples_spark.functions.texthash import tokens_expr
    from iceberg_examples_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(tokens_expr("text"))).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    total = 0
    for r in rows:
        w = r["w"]
        for i, m in enumerate(merges):
            # re-sentinel: each merge rendered to base chars must be
            # re-applied through the same growing alphabet
            sent = chr(0xE000 + i)
            # rebuild the merge's two-symbol form from earlier sentinels
            pair = m
            for j in range(i - 1, -1, -1):
                pair = pair.replace(merges[j], chr(0xE000 + j))
            w = w.replace(pair, sent)
        total += len(w) * r["count"]
    return total


def test_fit_bpe_merges_chain_and_compress(spark, sf_dir):
    from iceberg_examples_spark.operators.llm_quality import fit_bpe

    merges = fit_bpe(spark, sf_dir, k=4)
    assert len(merges) == 4
    # deterministic: a second fit returns the identical merge list
    assert fit_bpe(spark, sf_dir, k=4) == merges
    # each merge is at least 2 base chars; later merges may chain (be
    # longer than 2) — assert the RENDERED lengths are sane
    assert all(len(m) >= 2 for m in merges)
    # monotone compression: applying k merges never increases the
    # weighted symbol count, and applying all 4 strictly decreases it
    n0 = _weighted_symbols(spark, sf_dir, [])
    n4 = _weighted_symbols(spark, sf_dir, merges)
    assert n4 < n0


def test_fit_bpe_first_merge_matches_declared_query(spark, sf_dir):
    """The loop's first learned merge must equal bpe_merge_step's rank-0
    row — one source of truth for the iteration."""
    from iceberg_examples_spark.operators.llm_quality import (
        bpe_merge_step,
        fit_bpe,
    )

    first = fit_bpe(spark, sf_dir, k=1)[0]
    rank0 = (
        bpe_merge_step(spark, sf_dir)
        .filter(F.col("rank") == 0)
        .collect()[0]["pair"]
    )
    assert first == rank0
