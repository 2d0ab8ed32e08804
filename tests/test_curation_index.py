"""CurationIndex steady-state: appended batches are probe-visible.

The round-4 verdict's spec: after appending batch N's entries, batch
N+1's probe must catch a near-dup of a batch-N doc (not just of the
original base) — proving maintenance is a real append, not a rebuild.
"""

from __future__ import annotations

import os

from iceberg_examples_spark.operators.curation_index import CurationIndex

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "pack my box with five dozen liquor jugs before the long trip"),
]
# batch N: one novel doc, one near-copy of base doc 1
BATCH_N = [
    (101, "seven silent submarines circle slowly beneath the frozen arctic shelf"),
    (102, "quick brown fox jumps over the lazy dog near the river bank"),
]
# batch N+1: a near-copy of batch N's NOVEL doc (only catchable if batch
# N's accepted rows were appended to the index), plus an unrelated doc
BATCH_N1 = [
    (201, "silent submarines circle slowly beneath the frozen arctic shelf"),
    (202, "rain in spain falls mainly on the plain every single april day"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_appended_batch_is_probe_visible(spark, tmp_path):
    idx = CurationIndex(spark, str(tmp_path / "curidx"))
    idx.build(_df(spark, BASE))

    # batch N: probe against the base, accept the non-dups, append them
    probe_n = idx.probe(_df(spark, BATCH_N))
    flagged_n = {r["batch_doc"] for r in probe_n.collect()}
    assert flagged_n == {102}  # near-copy of base 1 caught; novel doc not
    accepted_n = _df(spark, [r for r in BATCH_N if r[0] not in flagged_n])
    idx.append_batch(accepted_n)

    # batch N+1: the near-copy of batch N's doc 101 must now be caught
    probe_n1 = idx.probe(_df(spark, BATCH_N1))
    links = {(r["batch_doc"], r["base_doc"]) for r in probe_n1.collect()}
    assert (201, 101) in links
    assert all(b != 202 for b, _ in links)

    # appends added commit dirs; nothing existing was rewritten
    lsh_commits = sorted(os.listdir(idx.lsh_dir))
    assert len(lsh_commits) == 2  # build + one batch append


def test_probe_excluding_sole_keyed_append_yields_empty(spark, tmp_path):
    """A retried FIRST epoch: the index holds only that epoch's own keyed
    append, so excluding it must yield an empty pre-epoch view — not a
    confusing TypeError from read.parquet() with zero paths (r8 ADVICE)."""
    from iceberg_examples_spark.operators.dedup import minhash_index

    idx = CurationIndex(spark, str(tmp_path / "curidx3"))
    batch = _df(spark, BATCH_N)
    idx.append_indexed(
        minhash_index(batch, wide=False, keep=("text",)), key="epoch-0"
    )
    pre = idx._read(idx.lsh_dir, exclude_key="epoch-0")
    assert pre.count() == 0
    # schema borrowed from the excluded dir, so downstream joins still plan
    assert set(pre.columns) == set(
        spark.read.parquet(os.path.join(idx.lsh_dir, "k-epoch-0")).columns
    )
    # and the probe path itself converges: excluding its own append, the
    # retried epoch sees no pre-existing near-dups
    assert idx.probe(batch, exclude_key="epoch-0").count() == 0


def test_fresh_paras_sees_appended_paragraphs(spark, tmp_path):
    idx = CurationIndex(spark, str(tmp_path / "curidx2"))
    idx.build(_df(spark, BASE))
    batch_n = _df(spark, [BATCH_N[0]])
    assert idx.fresh_paras(batch_n).count() > 0  # novel text: all fresh
    idx.append_batch(batch_n)
    # resubmitting the same text: every paragraph hash is now indexed
    assert idx.fresh_paras(batch_n).count() == 0
