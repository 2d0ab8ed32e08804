"""lsh_index_probe vs an independent pure-Python brute force.

The probe's contract: over two indexed corpora, return exactly the
(batch_doc, base_doc) pairs that (a) collide on at least one LSH band and
(b) agree on >= MINHASH_EST_AGREE of the N_MINHASH components. The
reference below recomputes both predicates from raw text with the same
public constructions (md5 shingle hash, Carter–Wegman affine maps) but
none of the probe's plan machinery — all pairs, no bands-first shortcut —
so a probe bug in the explode/join/distinct plumbing cannot hide.
"""

from __future__ import annotations

import pytest

from iceberg_examples_spark.functions.texthash import MOD, affine_params
from iceberg_examples_spark.operators.dedup import (
    MINHASH_EST_AGREE,
    N_BANDS,
    N_MINHASH,
    ROWS_PER_BAND,
    lsh_index_probe,
    minhash_index,
)
from iceberg_examples_spark.operators.signatures import (
    _md5_int,
    _shingles,
    _tokens,
)

BASE_TEXTS = {
    1: "the quick brown fox jumps over the lazy dog near the river bank",
    2: "colorless green ideas sleep furiously under a bright winter moon",
    3: "pack my box with five dozen liquor jugs before the long trip",
    4: "a stitch in time saves nine but two stitches save eighteen more",
    5: "rain in spain falls mainly on the plain every single april day",
}
BATCH_TEXTS = {
    # near-copy of base 1 (first word dropped) — must be caught
    101: "quick brown fox jumps over the lazy dog near the river bank",
    # exact copy of base 3 — must be caught
    102: "pack my box with five dozen liquor jugs before the long trip",
    # unrelated — must NOT be caught
    103: "seven silent submarines circle slowly beneath the frozen arctic shelf",
    # near-copy of base 5 (last word changed)
    104: "rain in spain falls mainly on the plain every single april night",
}


def _components(text: str) -> tuple[list[int] | None, list[int] | None]:
    xs = [_md5_int(s) % MOD for s in _shingles(_tokens(text))]
    if not xs:
        return None, None
    mh = [
        min((a * x + b) % MOD for x in xs)
        for a, b in (affine_params(seed) for seed in range(N_MINHASH))
    ]
    bands = []
    for bi in range(N_BANDS):
        acc = mh[bi * ROWS_PER_BAND]
        for r in range(1, ROWS_PER_BAND):
            acc = (acc * 31 + mh[bi * ROWS_PER_BAND + r]) % MOD
        bands.append(acc)
    return mh, bands


def _brute_force() -> set[tuple[int, int, int]]:
    expected = set()
    for bid, btext in BATCH_TEXTS.items():
        bmh, bbands = _components(btext)
        for xid, xtext in BASE_TEXTS.items():
            xmh, xbands = _components(xtext)
            if bmh is None or xmh is None:
                continue
            collides = any(
                bbands[i] == xbands[i] for i in range(N_BANDS)
            )
            agree = sum(1 for i in range(N_MINHASH) if bmh[i] == xmh[i])
            if collides and agree >= MINHASH_EST_AGREE:
                expected.add((bid, xid, agree))
    return expected


@pytest.fixture
def frames(spark):
    base = spark.createDataFrame(
        [(i, t) for i, t in BASE_TEXTS.items()], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(i, t) for i, t in BATCH_TEXTS.items()], "doc_id long, text string"
    )
    return batch, base


def test_probe_matches_brute_force(spark, frames):
    batch, base = frames
    got = {
        (r["batch_doc"], r["base_doc"], r["n_agree"])
        for r in lsh_index_probe(
            minhash_index(batch, wide=False), minhash_index(base, wide=False)
        ).collect()
    }
    expected = _brute_force()
    assert got == expected
    # fixture sanity: the planted dups are found, the unrelated doc is not
    found_batch_docs = {b for b, _, _ in got}
    assert {101, 102} <= found_batch_docs
    assert 103 not in found_batch_docs


def test_probe_exact_copy_agrees_fully(spark, frames):
    batch, base = frames
    rows = {
        (r["batch_doc"], r["base_doc"]): r["n_agree"]
        for r in lsh_index_probe(
            minhash_index(batch, wide=False), minhash_index(base, wide=False)
        ).collect()
    }
    assert rows[(102, 3)] == N_MINHASH  # identical text ⇒ all components
