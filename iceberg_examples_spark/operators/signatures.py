"""Vectorized signature computation (MinHash / SimHash) via mapInPandas.

The pure-SQL formulations (dedup._minhash_sig_sql, text.simhash16_sql)
express these ops entirely in Catalyst higher-order functions — correct,
shuffle-free, but HOF lambdas are *interpreted* per element, which makes
them the hot spot (measured ~2.7 ms/doc at sf0.1). Signature computation
is the textbook case for the Arrow-batched escape hatch: a ``mapInPandas``
stage that computes the identical values (md5 is md5; the affine maps are
integer arithmetic) ~10× faster, while everything around it — the LSH
band join, candidate verification, grouping — stays declarative DataFrame.

Determinism contract: every value produced here matches the SQL/DuckDB
formulation bit-for-bit —
- tokens: ``re.split('[^a-z0-9]+', text.lower())`` with empties dropped ==
  both engines' regexp split,
- shingle hash: first 15 hex chars of md5 → int (== ``conv(substr(md5))``
  in Spark, ``('0x'||…)::BIGINT`` in DuckDB),
- MinHash: min over (a_i·x + b_i) mod M with texthash.affine_params,
- SimHash: bit b of the remixed token hash contributes ±1.

Scale: mapInPandas processes Arrow record batches per partition — no
shuffle, no driver involvement; at 10^10 docs this stage is embarrassingly
parallel and CPU-bound on md5, which vectorizes across the batch.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from iceberg_examples_spark.checkpointing import spread
from iceberg_examples_spark.functions.texthash import (
    MOD,
    REMIX_ADD,
    REMIX_MOD,
    REMIX_MUL,
    affine_params,
)

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _shingles(toks: list[str]) -> list[str]:
    """Distinct word bigrams; single-token docs self-pair (mirrors the SQL
    ``sequence(1, greatest(size-1,1))`` + ``least(i+1, size)`` guard)."""
    if not toks:
        return []
    if len(toks) == 1:
        return [f"{toks[0]} {toks[0]}"]
    return list(dict.fromkeys(f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)))


def _minhash_row(
    text: str,
    params: list[tuple[int, int]],
    n_bands: int,
    rows_per_band: int,
) -> tuple[list[str], list[int] | None, list[int] | None]:
    """Per-doc MinHash kernel shared by the signature and index
    formulations: shingles, affine MinHash components, band folds.
    ONE definition on purpose — both consumers promise values
    bit-identical to the SQL/DuckDB formulation, so the fold must not
    be able to drift between them. Returns (shingles, None, None) for
    empty docs."""
    sh = _shingles(_tokens(text))
    xs = [_md5_int(s) % MOD for s in sh]
    if not xs:
        return sh, None, None
    mh = [min((a * x + b) % MOD for x in xs) for a, b in params]
    bands = []
    for bi in range(n_bands):
        acc = mh[bi * rows_per_band]
        for r in range(1, rows_per_band):
            acc = (acc * 31 + mh[bi * rows_per_band + r]) % MOD
        bands.append(acc)
    return sh, mh, bands


def minhash_signatures(
    docs: DataFrame,
    n_minhash: int,
    n_bands: int,
    rows_per_band: int,
    wide: bool = True,
) -> DataFrame:
    """(doc_id, text) → (doc_id, shingles, band0..band{n_bands-1}).

    ``wide=False`` skips the :func:`spread` widening — for callers whose
    input is delta-sized by contract (an incremental batch), where the
    repartition round-trip costs more than single-core compute saves
    (measured 0.73 s vs 0.38 s on a ~500-doc batch)."""
    params = [affine_params(seed) for seed in range(n_minhash)]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_sh, out_bands = [], [[] for _ in range(n_bands)]
            for text in pdf["text"]:
                sh, _mh, bands = _minhash_row(text, params, n_bands, rows_per_band)
                out_sh.append(sh)
                for bi in range(n_bands):
                    out_bands[bi].append(bands[bi] if bands else None)
            res = pd.DataFrame({"doc_id": pdf["doc_id"], "shingles": out_sh})
            for bi in range(n_bands):
                res[f"band{bi}"] = pd.Series(out_bands[bi], dtype="object")
            yield res

    schema = "doc_id long, shingles array<string>, " + ", ".join(
        f"band{b} long" for b in range(n_bands)
    )
    sel = docs.select("doc_id", "text")
    return (spread(sel) if wide else sel).mapInPandas(
        compute, schema=schema
    )


def minhash_component_index(
    docs: DataFrame,
    n_minhash: int,
    n_bands: int,
    rows_per_band: int,
    wide: bool = True,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, text) → (doc_id, mh0..mh{n-1}, band0..band{b-1}) — the
    fixed-width row of a persistable LSH index: individual MinHash
    components plus band hashes, NO shingle payloads (~100 B/doc at 9
    components). Storing the components lets an incremental pipeline
    verify band-collision candidates by component agreement (the
    classic MinHash Jaccard estimate, Broder 1997) without rescanning
    the indexed corpus's text. Values are bit-identical to
    :func:`minhash_signatures` / the SQL+DuckDB formulations.

    ``keep``: extra input columns carried through the Arrow stage into
    the output — one batch transfer instead of a join-back on doc_id,
    so a caller can checkpoint (row + its index columns) as one
    materialization without evaluating the input subtree twice (the
    incremental-curation gated-batch shape)."""
    params = [affine_params(seed) for seed in range(n_minhash)]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_mh = [[] for _ in range(n_minhash)]
            out_bands = [[] for _ in range(n_bands)]
            for text in pdf["text"]:
                _sh, mh, bands = _minhash_row(text, params, n_bands, rows_per_band)
                for i in range(n_minhash):
                    out_mh[i].append(mh[i] if mh else None)
                for bi in range(n_bands):
                    out_bands[bi].append(bands[bi] if bands else None)
            res = pd.DataFrame({c: pdf[c] for c in ("doc_id", *keep)})
            for i in range(n_minhash):
                res[f"mh{i}"] = pd.Series(out_mh[i], dtype="object")
            for bi in range(n_bands):
                res[f"band{bi}"] = pd.Series(out_bands[bi], dtype="object")
            yield res

    by_name = {f.name: f for f in docs.schema.fields}
    kept_ddl = "".join(
        f", {c} {by_name[c].dataType.simpleString()}" for c in keep
    )
    schema = (
        "doc_id long"
        + kept_ddl
        + ", "
        + ", ".join(f"mh{i} long" for i in range(n_minhash))
        + ", "
        + ", ".join(f"band{b} long" for b in range(n_bands))
    )
    cols = ["doc_id", *keep] + ([] if "text" in keep else ["text"])
    sel = docs.select(*cols)
    return (spread(sel) if wide else sel).mapInPandas(
        compute, schema=schema
    )


def simhash_fingerprints(
    docs: DataFrame, n_bits: int = 16, wide: bool = True
) -> DataFrame:
    """(doc_id, text) → (doc_id, simhash): ±1 vote per token per bit."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for text in pdf["text"]:
                votes = [0] * n_bits
                for t in _tokens(text):
                    h = (
                        (_md5_int(t) % REMIX_MOD) * REMIX_MUL + REMIX_ADD
                    ) % REMIX_MOD
                    for i in range(n_bits):
                        votes[i] += 1 if (h >> i) & 1 else -1
                fps.append(
                    sum(2**i for i in range(n_bits) if votes[i] >= 0)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": fps})

    sel = docs.select("doc_id", "text")
    return (spread(sel) if wide else sel).mapInPandas(
        compute, schema="doc_id long, simhash long"
    )
