"""Portable deterministic text hashing, expressible identically in Spark SQL
and DuckDB SQL.

Everything here is built from primitives with verified bit-identical
behavior in both engines (md5 hex, string min over ASCII hex, left-fold
``aggregate``/``list_reduce``, ``%`` with C semantics):

- :func:`char_poly_hash` — polynomial rolling hash over characters,
  ``h = fold((acc*31 + ascii(c)) % 1_000_000_007)``. Used for document
  fingerprints and as the token hash feeding SimHash.
- MinHash signatures as *string* minima of seeded md5 over shingles —
  avoids any hex→int conversion differences between engines.

All functions return Spark SQL expression *strings* (used via ``F.expr``);
the DuckDB oracle mirrors them with the engine's list_* spellings.
"""

from __future__ import annotations

MOD = 1_000_000_007
REMIX_MUL = 2_654_435_761  # Knuth multiplicative constant
REMIX_ADD = 101
REMIX_MOD = 2_147_483_647

# token split pattern shared by every text op (lowercase alnum words)
TOKEN_SPLIT = "[^a-z0-9]+"


def tokens_expr(col: str = "text") -> str:
    """Lowercased alnum tokens, empty strings dropped (both engines emit a
    trailing '' when the text ends in punctuation)."""
    return f"filter(split(lower({col}), '{TOKEN_SPLIT}'), t -> t <> '')"


def char_poly_hash(expr: str) -> str:
    """Polynomial hash of a string expression → BIGINT in [0, MOD)."""
    return (
        f"aggregate(transform(split({expr}, ''), c -> ascii(c)), 0L, "
        f"(acc, c) -> (acc * 31 + c) % {MOD})"
    )


def remix(h_expr: str) -> str:
    """Second-stage mix so SimHash bits aren't the raw poly-hash bits."""
    return f"(({h_expr}) * {REMIX_MUL} + {REMIX_ADD}) % {REMIX_MOD}"


def md5_int_hash(expr: str) -> str:
    """60-bit integer hash of a string: first 15 hex chars of md5.
    One native md5 per value — far cheaper than a per-character fold when
    hashing millions of shingles/tokens. DuckDB twin:
    ``('0x' || substr(md5(x),1,15))::BIGINT`` (verified identical)."""
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


def word_bigram_shingles(toks_expr: str) -> str:
    """Distinct word-bigram shingles of a token array (the MinHash unit)."""
    return (
        f"array_distinct(transform(sequence(1, greatest(size({toks_expr}) - 1, 1)), "
        f"i -> concat(element_at({toks_expr}, i), ' ', "
        f"element_at({toks_expr}, least(i + 1, size({toks_expr}))))))"
    )


def minhash_expr(shingles_expr: str, seed: int) -> str:
    """One MinHash component: lexicographic min of seeded md5 over shingles.
    String min over fixed-width hex == numeric min over the 128-bit hash.
    (Reference formulation — superseded on the hot path by the integer
    family below, which hashes each shingle once instead of once per seed.)
    """
    return f"array_min(transform({shingles_expr}, s -> md5(concat('{seed}#', s))))"


def affine_params(seed: int) -> tuple[int, int]:
    """Deterministic (a, b) for the seed-th universal-hash family member
    h_i(x) = (a_i * x + b_i) mod MOD. a in [1, MOD) because REMIX_MUL and
    MOD are coprime to small seeds; products stay under 2^63."""
    a = (REMIX_MUL * (seed + 1) + 17) % MOD
    b = (seed * 97 + 13) % MOD
    return a, b


def int_minhash_expr(xs_expr: str, seed: int) -> str:
    """MinHash over pre-hashed integer shingles: min((a*x + b) % MOD).
    One char-fold per shingle total (in ``xs_expr``), then k cheap integer
    affine maps — ~10× less hashing than k seeded md5 passes."""
    a, b = affine_params(seed)
    return f"array_min(transform({xs_expr}, x -> (x * {a} + {b}) % {MOD}))"


def int_combine_expr(parts: list[str]) -> str:
    """Order-sensitive integer combine of hash components (band hash)."""
    acc = parts[0]
    for p in parts[1:]:
        acc = f"(({acc}) * 31 + ({p})) % {MOD}"
    return acc


def char_ngram_shingles(col: str, n: int = 3) -> str:
    """Distinct character n-grams of a string column."""
    return (
        f"array_distinct(transform(sequence(1, greatest(length({col}) - {n - 1}, 1)), "
        f"i -> substring({col}, i, {n})))"
    )


TRAIN_PCT = 90


def train_val_split_sql(key_expr: str, train_pct: int = TRAIN_PCT) -> str:
    """Deterministic train/val membership as a Spark SQL expression: a
    pure function of the row key (md5-derived hash mod 100), so reruns,
    backfills, and the DuckDB oracle (duck_train_val_split) agree
    exactly. One definition shared by the standalone train_test_split
    operator and the llm_prep_pipeline split stage."""
    h = md5_int_hash(f"cast({key_expr} as string)")
    return (
        f"case when ({h}) % 100 < {train_pct} then 'train' else 'val' end"
    )
