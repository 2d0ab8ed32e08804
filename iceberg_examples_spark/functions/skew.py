"""Skew-mitigation primitives (100 TB posture).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these helpers
cover the two shapes AQE can't fix:

- :func:`salted_agg` — hot-key *aggregation* skew: pre-aggregate on
  (key, salt) so one reducer never owns a hot key's entire input, then
  combine partials. Works for any algebraic aggregate; results are
  identical to the unsalted plan (that equivalence is hash-verified by
  the ``salted_agg`` declared query's oracle, which is the plain GROUP BY).
- :func:`replicate_dim_join` — hot-key *join* skew where the dim side is
  small but not broadcast-able by config: replicate each dim row N times
  with a salt column and route fact rows to (key, salt) uniformly, so the
  hot key's fact rows spread over N tasks.

Salting uses a deterministic per-row salt (hash of a unique column mod N)
rather than rand() — reproducible plans, and no RNG in the shuffle path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(unique_cols: str | list[str], n_salts: int) -> Column:
    """Stable salt in [0, n_salts): murmur3 of column(s) that are unique
    (or near-unique) PER ROW. Salting on a column shared by a hot key's
    rows would send them all to one salt — defeating the point — so pass
    the finest-grained identity available (e.g. ["l_orderkey",
    "l_linenumber"], not just l_orderkey)."""
    cols = [unique_cols] if isinstance(unique_cols, str) else unique_cols
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    unique_cols: str | list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial sums+counts on
    (keys, salt), then final combine on keys. ``sum_cols`` maps output
    alias → input column. Emits sum_<alias> and n_rows."""
    salted = df.withColumn("__salt", deterministic_salt(unique_cols, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[F.sum(src).alias(f"__p_{alias}") for alias, src in sum_cols.items()],
        F.count(F.lit(1)).alias("__p_n"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{alias}").alias(f"sum_{alias}") for alias in sum_cols],
        F.sum("__p_n").alias("n_rows"),
    )


def replicate_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_unique_cols: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: dim rows replicated across n_salts, fact rows
    salted deterministically; join on (key, salt). Row-for-row identical
    to the plain join."""
    salts = fact.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    dim_rep = dim.crossJoin(F.broadcast(salts))
    fact_salted = fact.withColumn(
        "__salt", deterministic_salt(fact_unique_cols, n_salts)
    )
    return fact_salted.join(dim_rep, [key, "__salt"], how).drop("__salt")
