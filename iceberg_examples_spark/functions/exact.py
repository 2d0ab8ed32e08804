"""Cross-engine-deterministic aggregate arithmetic.

Floating-point SUM is order-dependent; Spark and the DuckDB oracle will
accumulate partitions in different orders, so ``sum(double)`` can differ in
the last ulps and break value-hash comparison. The fix used throughout the
declared queries: scale fixed-decimal inputs to integers, accumulate as
BIGINT (exact, associative, shuffle-order-independent), and convert back
with one deterministic double op at the end. Both engines then compute
bit-identical float64 results from identical integer inputs.

The per-row ``round(x * scale)`` is safe because the source columns carry
fixed decimal precision (money = 2 dp, discount/tax = 2 dp), so
``x * scale`` is within ~1e-9 of an integer — never near a .5 boundary.

This is also the right 100 TB posture: integer sums are cheaper than
decimal-128 sums and immune to partial-aggregation reorder under AQE.

These builders are the single source of the idiom — Spark queries AND the
DuckDB oracles must both call them (never hand-spell the fragment), so the
two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum_sql(expr: str, scale: int = 10000) -> str:
    """Exact sum of a fixed-decimal SQL expression, as double. The same
    text is valid Spark SQL and DuckDB SQL."""
    return f"cast(sum(cast(round(({expr}) * {scale}) as bigint)) as double) / {scale}.0"


def money_sum(expr: str, alias: str, scale: int = 10000) -> Column:
    return F.expr(money_sum_sql(expr, scale=scale)).alias(alias)


def money_avg_sql(expr: str, scale: int = 10000) -> str:
    # one integer sum + one integer count -> two deterministic double ops
    return (
        f"cast(sum(cast(round(({expr}) * {scale}) as bigint)) as double)"
        f" / {scale}.0 / cast(count({expr}) as double)"
    )


def money_avg(expr: str, alias: str, scale: int = 10000) -> Column:
    return F.expr(money_avg_sql(expr, scale=scale)).alias(alias)


def money_cents_sql(expr: str, scale: int = 100) -> str:
    """Row-level scaled-integer form of a fixed-decimal expression (the
    per-row half of the sum builders — for window frames and other
    contexts where the aggregate wraps the frame, not the expression).
    Valid in both Spark SQL and DuckDB."""
    return f"cast(round(({expr}) * {scale}) as bigint)"
