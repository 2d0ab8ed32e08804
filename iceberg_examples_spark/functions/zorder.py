"""Z-order (Morton) interleaving as a portable SQL expression.

Multi-dimensional clustering for file layout: sorting by the bit-interleave
of two bounded keys places rows that are close in BOTH dimensions into the
same files, so parquet min/max (or Iceberg manifest) stats prune scans with
predicates on either column — the standard lakehouse data-layout technique
(Iceberg's `rewrite_data_files(strategy => 'sort', sort_order => 'zorder')`
and Delta `OPTIMIZE ... ZORDER BY` do exactly this at the file-compaction
layer; the reference's partition-transform surface,
IcebergHadoopTables.java:27, is the 1-D cousin).

One generator renders the identical interleave for Spark SQL and DuckDB, so
the declared query and its oracle share the logic by construction. Disjoint
bits are combined with ``+`` (≡ bitwise OR here) to dodge operator-precedence
differences between the dialects.
"""

from __future__ import annotations


def _spark_shl(expr: str, n: int) -> str:
    return f"shiftleft({expr}, {n})" if n else expr


def _spark_shr(expr: str, n: int) -> str:
    return f"shiftright({expr}, {n})" if n else expr


def _duck_shl(expr: str, n: int) -> str:
    return f"({expr} << {n})" if n else expr


def _duck_shr(expr: str, n: int) -> str:
    return f"({expr} >> {n})" if n else expr


def _interleave(xcol: str, ycol: str, bits: int, shl, shr) -> str:
    """x occupies even bit positions, y odd; both inputs must already be
    non-negative and < 2**bits."""
    terms = []
    for i in range(bits):
        terms.append(shl(f"({shr(xcol, i)} & 1)", 2 * i))
        terms.append(shl(f"({shr(ycol, i)} & 1)", 2 * i + 1))
    return "(" + " + ".join(terms) + ")"


def zorder_sql_spark(xcol: str, ycol: str, bits: int = 10) -> str:
    """Spark SQL expression for the z-value of (xcol, ycol)."""
    return _interleave(xcol, ycol, bits, _spark_shl, _spark_shr)


def zorder_sql_duckdb(xcol: str, ycol: str, bits: int = 10) -> str:
    """DuckDB expression computing the identical z-value."""
    return _interleave(xcol, ycol, bits, _duck_shl, _duck_shr)
