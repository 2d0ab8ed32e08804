"""Driver-harness compatibility self-check.

The external correctness gate canonicalizes each query result with pandas
(``DataFrame.sort_values`` over every column before hashing).  pandas'
lexsort factorizes object columns with a hash table, so any cell holding an
unhashable value — list, dict, numpy array, bytearray — crashes the gate
with ``TypeError: unhashable type`` and the query gets NO correctness row
at all (this is exactly what happened to ``collect_sets`` in round 1: the
local harness canonicalized lists to tuples and passed while the driver
crashed).

This test replays the driver's canonicalization locally for every declared
query so type crashes are caught before the driver runs:

1. schema audit — no top-level Array/Map/Struct/Binary output column
   (serialize to JSON / array_join / hex instead);
2. pandas replay — ``toPandas().sort_values(by=<all columns>)`` must not
   raise on a bounded sample of the real result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_examples_spark.registry import QUERIES

_COMPLEX = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_driver_canonicalization_compat(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)

    bad = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"{name} emits complex-typed column(s) {bad}: the driver's pandas "
        "hasher cannot sort them — serialize to a scalar (to_json / "
        "array_join / hex) in BOTH the Spark query and its oracle"
    )

    # Replay the driver's sort: factorization of object columns is where
    # unhashable cell values blow up.  A bounded sample exercises the same
    # code path without re-collecting full results (test_parity does that).
    pdf = df.limit(500).toPandas()
    if len(pdf) and len(pdf.columns):
        pdf.sort_values(by=sorted(pdf.columns), kind="stable")
