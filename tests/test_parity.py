"""Every declared query must hash-match its DuckDB oracle (the driver's
t2 gate, run locally at the small scale factor)."""

from __future__ import annotations

import pytest

from iceberg_examples_spark.registry import QUERIES, ROWS_ONLY_REASON, get_oracles
from tests.oracle_harness import compare


def test_every_query_has_oracle_or_reason():
    oracles = get_oracles()
    for name in QUERIES:
        assert name in oracles or name in ROWS_ONLY_REASON, (
            f"{name} lacks both an oracle and a rows-only justification"
        )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, sf_dir):
    oracles = get_oracles()
    if name not in oracles:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only smoke
        return
    compare(QUERIES[name](spark, sf_dir), oracles[name], sf_dir)

