"""JSON ingestion with schema inference (SURVEY §2.1 S1).

Reference: ``Setup.java:56-60`` — three JSON lines parsed from an in-memory
dataset, schema inferred (``age: bigint, name: string``), used as the
sample DataFrame everywhere.

Two paths:
- :func:`read_json_lines` — inference over an in-memory list (driver-side
  literals → tiny; fine to parallelize).
- :func:`read_json_column` — the scale path: ``from_json`` with an explicit
  schema over an existing string column (e.g. ``events.props``). Inference
  over 100 TB means a full extra pass — at scale, always pass the schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference's sample records, Setup.java:56-58.
SAMPLE_JSON_LINES = [
    "{'name':'User-1', 'age':1122}",
    "{'name':'User-2', 'age':1130}",
    "{'name':'User-3', 'age':1119}",
]


def read_json_lines(spark: SparkSession, lines: list[str] | None = None) -> DataFrame:
    """Infer schema from JSON lines (single-quoted keys allowed, matching
    Spark's lenient default the reference relies on)."""
    lines = lines if lines is not None else SAMPLE_JSON_LINES
    return spark.read.json(spark.sparkContext.parallelize(lines, 1))


def read_json_column(df: DataFrame, col: str, schema: str) -> DataFrame:
    """Parse a JSON string column with an explicit schema (no inference
    pass; JVM-side, codegen'd)."""
    return df.withColumn(f"{col}_parsed", F.from_json(F.col(col), schema))
