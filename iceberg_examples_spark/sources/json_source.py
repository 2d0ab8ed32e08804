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


def json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode ingestion with corrupt-record capture — the
    production posture for untrusted JSON feeds: malformed lines land in
    ``_corrupt_record`` instead of failing the job (or silently
    vanishing, as DROPMALFORMED would).

    Fixture: the nation table serialized to JSON lines, with every 5th
    line deterministically truncated mid-object. The query reports good
    vs corrupt counts and the key-sum of successfully-parsed rows; the
    oracle recomputes all three from the same `% 5` rule — so a parser
    that drops, double-counts, or mis-captures corrupt lines mismatches.

    Scale: from_json over a string column is map-only whole-stage
    codegen; the corrupt branch costs nothing on well-formed data.
    """
    from iceberg_examples_spark.catalog import load_table

    nat = load_table(spark, sf_dir, "nation")
    lines = nat.select(
        F.to_json(
            F.struct("n_nationkey", "n_name", "n_regionkey")
        ).alias("j"),
        "n_nationkey",
    )
    # plant corruption: truncate every 5th line mid-object
    dirty = lines.select(
        F.when(
            F.col("n_nationkey") % 5 == 0,
            F.expr("substring(j, 1, cast(length(j) / 2 as int))"),
        )
        .otherwise(F.col("j"))
        .alias("j")
    )
    parsed = dirty.select(
        F.from_json(
            "j",
            "n_nationkey bigint, n_name string, n_regionkey bigint, _bad string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_bad"},
        ).alias("p")
    ).select("p.*")
    return parsed.agg(
        F.sum(F.expr("case when _bad is null then 1 else 0 end")).alias(
            "n_good"
        ),
        F.sum(F.expr("case when _bad is not null then 1 else 0 end")).alias(
            "n_corrupt"
        ),
        # Gate on the corrupt marker rather than relying on corrupt rows
        # parsing to all-NULL: with enablePartialResults (Spark 4.x
        # default) some corruption shapes keep a parsed prefix populated.
        F.sum(
            F.expr("case when _bad is null then n_nationkey end")
        ).alias("good_key_sum"),
    )


def csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CSV twin of :func:`json_corrupt_records` — PERMISSIVE-mode
    parsing with ``columnNameOfCorruptRecord``: malformed rows (every
    5th line carries a non-numeric key and a dangling quote) are
    CAPTURED, not dropped and not job-failing. CSV needs this guard even
    more than JSON: a stray delimiter silently SHIFTS columns in naive
    parsers, which is data corruption, not an error. Same `% 5` planted
    rule, so the oracle pins good/corrupt counts and the parsed key sum.

    Mechanics note: from_csv surfaces the corrupt column only when it is
    declared in the schema; malformed numerics parse to NULL with the
    raw line preserved in the corrupt column."""
    from iceberg_examples_spark.catalog import load_table

    nat = load_table(spark, sf_dir, "nation")
    lines = nat.select(
        F.expr(
            "concat(cast(n_nationkey as string), ',', n_name, ',', "
            "cast(n_regionkey as string))"
        ).alias("c"),
        "n_nationkey",
    )
    dirty = lines.select(
        F.when(
            F.col("n_nationkey") % 5 == 0,
            F.expr("concat('X', c, '\"')"),
        )
        .otherwise(F.col("c"))
        .alias("c")
    )
    parsed = dirty.select(
        F.expr(
            "from_csv(c, 'k int, name string, rk int, _corrupt_record "
            "string', map('mode', 'PERMISSIVE', "
            "'columnNameOfCorruptRecord', '_corrupt_record'))"
        ).alias("r")
    )
    return parsed.agg(
        F.sum(
            F.expr("case when r._corrupt_record is null then 1 else 0 end")
        ).alias("n_good"),
        F.sum(
            F.expr("case when r._corrupt_record is not null then 1 else 0 end")
        ).alias("n_corrupt"),
        F.sum(F.expr("coalesce(r.k, 0)")).alias("key_sum"),
    )
