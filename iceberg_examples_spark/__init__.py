"""iceberg_examples_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``ismailsimsek/iceberg-examples`` (lakehouse table management + mutation
semantics — MERGE upsert / SCD2 / CDC / DELETE / schema evolution — on
columnar storage, driven through Spark SQL), extended with the
LLM-data-pipeline operators a 100 TB training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search, multimodal column plumbing, and
text analysis.

Design stance (see SURVEY.md):
- DataFrame/SQL first; Catalyst does the optimizing.
- Mutations are pure functions DataFrame -> DataFrame (the reference's
  Iceberg ``MERGE INTO`` semantics re-expressed as join algebra), plus a
  snapshot-versioned local table format (`catalog.LocalTable`) for the
  commit/time-travel surface.
- No per-row Python UDFs on any hot path; Pandas UDFs only where
  built-ins genuinely cannot express the op.
"""

__version__ = "0.1.0"

# LAZY public surface (PEP 562): the eager form imported the registry —
# and through it every operator module (~1 s) — on ANY submodule
# import. Every Spark Python worker that unpickles one of this
# package's classes or closures re-pays that import in its own
# process (guide §4: per-task / per-worker init cost); the streaming
# Python DataSource planner worker paid it on every query start. A
# worker now imports only the submodule it actually references.
_EXPORTS = {
    "get_spark": ("iceberg_examples_spark.session", "get_spark"),
    "TABLES": ("iceberg_examples_spark.catalog", "TABLES"),
    "LocalTable": ("iceberg_examples_spark.catalog", "LocalTable"),
    "load_table": ("iceberg_examples_spark.catalog", "load_table"),
    "register_views": (
        "iceberg_examples_spark.catalog",
        "register_views",
    ),
    "MergeCardinalityError": (
        "iceberg_examples_spark.operators.mutations",
        "MergeCardinalityError",
    ),
    "delete_where": (
        "iceberg_examples_spark.operators.mutations",
        "delete_where",
    ),
    "evolve_add_column": (
        "iceberg_examples_spark.operators.mutations",
        "evolve_add_column",
    ),
    "evolve_drop_column": (
        "iceberg_examples_spark.operators.mutations",
        "evolve_drop_column",
    ),
    "merge_star": (
        "iceberg_examples_spark.operators.mutations",
        "merge_star",
    ),
    "merge_upsert": (
        "iceberg_examples_spark.operators.mutations",
        "merge_upsert",
    ),
    "scd2_merge": (
        "iceberg_examples_spark.operators.mutations",
        "scd2_merge",
    ),
    "upsert_by_key": (
        "iceberg_examples_spark.operators.mutations",
        "upsert_by_key",
    ),
    "QUERIES": ("iceberg_examples_spark.registry", "QUERIES"),
    "get_oracles": ("iceberg_examples_spark.registry", "get_oracles"),
}


# star-import compatibility: __getattr__ is not consulted by
# `from pkg import *`, so the lazy surface must declare __all__
# explicitly (ADVICE r12)
__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        mod, attr = _EXPORTS[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
