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

from iceberg_examples_spark.session import get_spark  # noqa: F401
from iceberg_examples_spark.catalog import (  # noqa: F401
    TABLES,
    LocalTable,
    load_table,
    register_views,
)
from iceberg_examples_spark.operators.mutations import (  # noqa: F401
    MergeCardinalityError,
    delete_where,
    evolve_add_column,
    evolve_drop_column,
    merge_star,
    merge_upsert,
    scd2_merge,
    upsert_by_key,
)
from iceberg_examples_spark.registry import QUERIES, get_oracles  # noqa: F401
