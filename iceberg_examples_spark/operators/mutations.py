"""Lakehouse mutation semantics as pure DataFrame algebra (SURVEY §2.7).

The reference's differentiating surface is row-level mutation on immutable
columnar storage, expressed through Iceberg ``MERGE INTO`` / ``DELETE`` /
``ALTER TABLE`` (`IcebergSQLMerge.java:29-92`,
`IcebergSQLMergeAsDeleteInsert.java:30-50`, `IcebergSCD2.java:51-68`,
`IcebergSQLDelete.java:32,35`) and the low-level equality-delete upsert
(`IcebergJavaApiUpsert.java:99-115`).

This module re-expresses each of those as a pure function
``DataFrame -> DataFrame`` returning the post-mutation table state. That is
the Spark-native formulation: Iceberg's own MERGE planner rewrites the
statement into exactly this join algebra before execution; we declare the
join plan directly and let Catalyst pick the physical strategy. Committing
the result as a new table snapshot is the storage layer's job
(`catalog.LocalTable.overwrite`, or real Iceberg via
`sources/iceberg_compat.py` when the connector jar is present — same API,
different sink).

Scale posture (100 TB targets):
- One full-outer join per merge — single shuffle on the merge keys, no
  repeated scans of the target. AQE handles skewed keys.
- The source side of a merge is typically a small CDC batch: Catalyst
  broadcast-joins it automatically; the target is never collected.
- ``validate_unique_source`` reproduces Iceberg's "a row from the target
  matched multiple source rows" error (optional: it costs one aggregation
  over the source — cheap, source-sized, not target-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MergeCardinalityError(ValueError):
    """Mirrors Iceberg's MERGE cardinality check: multiple source rows
    match one target row → the merge is ambiguous."""


def _check_unique(source: DataFrame, keys: list[str]) -> None:
    dup = (
        source.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise MergeCardinalityError(
            f"source has multiple rows for the same merge key(s) {keys}"
        )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    matched_condition: Column | None = None,
    validate_unique_source: bool = False,
) -> DataFrame:
    """MERGE INTO … WHEN MATCHED [AND cond] THEN UPDATE SET <all cols>
    WHEN NOT MATCHED THEN INSERT — reference `IcebergSQLMerge.java:29-46`
    (plain upsert) and `IcebergSQLMergeAsDeleteInsert.java:30-50` (CDC
    variant: ``matched_condition = target.ts < source.ts``).

    Update/insert columns are the target's columns; the source must contain
    all of them (for schema-tolerant star semantics use
    :func:`merge_star`). ``matched_condition`` may reference columns via
    ``F.col("t.x")`` / ``F.col("s.x")``.

    Physical shape: ONE full-outer join on the keys. Matched rows resolve
    per-column to source (when condition holds) else target; source-only
    rows insert; target-only rows pass through.
    """
    if validate_unique_source:
        _check_unique(source, keys)
    cols = target.columns
    # explicit presence markers: key-nullability can't signal row presence
    # (a NULL-key target row is still a row); SQL MERGE joins with plain
    # equality, so NULL keys never match — they keep/insert respectively.
    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    s = source.withColumn("__s_present", F.lit(True)).alias("s")
    on = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
    joined = t.join(s, on, "full_outer")

    t_present = F.col("t.__t_present").isNotNull()
    s_present = F.col("s.__s_present").isNotNull()
    do_update = (
        t_present & s_present
        if matched_condition is None
        else t_present & s_present & matched_condition
    )
    out_cols = []
    for c in cols:
        tc, sc = F.col(f"t.{c}"), F.col(f"s.{c}")
        out_cols.append(
            F.when(do_update, sc)
            .when(t_present, tc)  # matched-but-condition-false keeps target
            .otherwise(sc)  # insert path
            .alias(c)
        )
    return joined.select(*out_cols)


def merge_star(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    validate_unique_source: bool = False,
) -> DataFrame:
    """MERGE … WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
    INSERT * — the schema-tolerant star expansion of
    `IcebergSQLMerge.java:50-92`:

    - source columns NOT in the target schema are ignored (pre-ADD COLUMN
      behavior, `IcebergSQLMerge.java:60-67`);
    - target columns missing from the source are null-filled on insert and
      left unchanged on update (`IcebergSQLMerge.java:74-92`).

    Star expansion happens against the *target* schema — evolve the target
    first (``evolve_add_column``) to pick up new source columns, exactly as
    the reference does with ``ALTER TABLE … ADD COLUMN`` then re-merge.
    """
    if validate_unique_source:
        _check_unique(source, keys)
    cols = target.columns
    src_cols = set(source.columns)
    missing = [c for c in keys if c not in src_cols]
    if missing:
        raise ValueError(f"merge keys {missing} absent from source")

    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    s = source.withColumn("__s_present", F.lit(True)).alias("s")
    on = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
    joined = t.join(s, on, "full_outer")
    t_present = F.col("t.__t_present").isNotNull()
    s_present = F.col("s.__s_present").isNotNull()
    out_cols = []
    for c in cols:
        tc = F.col(f"t.{c}")
        if c in src_cols:
            sc = F.col(f"s.{c}")
            expr = (
                F.when(t_present & s_present, sc)
                .when(t_present, tc)
                .otherwise(sc)
            )
        else:
            # UPDATE leaves it, INSERT null-fills it
            expr = F.when(t_present, tc).otherwise(F.lit(None).cast(target.schema[c].dataType))
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)


def scd2_merge(
    dim: DataFrame,
    staging: DataFrame,
    key: str = "customer_id",
    tracked: list[str] | None = None,
    eff_col: str = "effective_date",
    end_col: str = "end_date",
    current_col: str = "current",
    high_date: str = "9999-12-31",
) -> DataFrame:
    """Slowly-changing-dimension type 2 in one merge — reference
    `IcebergSCD2.java:51-68` exactly:

    merge source = (staging rows, open-ended)  UNION ALL
                   (current dim rows joined to staging, to be closed)
    merge keys   = (key, eff_col)
    WHEN MATCHED      → close: current=false, end_date = staging.eff_date
    WHEN NOT MATCHED  → insert new current version open to ``high_date``.

    ``tracked`` — the attribute columns carried by both dim and staging
    (default: every staging column except key/eff_col).

    Scale: staging is the small side (a day's changes); the dim⋈staging
    inner join and the final merge join both broadcast the staging side.
    The dim table is scanned once per phase; no driver-side state.
    """
    tracked = tracked or [
        c for c in staging.columns if c not in (key, eff_col)
    ]
    high = F.to_date(F.lit(high_date))

    # Source branch 1: new versions (insert path), IcebergSCD2.java:54
    new_rows = staging.select(
        F.col(key),
        *[F.col(c) for c in tracked],
        F.col(eff_col),
        high.alias(end_col),
    )
    # Source branch 2: current dim rows that have an incoming change
    # (to be closed), IcebergSCD2.java:57-58
    s = staging.alias("s")
    t = dim.alias("t")
    to_close = (
        s.join(
            t,
            (F.col(f"s.{key}") == F.col(f"t.{key}"))
            & (F.col(f"t.{current_col}") == F.lit(True)),
            "inner",
        )
        .select(
            F.col(f"t.{key}").alias(key),
            *[F.col(f"t.{c}").alias(c) for c in tracked],
            F.col(f"t.{eff_col}").alias(eff_col),
            F.col(f"s.{eff_col}").alias(end_col),
        )
    )
    source = new_rows.union(to_close)

    # The merge itself, keyed on (key, eff_col): matched dim rows get
    # closed; unmatched source rows insert as current.
    src = source.withColumn("__s_present", F.lit(True)).alias("src")
    tgt = dim.withColumn("__t_present", F.lit(True)).alias("tgt")
    on = [
        F.col(f"tgt.{key}") == F.col(f"src.{key}"),
        F.col(f"tgt.{eff_col}") == F.col(f"src.{eff_col}"),
    ]
    joined = tgt.join(src, on, "full_outer")
    t_present = F.col("tgt.__t_present").isNotNull()
    s_present = F.col("src.__s_present").isNotNull()

    out = []
    for c in dim.columns:
        tc = F.col(f"tgt.{c}")
        if c == current_col:
            expr = (
                F.when(t_present & s_present, F.lit(False))  # close
                .when(t_present, tc)
                .otherwise(F.lit(True))  # insert as current
            )
        elif c == end_col:
            expr = (
                F.when(t_present & s_present, F.col(f"src.{end_col}"))
                .when(t_present, tc)
                .otherwise(F.col(f"src.{end_col}"))
            )
        elif c in (key, eff_col) or c in tracked:
            expr = F.when(t_present, tc).otherwise(F.col(f"src.{c}"))
        else:
            expr = F.when(t_present, tc).otherwise(F.lit(None))
        out.append(expr.alias(c))
    return joined.select(*out)


def delete_where(target: DataFrame, predicate: Column) -> DataFrame:
    """DELETE FROM … WHERE <pred> — reference `IcebergSQLDelete.java:32`.
    Copy-on-write formulation: keep the complement. On parquet this
    predicate pushes down, so surviving row groups stream through
    untouched."""
    return target.filter(~predicate)


def evolve_add_column(target: DataFrame, name: str, dtype: str) -> DataFrame:
    """ALTER TABLE … ADD COLUMN — reference `IcebergSQLMerge.java:69`,
    `IcebergHadoopTables.java:33`. Existing rows read back null for the
    new column (Iceberg field-id semantics; here an explicit null
    projection — zero data rewrite either way)."""
    return target.withColumn(name, F.lit(None).cast(dtype))


def evolve_drop_column(target: DataFrame, name: str) -> DataFrame:
    """ALTER TABLE … DROP COLUMN — reference `IcebergSQLDelete.java:35`.
    Metadata-only in Iceberg; a projection here."""
    return target.drop(name)


def upsert_by_key(
    target: DataFrame, changes: DataFrame, keys: list[str]
) -> DataFrame:
    """Equality-delete upsert — reference `IcebergJavaApiUpsert.java:99-115`:
    one atomic RowDelta = (equality-delete file keyed on the sort-order
    columns) + (data file with the new rows). Observable semantics:
    delete-by-key then append, i.e. ::

        target ANTI JOIN changes ON keys   UNION ALL   changes

    The anti join is the Spark-native equality delete; at 100 TB with a
    small change batch Catalyst executes it as a broadcast anti join —
    no shuffle of the target at all (merge-on-read spirit: touch only
    what matches)."""
    return target.join(changes, keys, "left_anti").unionByName(
        changes, allowMissingColumns=False
    )
