"""Materialization strategy for multi-branch / iterative plans.

Several operators materialize an intermediate relation once so that
downstream plan branches (self-joins, anti-joins, fixpoint loops) re-read
it instead of recomputing its subtree: LSH signatures
(``operators/dedup.py::lsh_verified_pairs``), the gated corpus in the
pipeline capstones (``operators/llm_pipeline.py``,
``operators/scrub.py``), the edge list + per-round labels in connected
components, and the exploded embedding relation in clustering.

On ``local[n]`` the right mechanism is ``localCheckpoint`` (blocks cached
in the one JVM, zero I/O). On a real cluster localCheckpoint is NOT
durable — blocks die with their executor, which kills long iterative
jobs — so the same call sites must become writes to reliable storage.
:func:`stage` is that switch, driven by one conf/env setting instead of
per-site comments:

- ``spark.iceberg_examples.stagingDir`` conf (or ``SPARK_GRAFT_STAGING_DIR``
  env) set → write the frame to ``<dir>/<label>-<uuid>`` as parquet and
  read it back: a reliable-storage staging table that survives executor
  loss, truncates lineage cluster-wide, and is inspectable after the run.
- unset (the default here) → ``localCheckpoint(eager=True)``.

Staged directories are transient job scratch: a production deployment
points stagingDir at a TTL'd scratch bucket/path (the same discipline as
``spark.sql.streaming.checkpointLocation``), so no cleanup pass is
needed mid-job and failed-job debris ages out with the TTL.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame


STAGING_CONF_KEY = "spark.iceberg_examples.stagingDir"
STAGING_ENV_VAR = "SPARK_GRAFT_STAGING_DIR"


def staging_dir(df: DataFrame) -> str | None:
    """The configured staging root, or None for localCheckpoint mode."""
    conf_val = df.sparkSession.conf.get(STAGING_CONF_KEY, None)
    return conf_val or os.environ.get(STAGING_ENV_VAR) or None


def stage(df: DataFrame, label: str = "stage") -> DataFrame:
    """Materialize ``df`` once and return a frame that re-reads the
    materialized copy (see module docstring for the strategy switch)."""
    root = staging_dir(df)
    if root is None:
        return df.localCheckpoint(eager=True)
    path = os.path.join(root, f"{label}-{uuid.uuid4().hex}")
    df.write.mode("error").parquet(path)
    return df.sparkSession.read.parquet(path)
