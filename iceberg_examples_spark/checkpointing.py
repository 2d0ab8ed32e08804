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

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame


STAGING_CONF_KEY = "spark.iceberg_examples.stagingDir"
STAGING_ENV_VAR = "SPARK_GRAFT_STAGING_DIR"

# Separate knob for the durable index-artifact root (persisted_index /
# drop_index_artifacts). Falls back to the staging conf, then a shared
# tempdir. The separation exists so a process can isolate its artifact
# cache (e.g. a test session) WITHOUT flipping stage() from
# localCheckpoint to parquet-staging mode — the two settings answer
# different questions (per-run scratch strategy vs durable cache root),
# and sharing one default root across concurrent processes is unsafe:
# drop_index_artifacts() deletes dirs another process may be mid-scan on.
INDEX_CONF_KEY = "spark.iceberg_examples.indexDir"
INDEX_ENV_VAR = "SPARK_GRAFT_INDEX_DIR"


def index_root(spark) -> str:
    """The durable index-artifact root for this session."""
    return (
        spark.conf.get(INDEX_CONF_KEY, None)
        or os.environ.get(INDEX_ENV_VAR)
        or spark.conf.get(STAGING_CONF_KEY, None)
        or os.environ.get(STAGING_ENV_VAR)
        or os.path.join(tempfile.gettempdir(), "ies-index-cache")
    )


def staging_dir(df: DataFrame) -> str | None:
    """The configured staging root, or None for localCheckpoint mode."""
    conf_val = df.sparkSession.conf.get(STAGING_CONF_KEY, None)
    return conf_val or os.environ.get(STAGING_ENV_VAR) or None


_BYTE_SUFFIXES = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4, "p": 1024**5}


def _parse_spark_bytes(value: str) -> int:
    """Parse Spark byte-size conf values in all their documented forms:
    bare bytes ('134217728'), unit-suffixed ('128m', '128MB', '1g')."""
    s = str(value).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in _BYTE_SUFFIXES:
        mult = _BYTE_SUFFIXES[s[-1]]
        s = s[:-1]
    return int(s) * mult


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow input before a CPU-bound Arrow/Python stage.

    ``mapInPandas`` parallelism equals the input's partition count. A
    small-SF parquet table scans as one split, so a signature/decode
    stage that costs milliseconds of I/O but seconds of CPU runs on one
    core of ``local[32]`` (measured: minhash signatures 2.0 s → 0.8 s at
    sf0.1 after widening). At production scale input splits ≫ cores, the
    guard below is false, and this is a no-op — the repartition only
    fires when the scan is narrower than the session's parallelism, i.e.
    exactly when the cluster would otherwise idle.

    Only safe around per-row-pure stages (signatures, media decode,
    vector assign): partition layout must not affect values.

    The narrowness guard is metadata-only where it matters: Catalyst's
    optimized-plan size estimate (file bytes for a scan) against
    target × maxPartitionBytes decides the two scan extremes without
    converting to an RDD just to count partitions (~0.2 s of physical
    planning per call — a fixed per-query tax that dwarfed the stages it
    was guarding at toy scale). A small frame that is NOT a file scan
    (in-memory / post-shuffle) still gets the exact partition-count
    check, so an already-wide frame is never pointlessly re-shuffled."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    size = None
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j returns small BigInts as Python ints, large ones as objects
        size = int(raw) if isinstance(raw, int) else int(raw.toString())
        max_bytes = _parse_spark_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
    except Exception:
        size = None
    if size is not None and size >= target * max_bytes:
        return df  # enough split material for every core — no-op
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        # many small files already give every core a split; forcing a
        # repartition here would be a pure-loss shuffle (and, for a
        # many-file scan collapsed by plan-size estimate, could REDUCE
        # parallelism to `target`)
        return df
    if n_files > 0 and size is not None:
        # a file scan smaller than target splits AND fewer files than
        # cores: definitely narrow
        return df.repartition(target)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def stage(df: DataFrame, label: str = "stage") -> DataFrame:
    """Materialize ``df`` once and return a frame that re-reads the
    materialized copy (see module docstring for the strategy switch)."""
    root = staging_dir(df)
    if root is None:
        return df.localCheckpoint(eager=True)
    path = os.path.join(root, f"{label}-{uuid.uuid4().hex}")
    df.write.mode("error").parquet(path)
    return df.sparkSession.read.parquet(path)


def persisted_index(
    spark,
    build,
    label: str,
    dep_paths: list[str],
    fingerprint: str = "",
) -> DataFrame:
    """A durable derived-index ARTIFACT, built at most once per input
    state — the incremental pipelines' contract (scrub.curation_incremental):
    the base corpus's LSH / paragraph-hash index is a persisted table that
    batches PROBE, not a frame each run recomputes. ``stage`` is per-run
    scratch; this survives the run, so the steady-state cost of an
    incremental query is O(delta) probe work — the index build amortizes
    to zero, which is the entire point of keeping an index.

    Freshness: the cache key hashes each dependency file's (path,
    mtime_ns, size) PLUS the caller's ``fingerprint`` — the parameters
    and formulation version that determine the index's *content* (LSH
    band/hash counts, tokenizer version, …). Data regeneration and
    definition changes both invalidate the artifact automatically; a
    stale index cannot be silently reused, including across two
    checkouts at different code versions sharing one cache root.
    Writers race safely: build to a temp dir, atomic-rename into place,
    lose gracefully to a concurrent winner.

    This is the LOCAL-filesystem strategy (os.stat / os.rename). A
    cluster deployment stores the index as a real table (the LocalTable /
    Iceberg layer here) and uses snapshot ids for freshness instead —
    same contract, durable catalog instead of a directory.

    ``build`` is a DataFrame or (preferably) a zero-arg callable
    returning one: the cache key is computed from dep state alone, so on
    a warm hit a callable's build PLAN is never even constructed —
    measured ~0.15 s of py4j plan-building per probe saved in the warm
    incremental path."""
    stats = []
    for p in dep_paths:
        st = os.stat(p)
        stats.append(f"{p}:{st.st_mtime_ns}:{st.st_size}")
    key = hashlib.md5(
        "|".join([label, fingerprint, *stats]).encode()
    ).hexdigest()[:16]
    root = index_root(spark)
    path = os.path.join(root, f"{label}-{key}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return _artifact_reader(spark, path)
    df = build() if callable(build) else build
    os.makedirs(root, exist_ok=True)
    tmp = f"{path}.build-{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        # a concurrent builder won the rename race — use its artifact
        shutil.rmtree(tmp, ignore_errors=True)
    return _artifact_reader(spark, path)


# Reader-frame cache for persisted artifacts: creating a parquet reader
# costs a driver-side schema/footer probe (~0.1 s each) that a warm
# incremental run would otherwise pay per probe per invocation. Safe to
# memoize: DataFrames are immutable plans, and an artifact path encodes
# its content key (label + input-state + fingerprint hash), so a given
# path's bytes never change once the _SUCCESS marker exists.
_reader_cache: dict[tuple[str, str], DataFrame] = {}


def drop_index_artifacts(spark, label_prefixes: tuple[str, ...]) -> int:
    """Delete persisted-index artifacts whose directory name starts with
    any of ``label_prefixes`` (and purge their cached readers) — the
    cold-path reset used by bench.py to measure index BUILD cost
    separately from the steady-state probe. Returns dirs removed."""
    root = index_root(spark)
    removed = 0
    if os.path.isdir(root):
        for name in os.listdir(root):
            if any(name.startswith(p) for p in label_prefixes):
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
                removed += 1
    for key in [k for k in _reader_cache if k[1].startswith(root)]:
        if any(os.path.basename(key[1]).startswith(p) for p in label_prefixes):
            del _reader_cache[key]
    return removed


def _artifact_reader(spark, path: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, path)
    df = _reader_cache.get(key)
    if df is None:
        df = _reader_cache[key] = spark.read.parquet(path)
    return df
