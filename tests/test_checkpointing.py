"""checkpointing.stage: localCheckpoint locally, parquet staging when a
staging dir is configured — both strategies must be result-identical."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from iceberg_examples_spark.checkpointing import (
    INDEX_CONF_KEY,
    STAGING_CONF_KEY,
    stage,
)


@pytest.fixture
def staging_conf(spark, tmp_path):
    spark.conf.set(STAGING_CONF_KEY, str(tmp_path))
    yield str(tmp_path)
    spark.conf.unset(STAGING_CONF_KEY)


def test_stage_local_mode_is_localcheckpoint(spark):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = stage(df, "t")
    assert out.count() == 100
    # localCheckpoint truncates lineage to a cached-block scan
    assert "Scan ExistingRDD" in out._jdf.queryExecution().toString()


def test_stage_staging_mode_writes_parquet(spark, staging_conf):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = stage(df, "probe")
    staged = [d for d in os.listdir(staging_conf) if d.startswith("probe-")]
    assert len(staged) == 1, "expected exactly one staged dataset"
    files = os.listdir(os.path.join(staging_conf, staged[0]))
    assert any(f.endswith(".parquet") for f in files)
    assert sorted(r["x"] for r in out.collect()) == [2 * i for i in range(100)]


def test_spread_widens_narrow_input(spark):
    from iceberg_examples_spark.checkpointing import spread

    narrow = spark.range(1000).coalesce(1)
    wide = spread(narrow.toDF("id"))
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert wide.count() == 1000


def test_spread_is_noop_when_already_wide(spark):
    from iceberg_examples_spark.checkpointing import spread

    target = spark.sparkContext.defaultParallelism
    already = spark.range(1000).repartition(target + 4)
    out = spread(already)
    # no extra exchange: partitioning untouched when input >= parallelism
    assert out is already


def test_spread_is_noop_for_many_small_files(spark, tmp_path):
    """A scan of many tiny files (>= target of them) was a no-op under the
    old partition-count check; the plan-size branch must not turn it into
    a full shuffle that could REDUCE parallelism (round-4 ADVICE)."""
    from iceberg_examples_spark.checkpointing import spread

    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "many_small")
    spark.range(10 * target).repartition(target).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= target
    assert spread(df) is df


def test_parse_spark_bytes_forms():
    from iceberg_examples_spark.checkpointing import _parse_spark_bytes

    assert _parse_spark_bytes("134217728") == 134217728
    assert _parse_spark_bytes("128m") == 128 * 1024**2
    assert _parse_spark_bytes("128MB") == 128 * 1024**2
    assert _parse_spark_bytes("1g") == 1024**3
    assert _parse_spark_bytes(" 64k ") == 64 * 1024


def test_spread_scan_decides_without_rdd(spark, sf_dir, monkeypatch):
    """The scan path must decide from plan metadata alone — converting to
    an RDD for the partition count is the physical-planning tax spread()
    exists to avoid (and the silent-fallback failure mode the round-4
    review caught: a broken metadata probe degraded every call to the
    RDD path without any test noticing)."""
    import pyspark.sql

    from iceberg_examples_spark.catalog import load_table
    from iceberg_examples_spark.checkpointing import spread

    def boom(self):
        raise AssertionError("spread() used RDD conversion on a file scan")

    monkeypatch.setattr(pyspark.sql.DataFrame, "rdd", property(boom))
    df = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = spread(df)  # narrow toy scan -> repartition, no .rdd touch
    assert out is not df


def test_spread_preserves_signature_values(spark, sf_dir):
    """Partition layout must not affect per-row-pure Arrow stages: the
    minhash signatures of a 1-partition and an 8-partition corpus are
    identical row sets."""
    from iceberg_examples_spark.operators.signatures import minhash_signatures

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    one = minhash_signatures(docs.coalesce(1), 9, 3, 3)
    many = minhash_signatures(docs.repartition(8), 9, 3, 3)
    rows_one = sorted(
        ((r["doc_id"], tuple(r["shingles"]), r["band0"], r["band1"], r["band2"]))
        for r in one.collect()
    )
    rows_many = sorted(
        ((r["doc_id"], tuple(r["shingles"]), r["band0"], r["band1"], r["band2"]))
        for r in many.collect()
    )
    assert rows_one == rows_many


def test_staged_operator_results_identical(spark, sf_dir, staging_conf):
    """An operator that stages internally (LSH near-dup pairs) must give
    byte-identical results under both strategies."""
    from iceberg_examples_spark.operators.dedup import minhash_lsh

    with_staging = sorted(
        tuple(r) for r in minhash_lsh(spark, sf_dir).collect()
    )
    spark.conf.unset(STAGING_CONF_KEY)
    without = sorted(tuple(r) for r in minhash_lsh(spark, sf_dir).collect())
    assert with_staging == without
    # restore for fixture symmetry
    spark.conf.set(STAGING_CONF_KEY, staging_conf)


def test_persisted_index_builds_once_and_invalidates(spark, tmp_path):
    from iceberg_examples_spark.checkpointing import persisted_index

    dep = tmp_path / "dep.txt"
    dep.write_text("v1")
    idx_root = tmp_path / "idx"
    spark.conf.set(INDEX_CONF_KEY, str(idx_root))
    try:
        df = spark.range(10).withColumn("x", F.col("id") * 3)
        out = persisted_index(spark, df, "t-idx", [str(dep)])
        assert sorted(r["x"] for r in out.collect()) == [
            3 * i for i in range(10)
        ]
        built = set(os.listdir(idx_root))
        assert len(built) == 1

        # same input state: artifact reused, nothing new written — and a
        # callable build is NEVER invoked on a warm hit (the stated point
        # of the thunk signature: the build plan isn't even constructed)
        calls = []

        def thunk():
            calls.append(1)
            return df

        persisted_index(spark, thunk, "t-idx", [str(dep)]).count()
        assert set(os.listdir(idx_root)) == built
        assert calls == [], "warm hit invoked the build callable"

        # changed input state (mtime) invalidates: a second artifact,
        # and the callable IS invoked for the cold rebuild
        os.utime(str(dep), ns=(12345, 12345))
        persisted_index(spark, thunk, "t-idx", [str(dep)]).count()
        assert len(os.listdir(idx_root)) == 2
        assert calls == [1], "cold miss must invoke the build callable"
    finally:
        spark.conf.unset(INDEX_CONF_KEY)


def test_curation_incremental_steady_state_probes_not_rebuilds(
    spark, sf_dir, tmp_path
):
    """Once the base indexes exist, the incremental query's plan must read
    them as parquet artifacts — no base-corpus signature recompute. The
    delta-batch probe itself is staged (materialized once, eagerly), so
    the FINAL plan contains no Arrow stage at all: any MapInPandas node
    here means a corpus- or batch-sized recompute leaked back in."""
    from iceberg_examples_spark.operators.scrub import curation_incremental

    spark.conf.set(STAGING_CONF_KEY, str(tmp_path))
    spark.conf.set(INDEX_CONF_KEY, str(tmp_path))
    try:
        # first invocation builds the two index artifacts
        curation_incremental(spark, sf_dir).collect()
        # steady state: re-plan and inspect
        df = curation_incremental(spark, sf_dir)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 0, (
            "Arrow stage in the steady-state plan: signatures are being "
            "recomputed instead of probed from the staged/persisted state"
        )
        # and the probe's inputs are the persisted artifacts (their
        # staged parquet paths appear as scans in the eager probe's own
        # lineage, checked via the artifacts existing on disk)
        names = os.listdir(tmp_path)
        assert any(n.startswith("base-lsh-index-") for n in names)
        assert any(n.startswith("base-para-index-") for n in names)
    finally:
        spark.conf.unset(STAGING_CONF_KEY)
        spark.conf.unset(INDEX_CONF_KEY)


def test_persisted_index_concurrent_builders_one_artifact(spark, tmp_path):
    """Two racing builders: exactly one artifact survives the atomic
    rename, both callers read identical rows, no .build-* debris left."""
    import threading

    from iceberg_examples_spark.checkpointing import persisted_index

    dep = tmp_path / "dep.txt"
    dep.write_text("v1")
    idx_root = tmp_path / "idx"
    spark.conf.set(INDEX_CONF_KEY, str(idx_root))
    results, errors = [], []

    def build():
        try:
            df = spark.range(50).withColumn("x", F.col("id") * 7)
            out = persisted_index(spark, df, "race-idx", [str(dep)])
            results.append(sorted(r["x"] for r in out.collect()))
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    try:
        threads = [threading.Thread(target=build) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert results[0] == results[1] == [7 * i for i in range(50)]
        names = os.listdir(idx_root)
        assert [n for n in names if ".build-" in n] == []
        assert len([n for n in names if n.startswith("race-idx-")]) == 1
    finally:
        spark.conf.unset(INDEX_CONF_KEY)
