"""Pin the empirical watermark semantics stream_late_data relies on.

Observed on this pinned Spark (4.1.x, local mode, file source one file
per trigger): for a streaming AGGREGATION,

- the LATE-ROW FILTER for batch N uses the watermark reported for batch
  N-1 (one batch BEHIND the eviction/emission threshold): a late row
  arriving one trigger after the watermark-advancing data is still
  accepted, aggregated, and — if its window is already past the
  watermark — immediately evicted and emitted;
- a late row arriving TWO triggers after is dropped (filtered), so an
  evicted window can never re-emit (append-mode consistency);
- append mode emits exactly the windows whose end ≤ the final watermark.

If a Spark upgrade changes this (e.g. the filter stops lagging),
stream_late_data's oracle arithmetic must be revisited — this test
exists to fail loudly at that moment rather than letting the parity
suite mis-diagnose it.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F


def test_late_filter_lags_eviction_by_one_batch(spark, tmp_path):
    root = str(tmp_path / "late-sem")
    os.makedirs(root)
    batches = {
        0: "2024-01-01 10:00:00",  # advances wm to 09:50 (10 min delay)
        1: "2024-01-01 08:00:00",  # late, but filter still at wm=0: KEPT
        2: "2024-01-01 08:30:00",  # late, filter now at 09:50: DROPPED
        3: "2024-01-01 10:30:00",  # advances wm to 10:20 (final flush)
    }
    for i, ts in batches.items():
        d = spark.createDataFrame([(ts,)], "ts string").select(
            F.col("ts").cast("timestamp").alias("ts")
        )
        p = f"{root}/batch-{i}"
        d.coalesce(1).write.parquet(p)
        for name in os.listdir(p):
            os.utime(os.path.join(p, name), ns=(10**9 * (i + 1),) * 2)
    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{root}/batch-*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sem")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["w"]["start"].hour, r["n"])
        for r in spark.table("late_sem").collect()
    }
    # exactly one emitted window: 08:00-09:00 with n=1 — the batch-1 late
    # row was ACCEPTED (filter lag) and emitted once; the batch-2 row was
    # DROPPED (no n=2 re-emission); the 10:00-11:00 window stays open
    # (end 11:00 > final wm 10:20) and never appears
    assert rows == {(8, 1)}, rows
    shutil.rmtree(root, ignore_errors=True)


def test_fanout_commit_epoch_retry_is_idempotent(spark, sf_dir, tmp_path):
    """Replaying an epoch (Structured Streaming's at-least-once
    foreachBatch contract) must leave BOTH sinks exactly as after the
    first commit: sink A dedups by epoch id, sink B's merge guard makes
    the re-merge a no-op."""
    from iceberg_examples_spark.catalog import LocalTable, load_table
    from iceberg_examples_spark.streaming.rollup import _fanout_commit

    metrics_t = LocalTable(spark, str(tmp_path / "m"))
    latest_t = LocalTable(spark, str(tmp_path / "l"))
    ev = load_table(spark, sf_dir, "events")
    b0 = ev.filter("event_id % 2 = 0")
    b1 = ev.filter("event_id % 2 = 1")

    _fanout_commit(metrics_t, latest_t, b0, 0)
    _fanout_commit(metrics_t, latest_t, b1, 1)
    snap = lambda t: sorted(tuple(r) for r in t.read().collect())  # noqa: E731
    m_before, l_before = snap(metrics_t), snap(latest_t)

    _fanout_commit(metrics_t, latest_t, b1, 1)  # epoch 1 retried
    assert snap(metrics_t) == m_before, "metrics sink double-counted"
    assert snap(latest_t) == l_before, "latest sink drifted on retry"

def test_fanout_commit_retry_after_partial_commit_applies_sink_b(
    spark, sf_dir, tmp_path
):
    """Crash-between-sinks recovery: if an epoch's metrics append (sink
    A) committed but the latest-state merge (sink B) did not, the
    retried epoch must still apply the batch to sink B — the epoch-id
    guard may skip ONLY the append, never the idempotent merge."""
    from iceberg_examples_spark.catalog import LocalTable
    from iceberg_examples_spark.catalog import load_table
    from iceberg_examples_spark.streaming.rollup import _fanout_commit

    metrics_t = LocalTable(spark, str(tmp_path / "m"))
    latest_t = LocalTable(spark, str(tmp_path / "l"))
    ev = load_table(spark, sf_dir, "events")
    b0 = ev.filter("event_id % 2 = 0")
    b1 = ev.filter("event_id % 2 = 1")
    snap = lambda t: sorted(tuple(r) for r in t.read().collect())  # noqa: E731

    _fanout_commit(metrics_t, latest_t, b0, 0)
    l_after_b0 = snap(latest_t)

    # simulate the crash: sink A commits epoch 1's metrics, sink B never
    # sees the batch
    from pyspark.sql import functions as F

    counts1 = (
        b1.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.expr("cast(round(value * 100) as bigint)")
            ).alias("value_cents"),
        )
        .withColumn("epoch_id", F.lit(1).cast("bigint"))
    )
    metrics_t.append(counts1)
    m_after_partial = snap(metrics_t)

    _fanout_commit(metrics_t, latest_t, b1, 1)  # the retry
    assert snap(metrics_t) == m_after_partial, "metrics double-counted"
    assert snap(latest_t) != l_after_b0, "sink B never applied epoch 1"

    # and a full commit of the same shape on fresh tables agrees with
    # the recovered state
    m2 = LocalTable(spark, str(tmp_path / "m2"))
    l2 = LocalTable(spark, str(tmp_path / "l2"))
    _fanout_commit(m2, l2, b0, 0)
    _fanout_commit(m2, l2, b1, 1)
    assert snap(latest_t) == snap(l2)

def test_stream_curation_one_signature_pass_per_epoch(
    spark, sf_dir, monkeypatch
):
    """The streaming curation commit must run the batch's Arrow
    signature pass EXACTLY once per epoch: minhash_index is constructed
    once, staged to parquet, and probe/append/report all consume the
    staged copy. Re-deriving it per verb would run the Arrow stage 2-3x
    per epoch (measured 5.0 -> 3.5 s on the batch twin). Pinned two
    ways: construction count, and the staged frame's physical plan being
    a parquet scan with no MapInPandas/ArrowEvalPython node left to
    re-execute downstream."""
    from iceberg_examples_spark import checkpointing
    from iceberg_examples_spark.operators import dedup
    from iceberg_examples_spark.streaming import rollup

    calls = []
    real_mh = dedup.minhash_index

    def counting_mh(corpus, wide=True, keep=()):
        calls.append(1)
        return real_mh(corpus, wide=wide, keep=keep)

    staged_plans = []
    real_stage = checkpointing.stage

    def spying_stage(df, label="stage"):
        out = real_stage(df, label)
        if label.startswith("scur-batch"):
            staged_plans.append(
                out._jdf.queryExecution().executedPlan().toString()
            )
        return out

    # warm the durable artifacts (landing fixture + base index) so the
    # counted run measures the steady state, not the one-off cold build
    rollup.stream_curation_ingest(spark, sf_dir).count()

    monkeypatch.setattr(dedup, "minhash_index", counting_mh)
    monkeypatch.setattr(checkpointing, "stage", spying_stage)

    out = rollup.stream_curation_ingest(spark, sf_dir)
    assert out.count() == 2  # two epochs reported

    # one signature construction per epoch (the base index is an
    # artifact-cached build, warmed above)
    assert len(calls) == 2, f"signature pass constructed {len(calls)}x"
    assert len(staged_plans) == 2
    for plan in staged_plans:
        assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
        # materialized either way stage() runs: parquet staging dir, or
        # the localCheckpoint fallback (ExistingRDD scan)
        assert "parquet" in plan.lower() or "existingrdd" in plan.lower()


def test_sized_state_partitions_scopes_clamps_and_restores(
    spark, sf_dir, tmp_path
):
    """Contract of the streaming state-partition sizer: (a) tiny inputs
    clamp to the floor of 4; (b) huge inputs clamp to the SESSION DEFAULT
    (the scope may only ever reduce, never raise, parallelism); (c) the
    conf is restored on exit, including via an exception."""
    from iceberg_examples_spark.streaming.rollup import (
        _SHUFFLE_KEY,
        sized_state_partitions,
    )

    before = spark.conf.get(_SHUFFLE_KEY)

    # (a) sf0.001 events is a few KB: floor clamp
    with sized_state_partitions(spark, f"{sf_dir}/events.parquet") as n:
        assert n == 4
        assert spark.conf.get(_SHUFFLE_KEY) == "4"
    assert spark.conf.get(_SHUFFLE_KEY) == before

    # (b) a sparse 1 GiB file (no real disk) would ask for 32 partitions;
    # with the session default pinned to 6 the scope must stay at 6
    big = tmp_path / "big.bin"
    with open(big, "wb") as f:
        f.truncate(1 << 30)
    spark.conf.set(_SHUFFLE_KEY, "6")
    try:
        with sized_state_partitions(spark, str(big)) as n:
            assert n == 6
        assert spark.conf.get(_SHUFFLE_KEY) == "6"
    finally:
        spark.conf.set(_SHUFFLE_KEY, before)

    # (c) exception-safe restore
    try:
        with sized_state_partitions(spark, f"{sf_dir}/events.parquet"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(_SHUFFLE_KEY) == before


def test_ingest_commit_epoch_retry_is_idempotent(spark, sf_dir, tmp_path):
    """stream_incremental_ingest's sink append deduplicates by epoch id:
    re-delivering a committed epoch (foreachBatch is at-least-once) must
    leave the sink unchanged, while a NEW epoch still appends."""
    from iceberg_examples_spark.catalog import LocalTable
    from iceberg_examples_spark.streaming.rollup import _ingest_commit

    sink = LocalTable(spark, str(tmp_path / "sink"))
    batch = spark.createDataFrame(
        [(1, "click", 10.0), (2, "view", 5.0)],
        "event_id long, event_type string, value double",
    )
    _ingest_commit(sink, 1, batch, epoch_id=0)
    first = sorted(map(tuple, sink.read().collect()))
    _ingest_commit(sink, 1, batch, epoch_id=0)  # retried epoch: no-op
    assert sorted(map(tuple, sink.read().collect())) == first
    _ingest_commit(sink, 2, batch, epoch_id=1)  # new epoch: appends
    assert sink.read().count() == 2 * len(first)


def test_keyed_index_append_is_idempotent_and_probe_converges(
    spark, sf_dir, tmp_path
):
    """The curation-epoch retry contract: (a) append_indexed with the
    same key overwrites in place (no duplicate index entries); (b) a
    retried epoch probes with exclude_key=<its own append key>, so its
    already-committed entries are invisible to the re-probe and the
    accepted set converges; (c) WITHOUT exclude_key the same re-probe
    rejects every batch doc against its own entry — exact re-ingestion
    in a later epoch is flagged, not silently re-accepted (ADVICE r7)."""
    from iceberg_examples_spark.catalog import load_table
    from iceberg_examples_spark.operators.curation_index import CurationIndex
    from iceberg_examples_spark.operators.dedup import minhash_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 4 < 2)
    batch = docs.filter(F.col("doc_id") % 4 == 2).limit(40)

    idx = CurationIndex(spark, str(tmp_path / "idx"))
    idx.build(base)
    batch_idx = minhash_index(batch, wide=False, keep=("text",)).cache()

    nd_before = {
        r["batch_doc"]
        for r in idx.probe_indexed(batch_idx).select("batch_doc").collect()
    }
    idx.append_indexed(batch_idx, key="e0")
    size_once = idx._read(idx.lsh_dir).count()
    idx.append_indexed(batch_idx, key="e0")  # retried append: overwrite
    assert idx._read(idx.lsh_dir).count() == size_once

    # retried-epoch re-probe: with exclude_key the epoch's own committed
    # entries are invisible, so the near-dup verdict per batch doc is
    # unchanged — the retry computes the same accepted set
    nd_after = {
        r["batch_doc"]
        for r in idx.probe_indexed(batch_idx, exclude_key="e0")
        .select("batch_doc")
        .collect()
    }
    assert nd_before == nd_after

    # and WITHOUT exclude_key the probe sees the batch's own entries:
    # every batch doc is flagged against itself — a later epoch
    # re-ingesting the same doc_id is rejected, never re-appended
    nd_plain = {
        r["batch_doc"]
        for r in idx.probe_indexed(batch_idx).select("batch_doc").collect()
    }
    batch_ids = {r["doc_id"] for r in batch_idx.select("doc_id").collect()}
    assert nd_plain == batch_ids
    batch_idx.unpersist()
