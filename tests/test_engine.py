"""Engine-level unit tests: snapshot table format, mutation edge cases,
multimodal plumbing, plan shapes (pushdown/broadcast)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import LocalTable
from iceberg_examples_spark.operators import mutations as M
from iceberg_examples_spark.operators.relational import filter_conj, tpch_q3
from iceberg_examples_spark.sources import multimodal as MM


# ---- LocalTable: snapshots, append, time travel -------------------------

def test_localtable_snapshots_and_time_travel(spark, tmp_path):
    t = LocalTable(spark, str(tmp_path / "tbl"))
    assert not t.exists()
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    v0 = t.create(df1)
    assert v0 == 0 and t.exists()
    v1 = t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    assert v1 == 1
    assert t.read().count() == 3
    assert t.read(version=0).count() == 2  # time travel
    log = t.snapshots()
    assert [s["operation"] for s in log] == ["create", "append"]
    assert log[1]["parent"] == 0


def test_localtable_overwrite_commits_new_snapshot(spark, tmp_path):
    t = LocalTable(spark, str(tmp_path / "tbl2"))
    t.create(spark.createDataFrame([(1,)], "id long"))
    t.overwrite(spark.createDataFrame([(9,), (10,)], "id long"))
    assert t.read().count() == 2
    assert t.read(version=0).collect()[0].id == 1


def test_localtable_concurrent_commit_conflict(spark, tmp_path):
    """Optimistic concurrency: two committers that both read version N and
    race to publish N+1 — exactly one wins; the loser raises
    CommitConflictError, leaves no orphan data, and the winner's snapshot
    is intact (no lost update)."""
    import os

    from iceberg_examples_spark.catalog import CommitConflictError

    t = LocalTable(spark, str(tmp_path / "tbl_cas"))
    t.create(spark.createDataFrame([(1,)], "id long"))

    # Writer A (another handle on the same root) wins version 1 first.
    a = LocalTable(spark, str(tmp_path / "tbl_cas"))
    a.append(spark.createDataFrame([(2,)], "id long"))

    # Writer B raced: it read meta at version 0 (before A committed), so
    # its CAS on version 1 must fail. Reproduce B's stale read by driving
    # _commit's publish against a pre-A metadata snapshot.
    stale = {
        "current": 0,
        "snapshots": [s for s in t.snapshots() if s["version"] == 0],
    }
    stale["snapshots"].append({"version": 1, "parent": 0, "operation": "append",
                               "path": "snap-00001-deadbeef", "schema": {},
                               "partition_by": []})
    stale["current"] = 1
    with pytest.raises(CommitConflictError):
        t._publish_meta(stale, 1)

    # Winner's commit survives; no temp files leak.
    assert t.read().count() == 2
    assert t.current_version == 1
    leftovers = [f for f in os.listdir(t.root) if f.endswith(".json.tmp")]
    assert leftovers == []


def test_localtable_racing_commits_unique_data_dirs(spark, tmp_path):
    """Each commit attempt stages data in its own token-suffixed dir, so a
    losing committer can never have clobbered the winner's files."""
    t = LocalTable(spark, str(tmp_path / "tbl_tok"))
    t.create(spark.createDataFrame([(1,)], "id long"))
    t.append(spark.createDataFrame([(2,)], "id long"))
    paths = [s["path"] for s in t.snapshots()]
    assert len(set(paths)) == 2
    assert all(len(p.split("-")) == 3 for p in paths)  # snap-NNNNN-token


# ---- mutation edge cases ------------------------------------------------

def test_merge_cardinality_check(spark):
    target = spark.createDataFrame([(1, "x")], "id long, v string")
    dup_source = spark.createDataFrame(
        [(1, "a"), (1, "b")], "id long, v string"
    )
    with pytest.raises(M.MergeCardinalityError):
        M.merge_upsert(target, dup_source, ["id"], validate_unique_source=True)


def test_merge_upsert_null_key_rows_kept(spark):
    # eqNullSafe join keys: a NULL-key target row must survive untouched
    target = spark.createDataFrame([(None, "keep"), (1, "old")], "id long, v string")
    source = spark.createDataFrame([(1, "new")], "id long, v string")
    out = {r.v for r in M.merge_upsert(target, source, ["id"]).collect()}
    assert out == {"keep", "new"}


def test_merge_star_requires_key_in_source(spark):
    target = spark.createDataFrame([(1, "x")], "id long, v string")
    source = spark.createDataFrame([("y",)], "v string")
    with pytest.raises(ValueError, match="merge keys"):
        M.merge_star(target, source, ["id"])


def test_evolve_add_then_drop_roundtrip(spark):
    df = spark.createDataFrame([(1,)], "id long")
    evolved = M.evolve_add_column(df, "extra", "string")
    assert evolved.schema["extra"].dataType.typeName() == "string"
    back = M.evolve_drop_column(evolved, "extra")
    assert back.columns == ["id"]


# ---- multimodal plumbing ------------------------------------------------

def test_decode_rejects_non_bmp():
    with pytest.raises(ValueError, match="BM"):
        MM.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_bmp_roundtrip_matches_generative_formula():
    """encode_bmp must produce a byte layout decode_image can parse back
    to exactly the generative pixel statistics — including the
    position-weighted checksum that pins row order and stride padding."""
    d = 7
    stats = MM.decode_image(MM.encode_bmp(d))
    exp_b = exp_g = exp_r = exp_w = 0
    for y in range(MM.IMG_H):
        for x in range(MM.IMG_W):
            b, g, r = MM._pixel(d, x, y)
            exp_b += b
            exp_g += g
            exp_r += r
            exp_w += (1 + x + MM.IMG_W * y) * b
    assert stats == {
        "width": MM.IMG_W,
        "height": MM.IMG_H,
        "sum_b": exp_b,
        "sum_g": exp_g,
        "sum_r": exp_r,
        "wsum_b": exp_w,
    }


def test_wav_roundtrip_matches_generative_formula():
    """encode_wav must produce a RIFF layout decode_audio parses back to
    exactly the generative sample statistics (sign handling, endianness,
    chunk offsets all pinned by the exact integer sums)."""
    d = 11
    stats = MM.decode_audio(MM.encode_wav(d))
    samples = [MM._sample(d, i) for i in range(MM._n_samples(d))]
    assert stats == {
        "n_samples": len(samples),
        "sample_rate": MM.WAV_RATE,
        "duration_us": len(samples) * 1_000_000 // MM.WAV_RATE,
        "sum_s": sum(samples),
        "energy": sum(s * s for s in samples),
        "min_s": min(samples),
        "max_s": max(samples),
    }


def test_wav_decoder_walks_chunk_list():
    """An extra chunk before fmt/data (e.g. LIST metadata) must not break
    the decoder — it walks chunks by id+size, not fixed offsets. Odd-sized
    chunks are word-aligned per RIFF."""
    import struct as _s

    wav = MM.encode_wav(5)
    extra = b"LIST" + _s.pack("<I", 5) + b"INFOx" + b"\x00"  # padded to even
    patched = bytearray(wav[:12] + extra + wav[12:])
    _s.pack_into("<I", patched, 4, len(patched) - 8)
    assert MM.decode_audio(bytes(patched)) == MM.decode_audio(wav)


def test_wav_decoder_rejects_bad_payloads():
    with pytest.raises(ValueError, match="RIFF"):
        MM.decode_audio(b"OggS" + b"\x00" * 64)
    import struct as _s

    # stereo (channels=2) is an unsupported variant
    wav = bytearray(MM.encode_wav(1))
    _s.pack_into("<H", wav, 22, 2)
    with pytest.raises(ValueError, match="unsupported"):
        MM.decode_audio(bytes(wav))
    # zero sample rate would divide by zero downstream — rejected up front
    wav = bytearray(MM.encode_wav(1))
    _s.pack_into("<I", wav, 24, 0)
    with pytest.raises(ValueError, match="unsupported"):
        MM.decode_audio(bytes(wav))
    # a clip cut mid-data must raise, not silently return half the stats
    full = MM.encode_wav(1)
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_audio(full[: len(full) - 10])
    # a clip cut inside the fmt chunk must raise ValueError (not
    # struct.error) per the decoder's rejection contract
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_audio(full[:24])


def test_bmp_decoder_handles_top_down_rows():
    """Negative height = top-down row storage; the decoder must map rows
    accordingly (wsum_b differs between orientations unless handled)."""
    img = bytearray(MM.encode_bmp(3))
    bottom_up = MM.decode_image(bytes(img))
    # flip to top-down: negate height, reverse the stored row order
    import struct as _s

    (off,) = _s.unpack_from("<I", img, 10)
    w, h = _s.unpack_from("<ii", img, 18)
    _s.pack_into("<i", img, 22, -h)
    stride = (w * 3 + 3) & ~3
    rows = [img[off + i * stride: off + (i + 1) * stride] for i in range(h)]
    img[off:] = b"".join(reversed(rows))
    assert MM.decode_image(bytes(img)) == bottom_up


def test_fake_features_deterministic_histogram():
    feats = MM.fake_features(b"abcabc", n_features=8)
    assert sum(feats) == 6
    assert feats == MM.fake_features(b"abcabc", n_features=8)


def test_frame_sample_shapes(spark, sf_dir):
    media = MM.build_media_table(spark, sf_dir).limit(3)
    frames = MM.frame_sample(media, every_n_bytes=64).collect()
    assert all(len(r.frame_bytes) <= 64 for r in frames)
    # every media item yields at least one frame
    assert {r.media_id for r in frames} == {r.media_id for r in media.collect()}


# ---- plan shapes: the optimizer must see what we think it sees ----------

def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    plan = filter_conj(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:200]


def test_tpch_q3_broadcasts_customer(spark, sf_dir):
    plan = tpch_q3(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scan_prunes_columns(spark, sf_dir):
    plan = filter_conj(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # projection pruning: the scan must not read all 11 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_tax" not in read_schema


# ---- iceberg compat gating ---------------------------------------------

def test_iceberg_compat_gates_cleanly(spark):
    from iceberg_examples_spark.sources import iceberg_compat as IC

    confs = IC.iceberg_confs("/tmp/warehouse")
    assert confs["spark.sql.catalog.spark_catalog.type"] == "hadoop"
    if not IC.iceberg_available(spark):
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            IC.IcebergTable(spark, "default.t")


# ---- shuffle budget regression: plans must not grow extra exchanges -----

def _n_shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_shuffle_budget_q1(spark, sf_dir):
    from iceberg_examples_spark.operators.relational import agg_sum_by_key
    assert _n_shuffles(agg_sum_by_key(spark, sf_dir)) <= 1


def test_shuffle_budget_q3(spark, sf_dir):
    # all joins broadcast; the only hash shuffle is the groupBy
    assert _n_shuffles(tpch_q3(spark, sf_dir)) <= 1


def test_shuffle_budget_filter_scan(spark, sf_dir):
    assert _n_shuffles(filter_conj(spark, sf_dir)) == 0


def test_shuffle_budget_merge(spark, sf_dir):
    # one full-outer join = at most one shuffle per side
    from iceberg_examples_spark.operators.reference_scenarios import (
        merge_upsert_query,
    )
    assert _n_shuffles(merge_upsert_query(spark, sf_dir)) <= 2


# ---- write-side sort order (T3) ----------------------------------------

def test_write_sorted_within_partitions(spark, sf_dir, tmp_path):
    from iceberg_examples_spark.operators.partitioning import (
        month,
        with_partition_keys,
        write_partitioned,
    )
    from iceberg_examples_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    out = str(tmp_path / "sorted")
    write_partitioned(
        with_partition_keys(li, {"ship_month": month("l_shipdate")}),
        out,
        ["ship_month"],
        sort_within=["l_orderkey"],
    )
    import glob
    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{out}/ship_month=*/*.parquet"))
    assert files
    # each directory holds exactly one file (bounded-file-count contract)
    dirs = {f.rsplit("/", 1)[0] for f in files}
    assert len(files) == len(dirs)
    # rows inside a file are sorted by the write-side sort order
    col = pq.read_table(files[0], columns=["l_orderkey"])["l_orderkey"].to_pylist()
    assert col == sorted(col)


def test_connected_components_deep_path_graph(spark):
    """A path graph of diameter 299 converges inside the 20-round cap:
    pointer doubling makes rounds O(log diameter), where plain min-label
    propagation (the pre-fix algorithm) would need 299 rounds and raise."""
    from iceberg_examples_spark.operators.dedup import connected_components

    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = connected_components(edges).collect()
    assert len(out) == n
    assert all(r.component == 0 for r in out)


def test_connected_components_matches_union_find(spark):
    """Random multi-component graph vs an independent union-find model."""
    import random

    from iceberg_examples_spark.operators.dedup import connected_components

    rng = random.Random(7)
    raw = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [e for e in raw if e[0] != e[1]]

    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    present = sorted({x for e in edges for x in e})
    comp_min: dict[int, int] = {}
    for x in present:  # ascending, so first-seen per root is the min id
        comp_min.setdefault(find(x), x)
    expected = {x: comp_min[find(x)] for x in present}

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.component for r in connected_components(df).collect()}
    assert got == expected


def test_localtable_changes_and_compact(spark, tmp_path):
    t = LocalTable(spark, str(tmp_path / "tbl3"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.append(spark.createDataFrame([(3, "c"), (3, "c")], "id long, v string"))
    # incremental read: exactly the appended rows, bag semantics
    delta = t.changes(0, 1).collect()
    assert sorted((r.id, r.v) for r in delta) == [(3, "c"), (3, "c")]
    # compaction: new snapshot, same data, fewer files
    v = t.compact(target_files=1)
    assert t.snapshots()[-1]["operation"] == "compact"
    assert t.read(v).count() == 4
    import glob
    snap_path = [s["path"] for s in t.snapshots() if s["version"] == v][0]
    files = glob.glob(f"{tmp_path}/tbl3/{snap_path}/*.parquet")
    assert len(files) == 1


def test_pii_regex_dot_is_literal(spark):
    """Spark's SQL literal parser eats one level of backslashes, so an
    unescaped pattern would turn '\\.' into any-char '.' and diverge from
    the DuckDB oracle. Pin that the dot stays literal through _spark_re:
    'a@b cd' (space where the dot belongs) must NOT match."""
    from iceberg_examples_spark.operators.scrub import EMAIL_RE, _spark_re

    df = spark.createDataFrame([("a@b cd",), ("a@b.cd",)], "s string")
    got = df.select(
        F.expr(
            f"cast(regexp_count(s, '{_spark_re(EMAIL_RE)}') as int)"
        ).alias("n"),
        "s",
    ).collect()
    assert {r.s: r.n for r in got} == {"a@b cd": 0, "a@b.cd": 1}


def test_stream_cdc_merge_batch_count_invariant(spark, sf_dir):
    """The foreachBatch merge guard must make the sink idempotent and
    batch-split-invariant: replaying the events in two arbitrary chunks
    (here: by event_id parity, so late/early rows interleave) must land
    on the same table as the single-batch run."""
    from pyspark.sql import Window

    from iceberg_examples_spark.catalog import LocalTable, load_table
    from iceberg_examples_spark.operators.mutations import merge_upsert

    ev = load_table(spark, sf_dir, "events")

    def reduce_latest(df):
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(
                "user_id",
                F.col("ts").cast("timestamp_ntz").alias("last_ts"),
                F.col("event_id").alias("last_event_id"),
                "event_type",
                "value",
            )
        )

    newer = (F.col("s.last_ts") > F.col("t.last_ts")) | (
        (F.col("s.last_ts") == F.col("t.last_ts"))
        & (F.col("s.last_event_id") >= F.col("t.last_event_id"))
    )
    state = reduce_latest(ev.filter("event_id % 2 = 0"))
    state = merge_upsert(
        state, reduce_latest(ev.filter("event_id % 2 = 1")), ["user_id"], newer
    )
    single = reduce_latest(ev)
    assert state.exceptAll(single).count() == 0
    assert single.exceptAll(state).count() == 0


def test_localtable_cas_no_lost_update(spark, tmp_path):
    """The publish version must come from the SAME metadata read that
    produced the commit's state: a writer holding a stale read must
    CONFLICT when another commit landed in between — publishing at
    max-listing+1 instead would silently erase the interleaved commit
    (the lost-update bug this pins)."""
    from iceberg_examples_spark.catalog import CommitConflictError

    t = LocalTable(spark, str(tmp_path / "tbl_race"))
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))

    # writer A reads state (meta v0) ...
    meta_a, ver_a = t._read_meta_versioned()
    # ... writer B completes a full append in the window (publishes v1)
    b = LocalTable(spark, str(tmp_path / "tbl_race"))
    b.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    # A's publish from the stale read must now conflict, not win
    meta_a["snapshots"] = list(meta_a["snapshots"])
    with pytest.raises(CommitConflictError):
        t._publish_meta(meta_a, ver_a + 1)
    # B's commit survived
    assert t.read().count() == 2

    # same guarantee for expiry racing a data commit: stale-read expiry
    # must not roll back the interleaved append
    meta_e, ver_e = t._read_meta_versioned()
    b.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    with pytest.raises(CommitConflictError):
        t._publish_meta(meta_e, ver_e + 1)
    assert t.read().count() == 3


def test_localtable_wap_stage_publish(spark, tmp_path):
    """Write-audit-publish: staged snapshots are invisible to plain
    reads, auditable by version, publishable as a fast-forward only, and
    abandonable without a trace in the data."""
    from iceberg_examples_spark.catalog import CommitConflictError

    t = LocalTable(spark, str(tmp_path / "tbl_wap"))
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))

    v = t.stage(
        t.read().unionByName(
            spark.createDataFrame([(2, "b")], "id long, v string")
        )
    )
    # invisible until published; auditable by version
    assert t.read().count() == 1
    assert t.read(v).count() == 2
    t.publish(v)
    assert t.current_version == v
    assert t.read().count() == 2
    # double-publish / publishing a non-staged version is an error
    with pytest.raises(ValueError):
        t.publish(v)

    # a staged snapshot whose parent is no longer head cannot publish
    v2 = t.stage(
        t.read().unionByName(
            spark.createDataFrame([(3, "c")], "id long, v string")
        )
    )
    t.append(spark.createDataFrame([(9, "z")], "id long, v string"))
    with pytest.raises(CommitConflictError):
        t.publish(v2)
    t.drop_staged(v2)
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 9]

    # data commits racing a staged snapshot must not collide versions:
    # the append above took a version ABOVE the staged v2
    assert t.current_version > v2


def test_localtable_remove_orphans(spark, tmp_path):
    """remove_orphans deletes only unreferenced snap-* dirs (crashed
    commits) past the grace period — never data referenced by snapshots,
    and never a fresh dir that could belong to an in-flight commit."""
    import os

    t = LocalTable(spark, str(tmp_path / "tbl_orph"))
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    os.makedirs(os.path.join(t.root, "snap-77777-feedface"))
    # default grace period protects a just-written dir (in-flight commit)
    assert t.remove_orphans() == 0
    assert t.remove_orphans(older_than_s=0) == 1
    assert t.remove_orphans(older_than_s=0) == 0  # idempotent
    assert t.read().count() == 2
    assert t.read(0).count() == 1  # history intact


def test_localtable_expire_skips_staged(spark, tmp_path):
    """Staged (WAP) snapshots are pending work: expiry must never delete
    them, and a pending staged snapshot must not break retention of the
    data lineage (the expire/WAP interaction bug this pins)."""
    t = LocalTable(spark, str(tmp_path / "tbl_exps"))
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))
    v_staged = t.stage(
        t.read().unionByName(
            spark.createDataFrame([(2, "b")], "id long, v string")
        )
    )
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    t.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    # 3 data snapshots + 1 staged; keep last 2 data → expire 1, staged kept
    assert t.expire_snapshots(keep_last=2) == 1
    assert t.read(v_staged).count() == 2  # staged data intact, auditable
    # keep_last=1 with only staged+current left: nothing data-expirable
    # beyond current... expire the older retained one
    assert t.expire_snapshots(keep_last=1) == 1
    assert t.read(v_staged).count() == 2
    # the staged snapshot still publishes/drops normally (parent moved on
    # → conflict), and drop removes it cleanly
    t.drop_staged(v_staged)
    assert t.read().count() == 3


def test_localtable_version_never_reused(spark, tmp_path):
    """Dropped/expired snapshot versions must never be re-minted: a slow
    WAP writer still holding version v must get FileNotFoundError on
    read(v), never another snapshot's data."""
    t = LocalTable(spark, str(tmp_path / "tbl_mono"))
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))
    v1 = t.stage(spark.createDataFrame([(2, "b")], "id long, v string"))
    t.drop_staged(v1)
    v2 = t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    assert v2 > v1  # not re-minted
    with pytest.raises(FileNotFoundError):
        t.read(v1)
    # same via automated staged expiry
    v3 = t.stage(spark.createDataFrame([(4, "d")], "id long, v string"))
    assert t.expire_snapshots(keep_last=2, max_staged_age_s=0) == 1
    v4 = t.append(spark.createDataFrame([(5, "e")], "id long, v string"))
    assert v4 > v3
    with pytest.raises(FileNotFoundError):
        t.read(v3)


def test_localtable_staged_only_table_expiry(spark, tmp_path):
    """A WAP stage on a fresh table (no data commit yet, current=-1)
    followed by aged expiry must work — the crashed-first-writer case
    the escape hatch exists for."""
    t = LocalTable(spark, str(tmp_path / "tbl_fresh"))
    v = t.stage(spark.createDataFrame([(1, "a")], "id long, v string"))
    assert t.current_version == -1
    assert t.expire_snapshots(keep_last=1, max_staged_age_s=0) == 1
    with pytest.raises(FileNotFoundError):
        t.read(v)
    assert t.snapshots() == []


def test_localtable_legacy_staged_entry_ages_out(spark, tmp_path):
    """A staged entry written by an older engine version (no committed_at
    field) has unknown age — it must be treated as infinitely old, not
    immortal."""
    t = LocalTable(spark, str(tmp_path / "tbl_legacy"))
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))
    v = t.stage(spark.createDataFrame([(2, "b")], "id long, v string"))
    meta, read_version = t._read_meta_versioned()
    for s in meta["snapshots"]:
        s.pop("committed_at", None)
    t._publish_meta(meta, read_version + 1)
    assert t.expire_snapshots(keep_last=1, max_staged_age_s=3600) == 1
    with pytest.raises(FileNotFoundError):
        t.read(v)


def test_localtable_stale_staged_expiry(spark, tmp_path):
    """An abandoned staged snapshot (WAP writer crashed before publish/
    drop) must not pin data forever: max_staged_age_s ages it out, while
    fresh staged snapshots are untouched."""
    t = LocalTable(spark, str(tmp_path / "tbl_stale"))
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))
    v = t.stage(
        t.read().unionByName(
            spark.createDataFrame([(2, "b")], "id long, v string")
        )
    )
    # default: staged immortal
    assert t.expire_snapshots(keep_last=1) == 0
    # fresh staged survives an aged expiry
    assert t.expire_snapshots(keep_last=1, max_staged_age_s=3600) == 0
    assert t.read(v).count() == 2
    # aged-out staged is dropped (age 0 = everything is stale)
    assert t.expire_snapshots(keep_last=1, max_staged_age_s=0) == 1
    with pytest.raises(FileNotFoundError):
        t.read(v)
    assert t.read().count() == 1  # data lineage untouched
    # guards
    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=1, max_staged_age_s=-1)
    with pytest.raises(ValueError):
        t.remove_orphans(older_than_s=-5)


def test_localtable_expire_snapshots(spark, tmp_path):
    import os

    import pytest as _pytest

    t = LocalTable(spark, str(tmp_path / "tbl_exp"))
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    t.compact(target_files=1)
    assert len(t.snapshots()) == 4

    n = t.expire_snapshots(keep_last=2)
    assert n == 2
    # current unchanged, retention window honored
    assert t.current_version == 3
    assert [s["version"] for s in t.snapshots()] == [2, 3]
    assert t.read().count() == 3
    # time travel inside the window still works; to an expired snapshot fails
    assert t.read(2).count() == 3
    with _pytest.raises(FileNotFoundError):
        t.read(0)
    # expired data dirs physically removed
    dirs = [d for d in os.listdir(t.root) if d.startswith("snap-")]
    assert len(dirs) == 2
    # expiry is idempotent when nothing is expirable
    assert t.expire_snapshots(keep_last=2) == 0

    # commits after expiry: snapshot versions continue from current, and
    # the metadata CAS sequence (decoupled from snapshot versions) still
    # serializes racing writers
    v = t.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    assert v == 4
    assert t.read().count() == 4
    assert [s["version"] for s in t.snapshots()] == [2, 3, 4]
    # the expiry published a metadata-only version: meta files > snapshots
    metas = [d for d in os.listdir(t.root) if d.startswith("_metadata.v")]
    assert len(metas) == 6  # 5 commits + 1 expiry

    # keep_last must retain the current snapshot
    with _pytest.raises(ValueError):
        t.expire_snapshots(keep_last=0)


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both fact tables on the join key removes the join
    shuffle entirely — the 100 TB co-location strategy (DESIGN.md).
    Plan must contain no Exchange for the join."""
    from iceberg_examples_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_parquet_footer_stats_match_actual_counts(spark, sf_dir):
    """The pyarrow footer-reading path (metadata_files) at the ACTIVE sf:
    row-group num_rows must sum to the table's true row count. (The
    declared query pins sf0.01 because its oracle needs a literal path;
    this covers the code path at other scale factors.)"""
    import pyarrow.parquet as pq

    for table in ["lineitem", "orders"]:
        md = pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata
        footer_rows = sum(
            md.row_group(i).num_rows for i in range(md.num_row_groups)
        )
        actual = spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
        assert footer_rows == actual


def test_zorder_layout_locality(spark, sf_dir, tmp_path):
    """Z-ordered layout must make file-level min/max stats selective on
    BOTH clustering keys: a point predicate on l_partkey may only touch a
    strict subset of files (random/unsorted layout touches all of them).
    Measured directly from the parquet footers the scan planner would use."""
    import glob

    import pyarrow.parquet as pq

    from iceberg_examples_spark.operators.partitioning import write_zordered

    out = str(tmp_path / "zorder")
    write_zordered(spark, sf_dir, out, n_files=8)
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) > 1

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = min(
            md.row_group(g).column(idx["l_partkey"]).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx["l_partkey"]).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))

    glo = min(lo for lo, _ in ranges)
    ghi = max(hi for _, hi in ranges)
    probes = range(glo, ghi + 1, max(1, (ghi - glo) // 50))
    hits = [
        sum(1 for lo, hi in ranges if lo <= v <= hi) for v in probes
    ]
    avg_fraction = sum(hits) / len(hits) / len(files)
    # z-sorted on (partkey, suppkey): a partkey point probe must prune
    # most files; an unclustered layout would give fraction == 1.0
    assert avg_fraction <= 0.6, f"poor partkey locality: {avg_fraction:.2f}"


def test_bloom_filter_injected(spark, sf_dir):
    """Under cluster-scale conditions (no broadcast, application-side scan
    threshold zeroed) Catalyst must rewrite bloom_prune_join to inject a
    runtime bloom filter into the lineitem scan — the shuffle-avoidance
    strategy the query's docstring claims for 100 TB."""
    from iceberg_examples_spark.operators.partitioning import bloom_prune_join

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = bloom_prune_join(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
        # and the filter sits on the lineitem side, upstream of the join
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_kmeans_inertia_decreases(spark, sf_dir):
    """Lloyd's algorithm invariant: total inertia is non-increasing from
    round to round (each assignment step and each centroid update can
    only lower the objective). Evaluated on the exact integer distances,
    so the comparison is noise-free."""
    from iceberg_examples_spark.operators import clustering as CL

    e = CL._long_form(spark, sf_dir)
    cent = e.filter("vec_id < %d" % CL.K).selectExpr(
        "cast(vec_id as int) as cid", "d", "v as c"
    )
    inertias = []
    for _ in range(CL.NITER):
        assign = CL._assign(e, cent)
        inertias.append(assign.groupBy().sum("dist").collect()[0][0])
        cent = CL._update(e, assign)
    assert inertias == sorted(inertias, reverse=True)
    assert inertias[-1] < inertias[0]  # it actually moved


def test_shuffle_budget_new_tpch(spark, sf_dir):
    """Exchange-count regression for the TPC-H completion set: dims must
    broadcast and aggregations must reuse join partitioning where
    possible; budgets are the counts the intended plans produce, so any
    regression (a lost broadcast, a redundant repartition) fails here."""
    from iceberg_examples_spark.operators import tpch_full as TF

    def n_shuffles(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    assert n_shuffles(TF.tpch_q1(spark, sf_dir)) <= 1  # lone groupBy
    assert n_shuffles(TF.tpch_q17(spark, sf_dir)) <= 2  # window + agg
    assert n_shuffles(TF.tpch_q13(spark, sf_dir)) <= 3
    assert n_shuffles(TF.tpch_q21(spark, sf_dir)) <= 6


def test_shuffle_budget_scrub_ops(spark, sf_dir):
    """Plan-shape regression for the curation operators (scrub.py):
    pii_scrub must stay map-only (zero exchanges — pure projection);
    paragraph_dedup shuffles hashes for the keep-first window and doc_id
    for the report (text itself never moves: the projection before the
    first exchange reduces each paragraph to its 60-bit hash);
    stratified_sample_lang broadcasts the per-language counts, so its
    only hash exchanges are the two tiny aggregations."""
    from iceberg_examples_spark.operators import scrub as SC

    assert _n_shuffles(SC.pii_scrub(spark, sf_dir)) == 0

    para = SC.paragraph_dedup(spark, sf_dir)
    assert _n_shuffles(para) <= 2
    plan = para._jdf.queryExecution().executedPlan().toString()
    import re as _re

    # Every exchange must partition on the 60-bit hash or doc_id — never
    # on the paragraph text (the projection to h happens map-side, so
    # only 24-byte (h, doc_id, pos) triples cross the wire).
    for part in _re.findall(r"Exchange hashpartitioning\(([^,]+),", plan):
        assert part.startswith(("h#", "doc_id#")), (
            f"paragraph dedup shuffles on {part!r}, expected hash/doc_id"
        )

    strat = SC.stratified_sample_lang(spark, sf_dir)
    splan = strat._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in splan  # lang counts + min broadcast back
    assert _n_shuffles(strat) <= 3


def test_kmeans_assignment_is_argmin(spark, sf_dir):
    """Every vector's final cluster must be its true nearest final-round
    centroid (lowest cid on ties) — recomputed independently in Python
    from the collected long-form values."""
    from collections import defaultdict

    from iceberg_examples_spark.operators import clustering as CL

    e = CL._long_form(spark, sf_dir)
    cent = e.filter(f"vec_id < {CL.K}").selectExpr(
        "cast(vec_id as int) as cid", "d", "v as c"
    )
    for i in range(CL.NITER - 1):
        cent = CL._update(e, CL._assign(e, cent))
    assign = {r.vec_id: r.cid for r in CL._assign(e, cent).collect()}

    vecs = defaultdict(dict)
    for r in e.collect():
        vecs[r.vec_id][r.d] = r.v
    cents = defaultdict(dict)
    for r in cent.collect():
        cents[r.cid][r.d] = r.c
    for vid, dims in vecs.items():
        best = min(
            (
                sum((dims[d] - c[d]) ** 2 for d in dims),
                cid,
            )
            for cid, c in cents.items()
        )[1]
        assert assign[vid] == best, vid


def test_udtf_chunks_reassemble(spark, sf_dir):
    """Concatenating a document's chunks in chunk_idx order must rebuild
    exactly its whitespace-normalized token stream, with every chunk but
    the last holding exactly 32 words."""
    from iceberg_examples_spark.operators.text import chunk_documents_udtf

    rows = chunk_documents_udtf(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d for d, t in docs.items() if t and t.split()}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        for c in chunks[:-1]:
            assert c.n_words == 32
        rebuilt = " ".join(c.chunk_text for c in chunks).split()
        assert rebuilt == docs[doc_id].split()


def test_sql_ddl_roundtrip(spark, tmp_path):
    """EP1 DDL surface exercised directly (reference S4-S6,
    IcebergSQLMerge.java:17-24): CREATE TABLE ... USING PARQUET, literal
    INSERT INTO ... VALUES, INSERT INTO ... SELECT, ALTER TABLE ADD
    COLUMNS (null-backfilled for existing rows), DROP TABLE."""
    loc = str(tmp_path / "ddl_tbl")
    spark.sql(
        "CREATE TABLE ddl_demo (customer_id BIGINT, name STRING) "
        f"USING PARQUET LOCATION '{loc}'"
    )
    try:
        spark.sql("INSERT INTO ddl_demo VALUES (1, 'customer_a')")
        spark.sql(
            "INSERT INTO ddl_demo SELECT 2 AS customer_id, 'customer_b' AS name"
        )
        assert spark.table("ddl_demo").count() == 2
        spark.sql("ALTER TABLE ddl_demo ADD COLUMNS (lastname STRING)")
        spark.sql("REFRESH TABLE ddl_demo")
        rows = {
            r.customer_id: r.lastname
            for r in spark.table("ddl_demo").collect()
        }
        assert rows == {1: None, 2: None}  # old files readable, null-backfilled
        spark.sql("INSERT INTO ddl_demo VALUES (3, 'customer_c', 'ln-3')")
        assert spark.table("ddl_demo").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_demo")


def test_operators_schema_stable_on_empty_input(spark, sf_dir):
    """Operators must return schema-stable (possibly empty) results when a
    stage filters everything out — no exceptions, no schema drift. Runs a
    representative mix against an empty slice via an impossible filter."""
    from iceberg_examples_spark.operators.dedup import lsh_verified_pairs
    from iceberg_examples_spark.operators.mutations import upsert_by_key
    from iceberg_examples_spark.operators.text import with_quality_metrics
    from iceberg_examples_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.lit(False))
    q = with_quality_metrics(docs)
    assert q.count() == 0 and "quality" in q.columns

    pairs = lsh_verified_pairs(docs.select("doc_id", "text"))
    assert pairs.count() == 0
    assert pairs.columns == ["doc_a", "doc_b", "jaccard"]

    orders = load_table(spark, sf_dir, "orders")
    empty_changes = orders.filter(F.lit(False))
    merged = upsert_by_key(orders, empty_changes, keys=["o_orderkey"])
    assert merged.count() == orders.count()


# ---- sequence packing: no total-order window (scale-killer guard) -------

def test_sequence_packing_window_is_sharded(spark, sf_dir):
    """Every window in the packing plan must partition by shard_id — an
    unpartitioned (total-order) window funnels the whole corpus through a
    single task at scale, which r1's review flagged as the one remaining
    scale-killer. windowspecdefinition(...) with no partition columns
    starts directly with the ORDER BY column."""
    from iceberg_examples_spark.operators.llm_pipeline import sequence_packing

    df = sequence_packing(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = [
        seg.split(")")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert specs, "packing plan lost its window — rewrite broke the op"
    for spec in specs:
        assert "shard_id" in spec.split("ASC")[0], (
            f"unpartitioned window spec in sequence_packing: {spec}"
        )


def test_sequence_packing_multiple_shards(spark, sf_dir):
    """The 500-doc test corpus must actually exercise >1 shard (shard
    size 128 -> 4 shards), otherwise the partitioned window degenerates
    to the global form and the test proves nothing."""
    from iceberg_examples_spark.operators.llm_pipeline import sequence_packing

    shards = sequence_packing(spark, sf_dir).select("shard_id").distinct().count()
    assert shards >= 3


# ---- LocalTable: named refs (tags + branches) ---------------------------

def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_refs_tag_pins_and_resolves(spark, tmp_path):
    t = LocalTable(spark, str(tmp_path / "tbl_refs"))
    t.create(_mk(spark, [(1, "a")]))
    v1 = t.append(_mk(spark, [(2, "b")]))
    t.create_tag("rel", v1)
    assert t.resolve_ref("rel") == v1
    assert t.read("rel").count() == 2
    # tags are immutable: re-creating raises
    with pytest.raises(ValueError):
        t.create_tag("rel", 0)
    # expire keeps the pinned snapshot even outside keep_last
    t.overwrite(_mk(spark, [(9, "z")]))
    t.overwrite(_mk(spark, [(10, "y")]))
    assert t.expire_snapshots(keep_last=1) > 0
    assert t.read("rel").count() == 2  # still readable
    with pytest.raises(FileNotFoundError):
        t.read(0)  # unpinned v0 really expired
    t.drop_ref("rel")
    assert "rel" not in t.refs()


def test_refs_branch_write_isolated_from_main(spark, tmp_path):
    t = LocalTable(spark, str(tmp_path / "tbl_branch"))
    t.create(_mk(spark, [(1, "a")]))
    t.create_branch("audit")
    head = t.append_to_branch("audit", _mk(spark, [(2, "b")]))
    # main untouched; branch sees both rows
    assert t.read().count() == 1
    assert t.read("audit").count() == 2
    assert t.resolve_ref("audit") == head
    # branch snapshot is staged, so default expiry never reclaims it
    snap = next(s for s in t.snapshots() if s["version"] == head)
    assert snap.get("staged") is True


def test_refs_fast_forward_and_divergence(spark, tmp_path):
    from iceberg_examples_spark.catalog import CommitConflictError

    t = LocalTable(spark, str(tmp_path / "tbl_ff"))
    t.create(_mk(spark, [(1, "a")]))
    t.create_branch("dev")
    t.append_to_branch("dev", _mk(spark, [(2, "b")]))
    head = t.append_to_branch("dev", _mk(spark, [(3, "c")]))
    assert t.fast_forward("dev") == head
    assert t.current_version == head
    assert t.read().count() == 3
    # snapshots on the landed path are main history now (not staged)
    assert not any(s.get("staged") for s in t.snapshots())
    # diverged main -> fast_forward must refuse
    t2 = LocalTable(spark, str(tmp_path / "tbl_ff2"))
    t2.create(_mk(spark, [(1, "a")]))
    t2.create_branch("dev")
    t2.append_to_branch("dev", _mk(spark, [(2, "b")]))
    t2.append(_mk(spark, [(9, "z")]))  # main moves independently
    with pytest.raises(CommitConflictError):
        t2.fast_forward("dev")


def test_refs_branch_survives_staged_age_expiry(spark, tmp_path):
    t = LocalTable(spark, str(tmp_path / "tbl_age"))
    t.create(_mk(spark, [(1, "a")]))
    t.create_branch("keepme")
    head = t.append_to_branch("keepme", _mk(spark, [(2, "b")]))
    # an aggressive staged-age sweep must not reclaim a live branch head
    assert t.expire_snapshots(keep_last=5, max_staged_age_s=0.0) == 0
    assert t.read("keepme").count() == 2
    assert t.resolve_ref("keepme") == head


def test_refs_branch_lineage_pinned(spark, tmp_path):
    """Reference retention covers the branch's staged ancestry, not just
    the head: intermediates can be neither drop_staged nor swept by the
    staged-age escape hatch while the branch lives."""
    t = LocalTable(spark, str(tmp_path / "tbl_lineage"))
    t.create(_mk(spark, [(1, "a")]))
    t.create_branch("b")
    v1 = t.append_to_branch("b", _mk(spark, [(2, "b")]))
    v2 = t.append_to_branch("b", _mk(spark, [(3, "c")]))
    with pytest.raises(ValueError):
        t.drop_staged(v1)  # intermediate of a live branch
    assert t.expire_snapshots(keep_last=5, max_staged_age_s=0.0) == 0
    assert t.fast_forward("b") == v2  # chain intact end-to-end
    assert t.read().count() == 3


def test_overwrite_branch_collapses_superseded_epochs(spark, tmp_path):
    """Replace-semantics branch commits re-parent to the fork point, so a
    long-running WAP stream pins ONE snapshot, not one table copy per
    epoch: superseded epochs are unpinned, drop_staged-able, reclaimable
    by the staged-age sweep, and fast_forward lands only the head
    (round-4 ADVICE)."""
    t = LocalTable(spark, str(tmp_path / "tbl_wapcollapse"))
    fork = t.create(_mk(spark, [(1, "a")]))
    t.create_branch("audit")
    e1 = t.overwrite_branch("audit", _mk(spark, [(2, "b")]))
    e2 = t.overwrite_branch("audit", _mk(spark, [(3, "c")]))
    e3 = t.overwrite_branch("audit", _mk(spark, [(4, "d")]))
    by_v = {s["version"]: s for s in t.snapshots()}
    assert by_v[e3]["parent"] == fork  # chain collapsed to the fork point
    # superseded epochs are NOT pinned: drop one, sweep the other
    t.drop_staged(e1)
    assert t.expire_snapshots(keep_last=5, max_staged_age_s=0.0) == 1  # e2
    # the live head is untouched and publishable; main gains only e3
    assert t.read("audit").count() == 1
    assert t.fast_forward("audit") == e3
    assert sorted(r.id for r in t.read().collect()) == [4]
    versions = {s["version"] for s in t.snapshots()}
    assert e1 not in versions and e2 not in versions
    # mixed lineage: an overwrite on top of an APPEND epoch must not
    # collapse past it (append history stays walkable/pinned)
    t2 = LocalTable(spark, str(tmp_path / "tbl_mixed"))
    t2.create(_mk(spark, [(1, "a")]))
    t2.create_branch("b")
    a1 = t2.append_to_branch("b", _mk(spark, [(2, "b")]))
    o1 = t2.overwrite_branch("b", _mk(spark, [(3, "c")]))
    by_v2 = {s["version"]: s for s in t2.snapshots()}
    assert by_v2[o1]["parent"] == a1
    with pytest.raises(ValueError):
        t2.drop_staged(a1)  # still the head's lineage


def test_refs_branch_write_race_surfaces_conflict(spark, tmp_path):
    """Two branch writers racing from the same head: the loser must get
    CommitConflictError, never a silent lost update (the ref re-check in
    _commit runs against the same read its CAS publish is built on)."""
    from iceberg_examples_spark.catalog import CommitConflictError

    t = LocalTable(spark, str(tmp_path / "tbl_race"))
    t.create(_mk(spark, [(1, "a")]))
    t.create_branch("b")
    stale_head = t._branch_head("b")
    t.append_to_branch("b", _mk(spark, [(2, "b")]))  # writer 1 wins
    # writer 2 still holds the stale head; its commit must refuse
    with pytest.raises(CommitConflictError):
        t._commit(
            _mk(spark, [(9, "z")]), "branch-append", None,
            staged=True, parent=stale_head, move_ref="b",
        )
    # and a write against a dropped ref refuses too
    t.drop_ref("b")
    with pytest.raises(CommitConflictError):
        t._commit(
            _mk(spark, [(9, "z")]), "branch-append", None,
            staged=True, parent=stale_head, move_ref="b",
        )


def test_localtable_threaded_append_storm_loses_no_update(spark, tmp_path):
    """REAL contention (not a simulated stale read): 8 threads race to
    append one distinct row each, retrying on CommitConflictError. The
    CAS must serialize them — every row lands exactly once (no lost
    update, no duplicate), the version advances by exactly 8, and no
    orphan temp files remain. This is the optimistic-concurrency claim
    of the commit protocol exercised through the actual os.link race."""
    import os
    import threading

    from iceberg_examples_spark.catalog import CommitConflictError, LocalTable

    root = str(tmp_path / "tbl_storm")
    t0 = LocalTable(spark, root)
    t0.create(spark.createDataFrame([(0,)], "id long"))

    errors = []

    def writer(i: int) -> None:
        try:
            handle = LocalTable(spark, root)
            df = spark.createDataFrame([(i,)], "id long")
            for _ in range(64):  # bounded retry
                try:
                    handle.append(df)
                    return
                except CommitConflictError:
                    continue
            errors.append(f"writer {i} exhausted retries")
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append(f"writer {i}: {e!r}")

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(1, 9)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert errors == []
    got = sorted(r["id"] for r in t0.read().collect())
    assert got == list(range(9))  # 0 (create) + 1..8, each exactly once
    assert t0.current_version == 8  # one version per append, none lost
    assert [f for f in os.listdir(root) if f.endswith(".json.tmp")] == []


def test_change_feed_across_schema_evolution(spark, tmp_path):
    """A changelog scan spanning an ADD COLUMN commit must not crash on
    the exceptAll schema mismatch: snapshots align on the column union
    (missing columns null-filled), and a row whose only difference is
    the new column reads as delete+insert — the honest changelog."""
    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "tbl_cfse"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    from pyspark.sql import functions as F

    t.overwrite(
        t.read()
        .withColumn("extra", (F.col("k") * 10).cast("long"))
        .filter(F.col("k") != 2)  # also delete k=2
    )
    feed = t.change_feed(0, 1)
    rows = {
        (r["k"], r["v"], r["extra"], r["_change_type"])
        for r in feed.collect()
    }
    assert rows == {
        (1, "a", None, "delete"),   # old shape of k=1
        (1, "a", 10, "insert"),     # new shape of k=1
        (2, "b", None, "delete"),   # dropped row
    }
    # incremental read (changes) across the same boundary: inserts only
    got = {(r["k"], r["extra"]) for r in t.changes(0, 1).collect()}
    assert got == {(1, 10)}


def test_threaded_wap_publish_vs_append_loses_no_update(spark, tmp_path):
    """WAP stage/publish racing a data committer under REAL threads:
    publish() validates the staged snapshot's parent against current, so
    a publish whose base went stale must conflict and re-stage — no
    successful publish may erase a committed append. Final state = every
    appended row plus every successfully-published row."""
    import threading

    from iceberg_examples_spark.catalog import CommitConflictError, LocalTable

    root = str(tmp_path / "tbl_wapstorm")
    t = LocalTable(spark, root)
    t.create(spark.createDataFrame([(0,)], "id long"))
    errors, published = [], []

    def appender() -> None:
        try:
            h = LocalTable(spark, root)
            for i in range(1, 5):
                df = spark.createDataFrame([(100 + i,)], "id long")
                for _ in range(64):
                    try:
                        h.append(df)
                        break
                    except CommitConflictError:
                        continue
                else:
                    errors.append(f"append {i} exhausted retries")
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    def wap_writer() -> None:
        try:
            h = LocalTable(spark, root)
            for i in range(1, 4):
                row = 200 + i
                for _ in range(64):
                    # stage() and drop_staged() can themselves lose the
                    # metadata CAS to the racing appender — every step of
                    # the cycle is retryable, so retry the whole cycle
                    try:
                        base_v = h.current_version
                        staged_df = h.read(base_v).unionByName(
                            spark.createDataFrame([(row,)], "id long")
                        )
                        # expect_current pins the staged entry's
                        # parent to the derivation base — without it a
                        # concurrent append between the base read and the
                        # stage slips UNDER publish's parent check and is
                        # erased (the lost update this test caught)
                        v = h.stage(staged_df, expect_current=base_v)
                    except CommitConflictError:
                        continue
                    try:
                        h.publish(v)
                        published.append(row)
                        break
                    except CommitConflictError:
                        # stale base: abandon the staged snapshot (best
                        # effort — the drop may also lose a CAS; expiry
                        # would reclaim it in production) and re-stage
                        for _ in range(8):
                            try:
                                h.drop_staged(v)
                                break
                            except CommitConflictError:
                                continue
                        continue
                else:
                    errors.append(f"wap {i} exhausted retries")
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    th = [threading.Thread(target=appender), threading.Thread(target=wap_writer)]
    for x in th:
        x.start()
    for x in th:
        x.join()

    assert errors == []
    got = sorted(r["id"] for r in t.read().collect())
    expect = sorted([0, 101, 102, 103, 104] + published)
    assert got == expect  # nothing lost, nothing phantom


def test_threaded_branch_append_race_loses_no_update(spark, tmp_path):
    """Two branch writers racing append_to_branch on one branch: the
    move_ref CAS must serialize them — the final branch content holds
    every row from both writers exactly once, and main is untouched."""
    import threading

    from iceberg_examples_spark.catalog import CommitConflictError, LocalTable

    root = str(tmp_path / "tbl_brstorm")
    t = LocalTable(spark, root)
    t.create(spark.createDataFrame([(0,)], "id long"))
    t.create_branch("audit")
    errors = []

    def writer(base: int) -> None:
        try:
            h = LocalTable(spark, root)
            for i in range(1, 4):
                df = spark.createDataFrame([(base + i,)], "id long")
                for _ in range(64):
                    try:
                        h.append_to_branch("audit", df)
                        break
                    except CommitConflictError:
                        continue
                else:
                    errors.append(f"branch append {base + i} exhausted")
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    th = [threading.Thread(target=writer, args=(b,)) for b in (300, 400)]
    for x in th:
        x.start()
    for x in th:
        x.join()

    assert errors == []
    got = sorted(r["id"] for r in t.read("audit").collect())
    assert got == [0, 301, 302, 303, 401, 402, 403]
    assert sorted(r["id"] for r in t.read().collect()) == [0]  # main untouched


def test_multiprocess_metadata_cas_is_gapless(tmp_path):
    """The os.link metadata CAS across real PROCESSES (not threads): four
    workers race to publish versions into one table root; the version
    sequence must come out gapless with exactly one winner per version —
    the cross-process half of the optimistic-concurrency claim, testable
    without Spark because the CAS is pure filesystem."""
    import json
    import multiprocessing as mp
    import os

    from iceberg_examples_spark.catalog import CommitConflictError, LocalTable

    root = str(tmp_path / "tbl_mp")
    os.makedirs(root, exist_ok=True)

    def worker(wid: int, wins_q) -> None:
        t = LocalTable.__new__(LocalTable)  # no spark needed for the CAS
        t.spark, t.root = None, root
        wins = 0
        for i in range(25):
            meta, read_v = t._read_meta_versioned()
            meta.setdefault("snapshots", [])
            meta["payload"] = [wid, i]
            meta["current"] = read_v + 1
            try:
                t._publish_meta(meta, read_v + 1)
                wins += 1
            except CommitConflictError:
                continue
        wins_q.put((wid, wins))

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [ctx.Process(target=worker, args=(w, q)) for w in range(4)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    assert all(p.exitcode == 0 for p in procs)

    t = LocalTable.__new__(LocalTable)
    t.spark, t.root = None, root
    versions = t._meta_versions()
    # gapless: every version 0..max published exactly once (os.link
    # guarantees single-winner; gaplessness shows no version skipped)
    assert versions == list(range(len(versions)))
    total_wins = sum(q.get()[1] for _ in range(4))
    assert total_wins == len(versions)  # one winner per version
    # every surviving file is complete JSON (no torn writes visible)
    for v in versions:
        with open(t._meta_path(v)) as f:
            json.load(f)


def test_remove_orphans_sweeps_crashed_publisher_tmp(spark, tmp_path):
    """A publisher killed between mkstemp and link (SIGKILL skips the
    finally-unlink) leaves a .json.tmp; metadata reads ignore it, and
    remove_orphans reclaims it under the same grace period as data-dir
    orphans — a FRESH tmp (in-flight publisher) survives the sweep."""
    import os
    import time

    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "tbl_tmp"))
    t.create(spark.createDataFrame([(1,)], "id long"))
    stale = os.path.join(t.root, "tmpabc123.json.tmp")
    open(stale, "w").write("{}")
    old = time.time() - 10
    os.utime(stale, (old, old))
    fresh = os.path.join(t.root, "tmpdef456.json.tmp")
    open(fresh, "w").write("{}")

    assert t.remove_orphans(older_than_s=5) == 1
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # grace period protects in-flight publish
    assert t.read().count() == 1  # table untouched


def test_asof_join_formulation_matches_brute_force(spark):
    """Independent-model check of the as-of tie semantics: the windowed
    carry-forward formulation must agree with a brute-force 'latest
    (ts, event_id) click with ts <= purchase ts, same user' reference on
    random data with HEAVY ts ties (the fixture-based oracle can't
    stress ties this hard)."""
    import random

    from pyspark.sql import Window

    random.seed(7)
    rows, eid = [], 0
    for _ in range(150):
        eid += 1
        rows.append(
            (
                eid,
                random.randint(1, 5),
                random.randint(0, 15),  # coarse ts → many exact ties
                float(random.randint(1, 100)),
                random.choice(["click", "purchase", "view"]),
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, tsn long, value double, event_type string"
    ).withColumn(
        "ts", F.timestamp_micros(F.col("tsn") * 1_000_000).cast("timestamp_ntz")
    )

    left = df.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_right"),
        F.lit(None).cast("double").alias("click_value"),
        F.lit(None).cast("long").alias("click_tsn"),
    )
    right = df.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_right"),
        F.col("value").alias("click_value"),
        F.col("tsn").alias("click_tsn"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_right").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r["event_id"]: (r["cv"], r["ctn"])
        for r in left.unionByName(right)
        .select(
            "event_id", "is_right",
            F.last("click_value", ignorenulls=True).over(w).alias("cv"),
            F.last("click_tsn", ignorenulls=True).over(w).alias("ctn"),
        )
        .filter(F.col("is_right") == 0)
        .collect()
    }

    clicks = [r for r in rows if r[4] == "click"]
    for e, u, t, _v, ty in rows:
        if ty != "purchase":
            continue
        cand = [(ct, ce, cv) for (ce, cu, ct, cv, _) in clicks if cu == u and ct <= t]
        exp = (None, None)
        if cand:
            ct, _ce, cv = max(cand)  # latest (ts, event_id) wins
            exp = (cv, ct)
        assert got[e] == exp, f"purchase {e}: got {got[e]}, expected {exp}"


def test_sessionize_boundary_matches_brute_force(spark):
    """Independent-model check of the session-gap boundary: a new session
    starts only when the inter-event gap STRICTLY exceeds 30 minutes — an
    exact-30:00 gap continues the session. Random data is drawn so exact
    1800 s gaps are common (the sf fixtures rarely produce them), and the
    lag+cumsum formulation must agree with a brute-force splitter."""
    import random

    from pyspark.sql import Window

    random.seed(3)
    gap_s, gap_us = 1800, 1800 * 1_000_000
    rows, eid = [], 0
    for _ in range(120):
        eid += 1
        t = random.choice([0, 1799, 1800, 1801, 3600, 5400, 7200, 9000])
        t += random.randint(0, 2) * 1800
        rows.append((eid, random.randint(1, 4), t))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, tsn long"
    ).withColumn(
        "ts", F.timestamp_micros(F.col("tsn") * 1_000_000).cast("timestamp_ntz")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    sid = (
        df.withColumn("ns", (us - F.lag(us, 1).over(w) > gap_us).cast("int"))
        .withColumn("ns", F.coalesce(F.col("ns"), F.lit(1)))
        .withColumn(
            "seq", F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    got = sorted(
        (r["user_id"], r["s"], r["e"], r["n"])
        for r in sid.groupBy("user_id", "seq")
        .agg(
            F.min("tsn").alias("s"),
            F.max("tsn").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )

    exp, byu = [], {}
    for e, u, t in rows:
        byu.setdefault(u, []).append((t, e))
    for u, evs in byu.items():
        evs.sort()
        cur = [evs[0]]
        for t, e in evs[1:]:
            if t - cur[-1][0] > gap_s:  # STRICT: ==1800 continues
                exp.append((u, cur[0][0], cur[-1][0], len(cur)))
                cur = []
            cur.append((t, e))
        exp.append((u, cur[0][0], cur[-1][0], len(cur)))
    assert got == sorted(exp)


def test_append_rejects_unknown_columns(spark, tmp_path):
    """Iceberg's write validation: an append carrying a column the table
    doesn't have is rejected — a typo'd name must not silently widen the
    schema as a write side effect. Missing columns still null-fill (the
    optional-column write)."""
    import pytest as _pytest

    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "tbl_schema_guard"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    with _pytest.raises(ValueError, match="not in table schema"):
        t.append(spark.createDataFrame([(2, "b")], "k long, w string"))
    assert t.current_version == 0  # nothing committed
    t.append(spark.createDataFrame([(2,)], "k long"))  # missing v: fills
    assert sorted(
        (r["k"], r["v"]) for r in t.read().collect()
    ) == [(1, "a"), (2, None)]

    t.create_branch("b1")
    with _pytest.raises(ValueError, match="not in branch schema"):
        t.append_to_branch(
            "b1", spark.createDataFrame([(3, "x")], "k long, zz string")
        )


def test_create_rejects_existing_table(spark, tmp_path):
    """CREATE on an existing table raises (TABLE_ALREADY_EXISTS); a
    silent re-create replaced schema and contents in one call.
    replace=True is the explicit CREATE OR REPLACE spelling."""
    import pytest as _pytest

    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "tbl_create_guard"))
    t.create(spark.createDataFrame([(1,)], "k long"))
    with _pytest.raises(ValueError, match="already exists"):
        t.create(spark.createDataFrame([(9, "x")], "a long, b string"))
    assert t.read().columns == ["k"]  # untouched
    t.create(
        spark.createDataFrame([(9, "x")], "a long, b string"), replace=True
    )
    assert t.read().columns == ["a", "b"]


def test_partition_spec_survives_data_commits(spark, tmp_path):
    """A partitioned table stays partitioned through append, DML
    rewrite (overwrite), and compaction — losing the spec silently on
    the first append would forfeit partition pruning for every later
    read. Explicit specs still win; a dropped partition column shrinks
    the inherited spec instead of crashing the write."""
    import os as _os

    from pyspark.sql import functions as _F

    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "tbl_pspec"))
    t.create(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k long, p string"
        ),
        partition_by=["p"],
    )
    t.append(spark.createDataFrame([(3, "a")], "k long, p string"))
    t.overwrite(t.read().filter(_F.col("k") != 2))  # DML-shaped rewrite
    t.compact()
    for s in t.snapshots():
        assert s["partition_by"] == ["p"], s
    # the physical layout is really partitioned: hive-style p= dirs
    snap_dir = _os.path.join(t.root, t.snapshots()[-1]["path"])
    assert any(n.startswith("p=") for n in _os.listdir(snap_dir))
    # dropping the partition column shrinks the spec, not the write
    t.overwrite(t.read().drop("p"))
    assert t.snapshots()[-1]["partition_by"] == []
    # explicit new spec (partition evolution) still wins
    t.overwrite(
        t.read().withColumn("b", (_F.col("k") % 2).cast("long")),
        partition_by=["b"],
    )
    assert t.snapshots()[-1]["partition_by"] == ["b"]


def test_partitioned_statement_executor_paths(spark, tmp_path):
    """The SQL-executor write verbs preserve the partition layout:
    INSERT (append path) keeps the spec and lands rows in the right
    dirs; UPDATE on the partition column re-lands the row under its new
    value; a DELETE that empties one partition leaves no stale dir (the
    rewrite snapshot contains only live partitions)."""
    import os as _os

    from iceberg_examples_spark.catalog import LocalTable
    from iceberg_examples_spark.sql_merge import execute_statement

    t = LocalTable(spark, str(tmp_path / "tbl_pexec"))
    t.create(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, p string"),
        partition_by=["p"],
    )
    tables = {"default.t": t}

    def dirs():
        d = _os.path.join(t.root, t.snapshots()[-1]["path"])
        return sorted(x for x in _os.listdir(d) if x.startswith("p="))

    execute_statement(spark, "INSERT INTO default.t VALUES (3, 'a');", tables)
    assert t.snapshots()[-1]["partition_by"] == ["p"]
    assert dirs() == ["p=a", "p=b"]
    execute_statement(
        spark, "UPDATE default.t SET p = 'c' WHERE k = 2;", tables
    )
    assert dirs() == ["p=a", "p=c"]
    execute_statement(spark, "DELETE FROM default.t WHERE p = 'c';", tables)
    assert dirs() == ["p=a"]  # emptied partition leaves no stale dir
    assert sorted(r["k"] for r in t.read().collect()) == [1, 3]


def test_partition_spec_inherited_case_insensitively(spark, tmp_path):
    """Spec inheritance matches frame columns case-insensitively and maps
    to the frame's actual spelling: Spark resolves names case-insensitively
    by default, so a rewrite whose frame re-cases the partition column must
    keep the layout, not silently flatten it (round-8 ADVICE)."""
    import os as _os

    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "tbl_pcase"))
    t.create(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, p string"),
        partition_by=["p"],
    )
    t.overwrite(t.read().withColumnRenamed("p", "P"))
    assert t.snapshots()[-1]["partition_by"] == ["P"]
    snap_dir = _os.path.join(t.root, t.snapshots()[-1]["path"])
    assert any(n.lower().startswith("p=") for n in _os.listdir(snap_dir))


def test_create_replace_does_not_inherit_old_partition_spec(spark, tmp_path):
    """CREATE OR REPLACE defines its own layout: no spec given means
    unpartitioned, never the replaced table's spec (code-review r8)."""
    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "tbl_cor"))
    t.create(
        spark.createDataFrame([(1, "a")], "k long, p string"),
        partition_by=["p"],
    )
    t.create(
        spark.createDataFrame([(2, "b")], "k long, p string"), replace=True
    )
    assert t.snapshots()[-1]["partition_by"] == []


def test_append_column_check_is_case_insensitive(spark, tmp_path):
    """The unknown-column guard must match unionByName's resolution
    (case-insensitive under Spark's default): a differently-cased
    column appends fine; a genuinely unknown one still raises."""
    import pytest as _pytest

    from iceberg_examples_spark.catalog import LocalTable

    t = LocalTable(spark, str(tmp_path / "tbl_ci"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(2, "b")], "K long, V string"))
    assert t.read().count() == 2
    with _pytest.raises(ValueError, match="not in table schema"):
        t.append(spark.createDataFrame([(3, "c")], "k long, w string"))
