"""functions/theta.py: the DataSketches theta sketch layer — murmur
pinned against the mmh3 library's published vectors, the compact
serial-v3 wire format pinned field by field, the KMV estimator
accuracy-checked, and the distributed bottom-k plan cross-checked
against a local recomputation."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from iceberg_examples_spark.functions import theta as TH


def test_murmur3_x64_128_public_vectors():
    """Vectors published in the mmh3 library docs (the reference
    x64-128 implementation everyone cross-checks against)."""
    h1, h2 = TH.murmur3_x64_128(b"foo", 0)
    assert h1 == (-2129773440516405919) & TH.MASK64
    assert h2 == 9128664383759220103
    # the 128-bit combine mmh3.hash128 documents
    assert h1 + (h2 << 64) == 168394135621993849475852668931176482145
    assert TH.murmur3_x64_128(b"", 0) == (0, 0)


def test_numpy_fast_path_matches_scalar():
    rng = np.random.default_rng(7)
    vals = rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64)
    fast = TH.hash_longs8_le(vals)
    slow = np.array(
        [TH.value_hash(struct.pack("<q", int(v))) for v in vals],
        dtype=np.uint64,
    )
    assert (fast == slow).all()


def test_seed_hash_nonzero_16bit():
    sh = TH.compute_seed_hash()
    assert 0 < sh < (1 << 16)
    # deterministic: the value other readers will check against
    assert sh == TH.compute_seed_hash(9001)


def test_wire_format_fields():
    """Pin the serial-v3 preamble byte by byte: preamble longs, serial
    version 3, family 3 (COMPACT), flags, seed hash, count, theta."""
    sh = TH.compute_seed_hash()
    empty = TH.serialize_compact([])
    assert len(empty) == 8
    assert empty[0] == 1 and empty[1] == 3 and empty[2] == 3
    assert empty[5] & TH.FLAG_EMPTY
    assert empty[5] & TH.FLAG_COMPACT and empty[5] & TH.FLAG_ORDERED
    assert struct.unpack_from("<H", empty, 6)[0] == sh

    exact = TH.serialize_compact([7, 3, 11])
    assert exact[0] == 2 and len(exact) == 16 + 3 * 8
    assert not (exact[5] & TH.FLAG_EMPTY)
    assert struct.unpack_from("<I", exact, 8)[0] == 3
    # ORDERED: entries ascending on the wire
    assert struct.unpack_from("<3q", exact, 16) == (3, 7, 11)

    est = TH.serialize_compact([3, 7], theta=100)
    assert est[0] == 3 and len(est) == 24 + 2 * 8
    assert struct.unpack_from("<q", est, 16)[0] == 100
    assert struct.unpack_from("<2q", est, 24) == (3, 7)


def test_roundtrip_and_single_item_read():
    for hashes, theta in [
        ([], TH.MAX_THETA),
        ([123456789], TH.MAX_THETA),
        ([5, 9, 200, 3000], TH.MAX_THETA),
        (list(range(1, 4097)), 5000),
    ]:
        b = TH.serialize_compact(hashes, theta)
        t, h = TH.deserialize_compact(b)
        assert t == theta and h == sorted(set(hashes))
    # Java's SingleItemSketch form: preamble 1, non-empty, one hash
    single = struct.pack(
        "<BBBBBBHq",
        1,
        3,
        3,
        0,
        0,
        TH.FLAG_READ_ONLY | TH.FLAG_COMPACT | TH.FLAG_ORDERED,
        TH.compute_seed_hash(),
        424242,
    )
    assert TH.deserialize_compact(single) == (TH.MAX_THETA, [424242])
    # wrong seed hash refuses
    with pytest.raises(ValueError, match="seed hash"):
        TH.deserialize_compact(single, seed=123)


def test_serialize_validation():
    with pytest.raises(ValueError, match="theta"):
        TH.serialize_compact([10, 200], theta=100)  # retained >= theta
    with pytest.raises(ValueError, match="2\\^63"):
        TH.serialize_compact([0])


def test_kmv_estimator_accuracy():
    """100k distinct uniform hashes through the bottom-4096 build:
    KMV rse is ~1/sqrt(k-1) (~1.6%); assert within 5%."""
    random.seed(1)
    hs = random.sample(range(1, 2**63), 100_000)
    sk = TH.build_from_hashes(sorted(hs)[: 4096 + 1])
    est = TH.estimate(sk)
    assert abs(est - 100_000) <= 5000
    # exact below k
    sk2 = TH.build_from_hashes(sorted(random.sample(range(1, 2**63), 300)))
    assert TH.estimate(sk2) == 300


def test_distributed_bottom_k_matches_local(spark):
    """_theta_smallest_hashes (mapInArrow + distinct + top-k) returns
    exactly the k+1 smallest distinct hashes a local recomputation
    produces, for the numpy path (long, double) and the scalar
    serialization path (string)."""
    from iceberg_examples_spark.sources.iceberg_native import (
        IcebergNativeTable,
        encode_bound,
    )

    df = spark.createDataFrame(
        [(i % 700, float(i % 41) / 3.0, f"s{i % 123}") for i in range(2000)],
        "k long, v double, s string",
    ).repartition(5)
    k = 64
    for col, ice in [("k", "long"), ("v", "double"), ("s", "string")]:
        got = IcebergNativeTable._theta_smallest_hashes(df, col, ice, k)
        vals = {r[col] for r in df.select(col).collect()}
        local = sorted(
            {
                h
                for u in vals
                if (h := TH.value_hash(encode_bound(ice, u))) != 0
            }
        )[: k + 1]
        assert got == local, col
        est = TH.estimate(TH.build_from_hashes(got, k))
        assert abs(est - len(vals)) <= max(2.0, 0.35 * len(vals)), col


def test_table_statistics_theta_estimation_mode(spark, tmp_path):
    """A column with ndv > k lands an ESTIMATION-mode theta blob whose
    decoded estimate tracks the exact count within KMV tolerance."""
    from iceberg_examples_spark.functions import theta as TH2
    from iceberg_examples_spark.sources.iceberg_native import (
        IcebergNativeTable,
    )
    from iceberg_examples_spark.sources.puffin import read_blob

    n = 9000  # > k = 4096
    df = spark.createDataFrame(
        [(i,) for i in range(n)], "k long"
    ).repartition(4)
    t = IcebergNativeTable.create(spark, str(tmp_path / "t"), df)
    t.write_table_statistics(sketches=("theta",))
    (r,) = t.statistics_df().collect()
    assert r["blob_type"] == "apache-datasketches-theta-v1"
    assert r["ndv"] == n
    payload = read_blob(r["statistics_path"], r["offset"], r["length"])
    theta, hashes = TH2.deserialize_compact(payload)
    assert theta < TH2.MAX_THETA and len(hashes) == 4096
    assert abs(TH2.estimate(payload) - n) <= 0.05 * n


def test_union_sketches():
    """Theta union: overlap never double-counts, theta minimizes,
    oversized unions re-truncate KMV-style."""
    random.seed(5)
    a_vals = random.sample(range(1, 2**63), 2000)
    b_vals = random.sample(range(1, 2**63), 1500)
    overlap = a_vals[:500]
    b_all = b_vals + overlap  # 2000 distinct, 500 shared with a
    sk_a = TH.build_from_hashes(sorted(a_vals))
    sk_b = TH.build_from_hashes(sorted(set(b_all)))
    u = TH.union_sketches([sk_a, sk_b])
    n_true = len(set(a_vals) | set(b_all))  # 3500 <= k: stays exact
    assert TH.estimate(u) == n_true
    # estimation-mode inputs: 2x 50k disjoint, k=1024
    k = 1024
    big_a = random.sample(range(1, 2**63), 50_000)
    big_b = random.sample(range(1, 2**63), 50_000)
    ska = TH.build_from_hashes(sorted(big_a)[: k + 1], k)
    skb = TH.build_from_hashes(sorted(big_b)[: k + 1], k)
    u2 = TH.union_sketches([ska, skb], k)
    theta, hashes = TH.deserialize_compact(u2)
    assert len(hashes) <= k and all(h < theta for h in hashes)
    est = TH.estimate(u2)
    assert abs(est - 100_000) <= 0.15 * 100_000  # ~3/sqrt(k) tolerance
    # fully-overlapping union estimates the SINGLE set size
    u3 = TH.union_sketches([ska, ska], k)
    assert abs(TH.estimate(u3) - 50_000) <= 0.15 * 50_000
    # empty union
    assert TH.estimate(TH.union_sketches([TH.serialize_compact([])])) == 0
