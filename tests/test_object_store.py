"""Object-store seam (reference Minio.java:88-114 / Setup.java:31-36):
recursive listing through the Hadoop FileSystem API, and path-scheme
robustness of the whole native table lifecycle under location names an
object store happily serves but naive URI handling mangles — spaces,
percent signs, plus, non-ASCII (the round-8/9 ADVICE class around
``_file_uri`` vs ``_metadata.file_path`` encoding)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_examples_spark.sources.iceberg_native import IcebergNativeTable
from iceberg_examples_spark.sources.object_store import list_objects

NASTY = [
    "plain",
    "with space",
    "pct%41sign",
    "plus+and#hash",
    "ünï-cødé",
]


def test_list_objects_recursive_contract(spark, tmp_path):
    """The Minio.java:88-114 contract: every object (not directory),
    real byte sizes, correct relative paths; non-recursive sees only
    the top level."""
    root = tmp_path / "bucket"
    (root / "a" / "b").mkdir(parents=True)
    (root / "top.bin").write_bytes(b"x" * 10)
    (root / "a" / "mid.bin").write_bytes(b"y" * 20)
    (root / "a" / "b" / "deep.bin").write_bytes(b"z" * 30)
    got = {
        r["relative_path"]: r["length"]
        for r in list_objects(spark, str(root)).collect()
    }
    assert got == {"top.bin": 10, "a/mid.bin": 20, "a/b/deep.bin": 30}
    flat = {
        r["relative_path"]
        for r in list_objects(spark, str(root), recursive=False).collect()
    }
    assert flat == {"top.bin"}
    # every returned path is scheme-qualified and openable
    for r in list_objects(spark, str(root)).collect():
        assert r["path"].startswith("file:")
        assert r["modification_time"] > 0


@pytest.mark.parametrize("name", NASTY)
def test_native_table_lifecycle_survives_nasty_locations(
    spark, tmp_path, name
):
    """Create / MOR delete / scan / changelog / listing all work when
    the table LOCATION contains characters whose URI encoding differs
    from their filesystem form — the seam where `_file_uri` must match
    Spark's `_metadata.file_path` rendering exactly or MOR joins
    silently empty out."""
    loc = str(tmp_path / f"wh {name}" / "t")
    os.makedirs(os.path.dirname(loc), exist_ok=True)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(30)], "k long, v double"
    ).coalesce(1)
    t = IcebergNativeTable.create(spark, loc, df)
    t.delete_where(F.col("k") < 10, "merge-on-read")  # exercises the join
    assert sorted(r["k"] for r in t.scan().select("k").collect()) == list(
        range(10, 30)
    )
    # changelog over the delete still pairs files correctly
    ch = t.changelog_df(from_snapshot_id=1).collect()
    assert {r["k"] for r in ch} == set(range(10))
    # the listing seam walks the same location
    objs = list_objects(spark, loc).collect()
    rels = {r["relative_path"] for r in objs}
    assert any(r.startswith("data/") for r in rels)
    assert any(r.startswith("metadata/") for r in rels)
    assert all(o["length"] >= 0 for o in objs)
