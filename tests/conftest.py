from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_examples_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # Session-private index-artifact root: the default root is shared
    # across processes, and a concurrently-running bench/sweep calling
    # drop_index_artifacts() would delete parquet files this session's
    # readers are mid-scan on (observed: FAILED_READ_FILE.FILE_NOT_EXIST
    # in curation_incremental parity). This is the indexDir knob, not
    # stagingDir, so stage()'s localCheckpoint default is unchanged.
    idx_root = str(tmp_path_factory.mktemp("ies-index-cache"))
    s = get_spark(
        app_name="ies-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/ies_test_warehouse",
            "spark.iceberg_examples.indexDir": idx_root,
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
