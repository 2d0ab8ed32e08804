"""O(delta) evidence for incremental curation (round-4 verdict item 2).

Protocol: hold the DELTA fixed (the ~600 sf0.1 documents with
``doc_id % 100 == 7``) and grow the BASE 10× (sf0.01's ~6k docs vs
sf0.1's ~60k docs, delta ids excluded from both), then compare the
WARM probe time — persisted LSH + paragraph indexes already built — of
``scrub.incremental_curate`` across the two bases.  If the steady state
is O(delta), warm time tracks the (fixed) delta and stays ~flat while
the base grows 10×; the O(corpus) alternative — full recuration — is
timed alongside at both scales for contrast (``curation_pipeline``,
which re-reads everything).

Run: ``python scripts/odelta_sweep.py``.  Prints one JSON line per
measurement plus a markdown summary block for DESIGN.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from iceberg_examples_spark.catalog import load_table  # noqa: E402
from iceberg_examples_spark.checkpointing import (  # noqa: E402
    drop_index_artifacts,
)
from iceberg_examples_spark.operators.scrub import (  # noqa: E402
    _with_tokens,
    curation_pipeline,
    incremental_curate,
)
from iceberg_examples_spark.registry import QUERIES  # noqa: E402
from iceberg_examples_spark.session import get_spark  # noqa: E402

SMALL = "/root/testdata/sf0.01"
LARGE = "/root/testdata/sf0.1"
RUNS = 5


def fixed_delta(spark):
    docs = load_table(spark, LARGE, "documents")
    return _with_tokens(docs.filter(F.col("doc_id") % 100 == 7))


def base_frame(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return _with_tokens(docs.filter(F.col("doc_id") % 100 != 7))


def timed(fn, runs=RUNS):
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return out


def main() -> None:
    spark = get_spark(app_name="odelta-sweep")
    delta = fixed_delta(spark)
    n_delta = delta.count()
    # session warmup so base A's cold run doesn't absorb first-use JVM /
    # codegen costs: one throwaway probe + recurate at the small sf
    warm_tag = "sweep-warmup"
    drop_index_artifacts(spark, ("base-lsh-index", "base-para-index"))
    incremental_curate(
        spark,
        base_frame(spark, SMALL),
        delta,
        [os.path.join(SMALL, "documents.parquet")],
        base_tag=warm_tag,
    ).collect()
    curation_pipeline(spark, SMALL).collect()
    results = {}
    for name, sf_dir in (("base_sf0.01", SMALL), ("base_sf0.1", LARGE)):
        base = base_frame(spark, sf_dir)
        deps = [os.path.join(sf_dir, "documents.parquet")]
        tag = f"sweep-{name}"
        run = lambda: incremental_curate(  # noqa: E731
            spark, base, delta, deps, base_tag=tag
        ).collect()
        drop_index_artifacts(spark, ("base-lsh-index", "base-para-index"))
        cold = timed(run, runs=1)[0]  # includes both index builds
        warm = timed(run)
        full = timed(lambda: curation_pipeline(spark, sf_dir).collect())
        results[name] = {
            "n_base": base.count(),
            "n_delta": n_delta,
            "cold_build_plus_probe_sec": round(cold, 3),
            "warm_probe_sec_median": round(statistics.median(warm), 3),
            "warm_probe_sec_min": round(min(warm), 3),
            "full_recurate_sec_median": round(statistics.median(full), 3),
        }
        print(json.dumps({name: results[name]}))

    a, b = results["base_sf0.01"], results["base_sf0.1"]
    print("\n--- DESIGN.md block ---\n")
    print("| base | rows | cold (build+probe) | warm probe (median) | "
          "full recurate |")
    print("|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['n_base']} | {r['cold_build_plus_probe_sec']} s "
            f"| {r['warm_probe_sec_median']} s "
            f"| {r['full_recurate_sec_median']} s |"
        )
    print(
        f"\nwarm ratio (10x base): "
        f"{b['warm_probe_sec_median'] / a['warm_probe_sec_median']:.2f}x; "
        f"full-recurate ratio: "
        f"{b['full_recurate_sec_median'] / a['full_recurate_sec_median']:.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
