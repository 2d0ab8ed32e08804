"""Profile one declared query: wall time split between driver-side Python
and JVM (py4j) waits, plus a cProfile cumulative listing of hotspots.

Usage::

    python scripts/profile_query.py <query_name> [sf_dir] [--cprofile]

Runs the query once warm (sf0.001) then once measured at sf_dir
(default /root/testdata/sf0.1), with the same collect()-based action as
bench.py. With --cprofile, prints the top cumulative-time functions so
driver-Python hotspots (avro encode, footer reads, planning loops) are
visible separately from py4j socket waits (JVM job time).
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from iceberg_examples_spark.registry import QUERIES  # noqa: E402
from iceberg_examples_spark.session import get_spark  # noqa: E402


def run(spark, name, sf_dir):
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).collect()
    return time.perf_counter() - t0


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf0.1"
    use_cprofile = "--cprofile" in sys.argv
    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setJobDescription(f"warmup {name}")
    try:
        run(spark, name, "/root/testdata/sf0.001")
    except Exception as e:
        print(f"warmup failed: {e}")
    spark.sparkContext.setJobDescription(f"measure {name}")
    if use_cprofile:
        prof = cProfile.Profile()
        prof.enable()
        dt = run(spark, name, sf_dir)
        prof.disable()
        print(f"\n{name}: {dt:.3f}s at {sf_dir}")
        st = pstats.Stats(prof)
        st.sort_stats("cumulative")
        print("\n=== top cumulative ===")
        st.print_stats(35)
        # py4j socket wait = JVM-side job time
        total_py4j = 0.0
        for (fn, line, func), (cc, nc, tt, ct, callers) in st.stats.items():
            if "py4j" in fn and func in ("send_command", "_get_connection"):
                pass
            if "socket" in fn and func == "readinto":
                total_py4j += tt
        print(f"py4j/socket readinto (JVM wait) internal time: {total_py4j:.3f}s of {dt:.3f}s")
    else:
        for i in range(3):
            dt = run(spark, name, sf_dir)
            print(f"{name} run{i}: {dt:.3f}s")


if __name__ == "__main__":
    main()
