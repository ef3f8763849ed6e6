#!/usr/bin/env python
"""Profile one registered query: run it N times under cProfile and print
the top cumulative-time functions, separating driver-side Python work from
py4j socket waits (JVM execution time shows up as socket.recv).

Usage: python tools/profile_query.py <query> [--sf DIR] [--runs N] [--top K]
"""

from __future__ import annotations

import argparse
import cProfile
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_etl_framework_spark.queries import QUERIES  # noqa: E402
from spark_etl_framework_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    spark = get_session("profile")
    from spark_etl_framework_spark.catalog import TABLES, load_table

    for name in TABLES:
        load_table(spark, args.sf, name).count()

    fn = QUERIES[args.query]
    # warm-up run (codegen compilation etc.)
    t0 = time.time()
    fn(spark, args.sf).count()
    print(f"# warmup: {time.time() - t0:.3f}s", file=sys.stderr)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    for _ in range(args.runs):
        fn(spark, args.sf).count()
    prof.disable()
    wall = time.time() - t0
    print(f"# {args.runs} profiled runs: {wall:.3f}s total "
          f"({wall / args.runs:.3f}s each)", file=sys.stderr)

    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    st.print_stats(args.top)


if __name__ == "__main__":
    main()
