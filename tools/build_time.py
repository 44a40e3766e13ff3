"""Measure driver-side plan CONSTRUCTION wall per registered query —
build only, no execution (VERDICT r9 ask #7).

py4j round-trips constructing wide expression trees are the one scale
cost PLANS.md's executed-plan facts cannot see: `plans/contacts.py:124`
measured ~9 s of a 12 s run spent BUILDING the 88-column projection
before the SQL-string rewrite. This probe times `fn(spark, sf_dir)` —
which returns an unexecuted DataFrame — min-of-2 warm, and prints the
board sorted slowest-first.

Caveat: some builds intentionally run Spark jobs (iterative label
propagation's convergence loop, renumber's partition-offset collect,
streaming drains behind checkpoint caches); their numbers here include
that eager work and are judged against the whitelist in
tests/test_plans.py, not the 1 s pure-build budget.

Usage: python tools/build_time.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from bcg_contacts_data_pipeline_spark.session import get_spark  # noqa: E402


def measure(spark, sf_dir: str, names=None, runs: int = 2) -> dict[str, float]:
    out: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        if name.startswith("stream_"):
            continue  # building a streaming query executes its drain
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir)  # build only — never executed
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = set(args[1:]) if len(args) > 1 else None
    spark = get_spark("build-time")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: first plan build in a session pays parquet schema inference
    QUERIES["q1_pricing_summary"](spark, sf_dir)
    timings = measure(spark, sf_dir, names)
    for name in sorted(timings, key=timings.get, reverse=True):
        print(f"{timings[name]:8.3f}  {name}")
    print(json.dumps({"sf_dir": sf_dir, "build_s": timings}))


if __name__ == "__main__":
    main()
