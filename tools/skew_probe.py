"""Empty-dedup-key skew probe (VERDICT r10 ask #8 / SURVEY §4 hazard).

The reference's grouping key (clean_contacts.py:167-177: email, else
lower(name)+'-'+mobile) degenerates when a feed ships rows with ALL key
fields blank — at 100 TB a single '' / NULL group can hold a double-digit
percentage of the corpus. The engine's two defenses
(operators/dedup.py:most_complete_merge):

1. DEFAULT: keyless rows take the passthrough union — they never enter
   the groupBy at all, so there is no hot group to skew.
2. merge_empty_keys=True (caller opts into grouping them): the merge
   aggregates via ``max_by(value, struct(len, ord))`` with partial
   (map-side) aggregation enabled — every task pre-collapses the hot
   key to ONE partial row per column, so the reduce side of the
   degenerate group receives n_tasks rows, not n_rows. AQE's skew-join
   splitting never needs to fire because no oversized shuffle block
   exists in the first place.

This probe MEASURES both claims on the kept 100x replica
(.scale/x100/customer.parquet, ~15M rows) with HALF the corpus keyless:
wall time for the 50%-degenerate corpus must stay within noise of the
all-distinct-key baseline on the same row count. Run on an idle host:

    python tools/skew_probe.py [--sf-dir .scale/x100]

Prints one JSON line; PERF.md records the adjudicated numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(ROOT, ".scale", "x100"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bcg_contacts_data_pipeline_spark.operators.dedup import (
        dedup_key,
        most_complete_merge,
    )
    from bcg_contacts_data_pipeline_spark.session import get_spark

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    cust = spark.read.parquet(f"{args.sf_dir}/customer.parquet")
    n = cust.count()
    # half the corpus keyless (every even custkey ships blank email,
    # name, and phone -> dedup_key NULL), half uniquely keyed
    degenerate = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 2 == 0, F.lit("")).otherwise(
            F.concat(F.lit("u"), F.col("c_custkey"), F.lit("@x.org"))
        ).alias("email"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("")).otherwise(
            F.col("c_name")
        ).alias("fullname"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("")).otherwise(
            F.col("c_acctbal").cast("string")
        ).alias("mobile"),
        F.col("c_acctbal").cast("string").alias("note"),
    )
    baseline = cust.select(
        "c_custkey",
        F.concat(F.lit("u"), F.col("c_custkey"), F.lit("@x.org")).alias(
            "email"
        ),
        F.col("c_name").alias("fullname"),
        F.col("c_acctbal").cast("string").alias("mobile"),
        F.col("c_acctbal").cast("string").alias("note"),
    )
    key = dedup_key("email", "fullname", "mobile")
    cols = ["email", "fullname", "mobile", "note"]

    def timed(df, **kw) -> float:
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            most_complete_merge(df, key, cols, order_by="c_custkey", **kw).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            spark.catalog.clearCache()
        return round(best, 2)

    # warm-up
    cust.groupBy("c_nationkey").count().write.format("noop").mode(
        "overwrite"
    ).save()

    t_base = timed(baseline)
    t_passthrough = timed(degenerate)  # default: keyless rows bypass
    t_grouped = timed(degenerate, merge_empty_keys=True)  # one giant group

    payload = {
        "rows": n,
        "degenerate_fraction": 0.5,
        "t_all_distinct_keys": t_base,
        "t_half_keyless_passthrough": t_passthrough,
        "t_half_keyless_merged_single_group": t_grouped,
        "grouped_over_baseline": round(t_grouped / t_base, 2),
        "passthrough_over_baseline": round(t_passthrough / t_base, 2),
    }
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
