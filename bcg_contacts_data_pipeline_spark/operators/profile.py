"""Column profiling — the reference's ad-hoc stat logging
(clean_contacts.py:105-109,132,141-147: notna().sum(), value_counts,
Y/N counts) generalized into one operator.

ONE aggregation job regardless of how many columns are profiled: every
column's stats are computed as sibling aggregate expressions in a single
``agg`` over one scan, then unpivoted row-wise with an inline explode
(pure projection — no extra shuffle, no union of per-column jobs).
N profiled columns used to mean N scheduler round-trips and N scans;
now it is one partial+final aggregate pair over one column-pruned scan.

``approx=True`` swaps exact COUNT(DISTINCT) for the HLL++ sketch
(`approx_count_distinct`) — at 100 TB the exact distinct is a full
shuffle per column, the sketch is map-side mergeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str], approx: bool = True
) -> DataFrame:
    """(col, n_rows, n_nonnull, n_distinct, min_v, max_v) per column,
    one row per profiled column, computed in a single aggregation job."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        nd = (
            F.approx_count_distinct(c)
            if approx
            else F.countDistinct(c).cast("long")
        )
        aggs.append(
            F.struct(
                F.count(c).alias("n_nonnull"),
                nd.alias("n_distinct"),
                F.min(F.col(c).cast("double")).alias("min_v"),
                F.max(F.col(c).cast("double")).alias("max_v"),
            ).alias(f"__p_{c}")
        )
    one_row = df.agg(*aggs)
    unpivoted = one_row.select(
        "__n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"), F.col(f"__p_{c}").alias("s")
                    )
                    for c in cols
                ]
            )
        ).alias("e"),
    )
    return unpivoted.select(
        F.col("e.col").alias("col"),
        F.col("__n_rows").alias("n_rows"),
        F.col("e.s.n_nonnull").alias("n_nonnull"),
        F.col("e.s.n_distinct").alias("n_distinct"),
        F.col("e.s.min_v").alias("min_v"),
        F.col("e.s.max_v").alias("max_v"),
    )
