"""Column profiling — the reference's ad-hoc stat logging
(clean_contacts.py:105-109,132,141-147: notna().sum(), value_counts,
Y/N counts) generalized into one operator.

One job per profiled column batch; each column's stats are a single-pass
multi-aggregate (A5). ``approx=True`` swaps exact COUNT(DISTINCT) for
the HLL++ sketch (`approx_count_distinct`) — at 100 TB the exact
distinct is a full shuffle per column, the sketch is map-side mergeable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str], approx: bool = True
) -> DataFrame:
    """(col, n_rows, n_nonnull, n_distinct, min_v, max_v) per column."""
    frames = []
    for c in cols:
        nd = (
            F.approx_count_distinct(c)
            if approx
            else F.countDistinct(c).cast("long")
        )
        frames.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(c).alias("n_nonnull"),
                nd.alias("n_distinct"),
                F.min(F.col(c).cast("double")).alias("min_v"),
                F.max(F.col(c).cast("double")).alias("max_v"),
            ).select(F.lit(c).alias("col"), "*")
        )
    return reduce(lambda a, b: a.unionByName(b), frames)
