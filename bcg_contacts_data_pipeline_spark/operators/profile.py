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


def gopher_repetition(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 2,
    dup_n: int = 6,
    top_frac_max: float = 0.20,
    dup_frac_max: float = 0.14,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1.1
    — the quality rules RefinedWeb/Dolma/FineWeb reuse): flag documents
    dominated by internal repetition that exact/near dedup cannot see
    because nothing repeats ACROSS documents.

    Two metrics per document, token-fraction adaptation (the paper
    states character fractions over multi-line web pages; the fixture
    corpus is single-line, token-spaced text, so the token fraction is
    the faithful restatement — thresholds kept at the paper's values):

    - ``top_frac``: tokens claimed by the single most frequent
      ``top_n``-gram (count x n / total tokens) — catches "buy now buy
      now buy now" pages; paper threshold 0.20 for 2-grams;
    - ``dup_frac``: fraction of token POSITIONS covered by at least one
      ``dup_n``-gram that occurs 2+ times within the document —
      coverage, not a count, so overlapping repeats are not
      double-counted (same position-coverage recipe as
      ``dedup.substring_trim``); paper threshold 0.14 for 6-grams.

    Output: ``(id, n_tokens, top_frac, dup_frac, keep)`` for every
    input document WITH NON-NULL TEXT; docs too short to form a gram
    score 0.0 and keep. NULL-text rows are excluded entirely (r13
    advice: the quality family scopes itself to text-bearing documents,
    matching the certified oracle's `WHERE text IS NOT NULL` spine).

    Scale design: the only shuffles are per-doc-keyed aggregations and
    one join of gram occurrences against the per-doc duplicated-gram
    set (both sides keyed (doc, gram) — co-partitioned, no skew beyond
    a single document's length, which also bounds every group). All
    Catalyst expressions; the gram strings never leave their (doc,
    gram) groups.
    """
    toks = F.split(F.trim(F.col(text_col)), " ")
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__doc"), toks.alias("__t"))
        .select("__doc", "__t", F.size("__t").alias("__n"))
    )

    def grams(n: int) -> DataFrame:
        arr = F.transform(
            F.sequence(F.lit(1), F.col("__n") - (n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice("__t", i, n))),
        )
        return (
            base.filter(F.col("__n") >= n)
            .select("__doc", "__n", F.posexplode(arr).alias("__p0", "__g"))
            .select("__doc", "__n", (F.col("__p0") + 1).alias("__i"), "__g")
        )

    top = (
        grams(top_n)
        .groupBy("__doc", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__doc")
        .agg(F.max("__c").alias("__mx"))
        .select(
            "__doc",
            (F.col("__mx") * top_n).cast("double").alias("__top_toks"),
        )
    )

    g6 = grams(dup_n)
    dup_set = (
        g6.groupBy("__doc", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__doc", "__g")
    )
    covered = (
        g6.join(dup_set, ["__doc", "__g"])
        .select(
            "__doc",
            F.explode(
                F.sequence(F.col("__i"), F.col("__i") + (dup_n - 1))
            ).alias("__p"),
        )
        .distinct()
        .groupBy("__doc")
        .agg(F.count(F.lit(1)).alias("__cov"))
    )

    spine = base.select("__doc", F.col("__n").cast("long").alias("n_tokens"))
    out = (
        spine.join(top, "__doc", "left")
        .join(covered, "__doc", "left")
        .select(
            F.col("__doc").alias(id_col),
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce(F.col("__top_toks"), F.lit(0.0))
                / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("top_frac"),
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce(F.col("__cov"), F.lit(0)).cast("double")
                / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
        .withColumn(
            "keep",
            (F.col("top_frac") <= top_frac_max)
            & (F.col("dup_frac") <= dup_frac_max),
        )
    )
    return out
