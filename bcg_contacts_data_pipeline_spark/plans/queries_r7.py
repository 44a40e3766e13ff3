"""Round-7 query surface: the last three distinct TPC-H plan features
the board didn't yet exercise — conditional aggregation (CASE inside
SUM: Q12's two-priority counts, Q14's promo-revenue ratio) and ranked
top-k after join+agg with the LIMIT pushed into TakeOrderedAndProject
(Q10) — plus a nested-path / array-element / missing-key Variant
extraction query.

Registered into the same ``plans.queries`` registry (imported at the
bottom of that module). Same determinism rules as every other entry:
decimal-exact money math before any double cast, single IEEE division
written identically in both engines, unique-key tiebreaks on every
ranked LIMIT.

Reference parity note: the reference pipeline (clean_contacts.py,
merge logic) has no TPC-H analytics — this module is part of the
beyond-reference analytic surface SURVEY.md §2 commits to, proving the
engine on plan shapes a 100 TB warehouse workload hits daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.plans.queries import (
    _dec,
    _events,
    _t,
    register,
)

# ---------------------------------------------------------------------------
# TPC-H Q12: conditional aggregation over a join — CASE inside SUM.
# ---------------------------------------------------------------------------


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two CASE-conditional SUMs in ONE grouped
    aggregate over a fact-fact join. ``l_linestatus`` stands in for the
    ``l_shipmode`` column the driver schema lacks; the 1996 ship-year
    band stands in for the receipt-date window. The plan feature under
    test: both priority classes are counted in a single pass — one
    join, one aggregation, ONE shuffle for the grouping (plan-asserted
    in tests/test_plans.py); the naive two-query/self-join form would
    double the fact scan. The CASE branches are integer literals, so
    both counts are exact BIGINTs on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14: promo-revenue ratio — CASE inside SUM feeding one division.
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(100.0 * (CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                              THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                   * (1 - CAST(l_discount AS DECIMAL(18,4)))
                              ELSE 0 END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE))
               AS DOUBLE) AS promo_revenue_pct,
           CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END)
               AS BIGINT) AS promo_lines,
           CAST(COUNT(*) AS BIGINT) AS total_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01'
      AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: a global scalar aggregate whose numerator is a
    CASE-guarded subset of its denominator — the promo-revenue share of
    one ship month. One broadcast join (part is the dim side), one
    scalar aggregation, one shuffle to the single reducer — the CASE
    adds no plan nodes beyond the projection (plan-asserted). Money math
    is decimal-exact until the final division, which is written as
    ``100.0 * (promo_double / total_double)`` in BOTH engines so the
    IEEE rounding sequence is identical."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(
        F.lit(0)
    )
    agg = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(promo).alias("__promo"),
            F.sum(disc_price).alias("__total"),
            F.sum(F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0))
            .cast("long")
            .alias("promo_lines"),
            F.count(F.lit(1)).alias("total_lines"),
        )
    )
    return agg.select(
        (
            F.lit(100.0)
            * (F.col("__promo").cast("double") / F.col("__total").cast("double"))
        ).alias("promo_revenue_pct"),
        "promo_lines",
        "total_lines",
    )


# ---------------------------------------------------------------------------
# TPC-H Q10: ranked top-k after join+agg — LIMIT pushed into
# TakeOrderedAndProject (no global sort materialization).
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name, c_mktsegment,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE)
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in one
    quarter, ranked, top 20. The plan feature under test: the ORDER BY
    + LIMIT after join+agg must compile to ``TakeOrderedAndProject``
    (each partition keeps a 20-row heap, the driver merges k·P rows) —
    a global ``Sort`` before the limit would shuffle the full aggregate
    output, which at 100 TB is millions of customer rows for a 20-row
    answer. Plan-asserted in tests/test_plans.py. ``c_custkey`` is the
    unique tiebreak, so the selected 20-row SET is deterministic on
    both engines even under revenue ties. Revenue is decimal-exact
    before the double cast; ``acctbal`` is rounded to its storage
    precision (2 decimals) on both engines so the group key is
    bit-identical."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            "c_mktsegment",
            _dec("c_acctbal", 2).cast("double").alias("acctbal"),
        )
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Variant, deepened: nested paths, array elements, missing keys.
# ---------------------------------------------------------------------------


@register(
    "variant_nested_extract",
    oracle="""
    WITH payload AS (
      SELECT event_type,
             '{"meta": {"k": ' || CAST(json_extract(props, '$.k') AS VARCHAR)
               || ', "tags": [3, '
               || CAST(CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS VARCHAR)
               || ']}, "type": "' || event_type || '"}' AS doc
      FROM events),
    ext AS (
      SELECT event_type,
             CAST(json_extract(doc, '$.meta.k') AS BIGINT) AS meta_k,
             CAST(json_extract(doc, '$.meta.tags[1]') AS BIGINT) AS tag1,
             CAST(json_extract(doc, '$.meta.absent') AS BIGINT) AS missing_k
      FROM payload)
    SELECT event_type,
           CAST(SUM(meta_k) AS BIGINT) AS k_sum,
           CAST(SUM(tag1) AS BIGINT) AS tag1_sum,
           CAST(COUNT(missing_k) AS BIGINT) AS n_missing_nonnull,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ext
    GROUP BY event_type
    """,
)
def variant_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant extraction beyond one scalar path (the
    ``variant_props_stats`` baseline): a NESTED object path
    (``$.meta.k``), an ARRAY element (``$.meta.tags[1]``), and a
    missing key (``$.meta.absent`` -> NULL, counted to prove the
    missing-key semantics, not error, on both engines). The nested
    document is constructed from the flat ``props`` column with
    identical string concatenation in both engines (the driver corpus
    carries flat JSON only), then parsed ONCE per row into a Spark 4
    VariantType value feeding all three ``variant_get`` extractions —
    parse-once/extract-many, all JVM-side, no Python in the row path.
    At 100 TB this is the shredded-access pattern: one binary variant
    decode per row regardless of how many paths a query pulls."""
    ev = _events(spark, sf_dir)
    k_str = F.get_json_object(F.col("props"), "$.k")
    doc = F.concat(
        F.lit('{"meta": {"k": '),
        k_str,
        F.lit(', "tags": [3, '),
        (k_str.cast("bigint") * 2).cast("string"),
        F.lit(']}, "type": "'),
        F.col("event_type"),
        F.lit('"}'),
    )
    v = F.parse_json(doc)
    ext = ev.select(
        "event_type",
        F.variant_get(v, "$.meta.k", "bigint").alias("meta_k"),
        F.variant_get(v, "$.meta.tags[1]", "bigint").alias("tag1"),
        F.variant_get(v, "$.meta.absent", "bigint").alias("missing_k"),
    )
    return ext.groupBy("event_type").agg(
        F.sum("meta_k").alias("k_sum"),
        F.sum("tag1").alias("tag1_sum"),
        F.count("missing_k").alias("n_missing_nonnull"),
        F.count(F.lit(1)).alias("n_events"),
    )
