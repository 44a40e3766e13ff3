"""Query registry: every operator exposed through the driver contract.

Each entry pairs a Spark implementation (callable ``(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI-SQL oracle string for DuckDB.
Determinism rules used throughout so value-hashes match bit-for-bit:

- Money/metric aggregates go through ``DECIMAL(18,4)`` (exact, associative
  — immune to float summation order differing between engines), then cast
  to DOUBLE at the end.
- Averages are ``CAST(exact_decimal_sum AS DOUBLE) / COUNT`` — one IEEE
  division of identical operands.
- Every ``max_by``/``arg_max`` ordering is made *total* with a unique id
  tiebreak, so no unspecified tie choices.
- Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.operators import dedup as dedup_ops

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(c, scale: int = 4):
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Dedup-merge (SURVEY §2.4 A1/A2) — the flagship
# ---------------------------------------------------------------------------

@register(
    "dedup_merge",
    oracle="""
    SELECT CAST(c_nationkey AS VARCHAR) || '-' || c_mktsegment AS dedup_key,
           arg_max(c_name, length(c_name) * 100000000 - c_custkey) AS c_name,
           CAST(arg_max(c_acctbal, length(CAST(c_acctbal AS VARCHAR)) * 100000000 - c_custkey) AS DOUBLE) AS c_acctbal,
           COUNT(*) AS group_size
    FROM customer
    GROUP BY 1
    """,
)
def q_dedup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-complete-record merge (clean_contacts.py:194-223 semantics) over
    a derived composite key. One shuffle; map-side partial max_by."""
    cust = _t(spark, sf_dir, "customer")
    key = F.concat_ws(
        "-", F.col("c_nationkey").cast("string"), F.col("c_mktsegment")
    )
    merged = dedup_ops.most_complete_merge(
        cust,
        key,
        value_cols=["c_name", "c_acctbal"],
        order_by=-F.col("c_custkey"),
    )
    return merged.select(
        "dedup_key",
        "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        F.col("group_size").cast("long").alias("group_size"),
    )


# ---------------------------------------------------------------------------
# TPC-H-style analytics (scan + filter + agg; the bench headliners)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-scan aggregate with exact decimal arithmetic.
    Catalyst gets partial aggregation + whole-stage codegen for free."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc_price * (F.lit(1) + _dec("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
