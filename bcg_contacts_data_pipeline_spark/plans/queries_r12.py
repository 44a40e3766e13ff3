"""Round-12 surface: PSL-correct domain quotas, semantic dedup, the
batch URL-frontier history dedup, and quality-score calibration.

Headliner is the eTLD+1 fix (VERDICT r11 ask #1): per-domain quota
sampling keyed by the REGISTRABLE domain via the checked-in
public-suffix snapshot (`functions/public_suffix.py`) instead of the
last-two-labels heuristic — on a ccTLD corpus the heuristic collapses
every ``.co.uk`` site into one quota bucket, inverting the operator's
purpose; the PSL path keys each registrant separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.plans.queries import (
    _t,
    register,
)

# ---------------------------------------------------------------------------
# eTLD+1 quota sampling over a mixed ccTLD / private-suffix crawl.
# ---------------------------------------------------------------------------

_ETLD_QUOTA = 8  # engages at every shipped SF (~11 docs/domain at sf0.01)

#: suffix classes the fixture rotates through: a default-rule TLD, two
#: ccTLD second-level hierarchies, and a PRIVATE-section multi-tenant
#: host — the four shapes that make-or-break a real crawl quota.
_ETLD_SUFFIXES = [".ORG", ".Co.UK", ".com.AU", ".GitHub.IO"]
_ETLD_SUFFIXES_SQL = ["org", "co.uk", "com.au", "github.io"]


@register(
    "etld1_quota_sample",
    # ground truth from the synthesis arithmetic: the registrable domain
    # is site{k}.{suffix} regardless of the www. subdomain or the label
    # case — DuckDB states the kept set without any PSL logic, so the
    # hash check certifies the broadcast suffix-match join (exact
    # multi-label rules, private section, subdomain folding, case fold)
    # against an independent statement of the expected answer.
    oracle=f"""
    WITH u AS (
      SELECT doc_id, n_chars,
             'site' || CAST((doc_id // 3) % 11 AS VARCHAR) || '.' ||
             CASE doc_id % 4
               WHEN 0 THEN '{_ETLD_SUFFIXES_SQL[0]}'
               WHEN 1 THEN '{_ETLD_SUFFIXES_SQL[1]}'
               WHEN 2 THEN '{_ETLD_SUFFIXES_SQL[2]}'
               ELSE '{_ETLD_SUFFIXES_SQL[3]}' END AS domain
      FROM documents),
    ranked AS (
      SELECT domain, doc_id, n_chars,
             row_number() OVER (PARTITION BY domain
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM u)
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk <= {_ETLD_QUOTA} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           MIN(CASE WHEN rk <= {_ETLD_QUOTA} THEN doc_id END) AS first_kept
    FROM ranked GROUP BY domain
    """,
)
def q_etld1_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling keyed by the TRUE registrable domain
    (eTLD+1, `functions/public_suffix.py:from_url` — broadcast
    suffix-match join against the checked-in public-suffix snapshot).
    The fixture is the adversarial mix the 2-label heuristic gets wrong:
    hosts rotate over four suffix classes (``.org`` default-rule,
    ``.co.uk`` / ``.com.au`` ccTLD second-levels, ``.github.io``
    private-section multi-tenant), half behind a ``www.`` subdomain,
    all mixed-case. The heuristic would key every ``.co.uk`` host as
    ``co.uk`` — ONE bucket for the whole country hierarchy — and
    likewise fold every github.io publisher together; the PSL path
    keys each registrant (``site{{k}}.co.uk``) separately, which the
    arithmetic oracle states independently.

    Scale shape: the PSL match is three broadcast hash joins (no
    shuffle, no UDF — `tests/test_public_suffix.py` pins the plan);
    the quota is one per-domain window shuffle, same as
    ``domain_quota_sample``."""
    from bcg_contacts_data_pipeline_spark.functions.public_suffix import (
        from_url,
    )

    docs = _t(spark, sf_dir, "documents")
    suffix = F.elt(
        (F.col("doc_id") % 4).cast("int") + 1,
        *[F.lit(s) for s in _ETLD_SUFFIXES],
    )
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 8 < 4, F.lit("")).otherwise(F.lit("WWW.")),
        F.lit("Site"),
        (F.expr("doc_id DIV 3") % 11).cast("string"),
        suffix,
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = from_url(
        docs.select("doc_id", "n_chars", url.alias("url")), "url", out="domain"
    ).withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("rk") <= _ETLD_QUOTA, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.min(F.when(F.col("rk") <= _ETLD_QUOTA, F.col("doc_id"))).alias(
            "first_kept"
        ),
    )
