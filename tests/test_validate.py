"""Validation rule engine tests (SURVEY §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.operators import validate as V


def fixture(spark):
    rows = [
        (1, "Ann", "a@x.com", "0412345678", ""),       # clean
        (2, "", "bad-email", "12", "0499999999"),      # missing name + bad email + bad phone
        (3, "Cal", None, None, None),                  # no phone at all
        (4, None, "ok@x.com", "123456789012345678", None),  # name null + phone too long
    ]
    return spark.createDataFrame(
        rows, "id long, name string, email string, mobile string, homephone string"
    )


def rules():
    return [
        V.required("name"),
        V.email_format("email"),
        V.phone_format("mobile"),
        V.at_least_one_present(["mobile", "homephone"], "No phone number present"),
    ]


def test_exploded_errors(spark):
    out = V.validate_exploded(fixture(spark), rules(), ["id"])
    got = {(r["id"], r["error"]) for r in out.collect()}
    assert got == {
        (2, "Missing name"),
        (2, "Invalid email format in email"),
        (2, "Invalid phone format in mobile"),
        (3, "No phone number present"),
        (4, "Missing name"),
        # row 4's mobile is PRESENT (so at-least-one passes) but invalid
        (4, "Invalid phone format in mobile"),
    }


def test_document_shape_and_severity(spark):
    docs = V.validate_documents(
        fixture(spark), rules(), ["id"], name_col="name"
    )
    rows = {r["id"]: r for r in docs.collect()}
    assert 1 not in rows  # clean row excluded
    assert rows[2]["has_critical"]  # required name is critical
    assert not rows[3]["has_critical"]  # phone-presence is data-quality only
    summary = V.severity_summary(docs).collect()[0]
    assert summary["rows_with_errors"] == 3
    assert summary["critical_rows"] == 2


def test_skip_predicate(spark):
    df = fixture(spark)
    skip = F.col("name").isNull() & F.col("email").isNull()
    out = V.validate_exploded(df, rules(), ["id"], skip=skip)
    ids = {r["id"] for r in out.collect()}
    assert ids == {2, 3, 4}  # nothing skipped here has all-null name+email


def test_error_count_column_matches_exploded(spark):
    """error_count() (the zero-shuffle Column form) agrees with the
    exploded relation per row; skipped rows count 0."""
    df = fixture(spark)
    skip = F.col("id") == 3
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", V.error_count(rules(), skip=skip).alias("n")
        ).collect()
    }
    exploded = V.validate_exploded(df, rules(), ["id"], skip=skip)
    want = {1: 0, 2: 0, 3: 0, 4: 0}
    for r in exploded.collect():
        want[r["id"]] += 1
    want[3] = 0  # skipped
    assert got == want
