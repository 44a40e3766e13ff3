"""IO connector tests (SURVEY §2.1)."""

from __future__ import annotations

import os
import time

from bcg_contacts_data_pipeline_spark.io import readers as R
from bcg_contacts_data_pipeline_spark.io import writers as W


def test_tsv_roundtrip_single_file(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "Ann", "a@x.com"), (2, "Bob", None)], "id long, name string, email string"
    )
    out = str(tmp_path / "out.tsv")
    W.write_tsv_single(df, out)
    assert os.path.isfile(out)
    back = R.read_tsv(spark, out)
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["email"] == "a@x.com"
    assert rows[2]["email"] is None


def test_read_tsv_all_strings_nullifies_empty(spark, tmp_path):
    p = tmp_path / "src.tsv"
    p.write_text("A\tB\n1\t\nx\ty\n")
    df = R.read_tsv(spark, str(p), all_strings=True)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    rows = sorted(df.collect(), key=lambda r: r["A"])
    assert rows[0]["B"] is None  # '' -> real NULL at ingest
    assert rows[1]["B"] == "y"


def test_headerless_positional(spark, tmp_path):
    p = tmp_path / "5.tsv"
    p.write_text("Ann Lee\tAcme\ta@x.com\n")
    df = R.read_headerless_tsv(spark, str(p), ["name", "org", "email"])
    r = df.collect()[0]
    assert r["name"] == "Ann Lee" and r["email"] == "a@x.com"


def test_source_registry_synonyms_and_union(spark, tmp_path):
    # two files with different spellings of the same logical columns
    (tmp_path / "1.tsv").write_text(
        "Email Address\tFirst Name\tLast Name\tMobile Number\n"
        "a@x.com\tAnn\tLee\t0412\n"
    )
    (tmp_path / "4.tsv").write_text(
        "First Name\tLast Name\tEmail\tMobile\n" "Bob\tRoy\tb@x.com\t0413\n"
    )
    reg = R.SourceRegistry(
        {
            "s_firstname": ["first name"],
            "s_lastname": ["last name"],
            "s_email": ["email address", "email"],
            "s_mobile": ["mobile number", "mobile", "phone number"],
            "s_fullname": ["full name"],
        }
    )
    df = R.read_sources(
        spark, [str(tmp_path / "1.tsv"), str(tmp_path / "4.tsv")], reg
    )
    rows = {r["s_email"]: r for r in df.collect()}
    assert rows["a@x.com"]["s_firstname"] == "Ann"
    assert rows["b@x.com"]["s_mobile"] == "0413"
    assert rows["a@x.com"]["s_fullname"] is None  # absent everywhere -> NULL
    assert rows["a@x.com"]["source_file"].endswith("1.tsv")


def test_latest_file(tmp_path):
    a = tmp_path / "a.tsv"
    b = tmp_path / "b.tsv"
    a.write_text("x\n")
    time.sleep(0.05)
    b.write_text("y\n")
    assert R.latest_file(str(tmp_path)).endswith("b.tsv")


def test_json_log_sink(spark, tmp_path):
    df = spark.createDataFrame([(1, "f", "old", "new")], "row long, field string, old_value string, new_value string")
    out = str(tmp_path / "log.json")
    W.write_json_log(df, out, single=True)
    import json

    rec = json.loads(open(out).readline())
    assert rec["field"] == "f" and rec["new_value"] == "new"
