"""Unit tests for the scalar normalization library (SURVEY §2.5 F1–F14)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.functions import normalize as N


def one(spark, expr, value=None):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr.alias("r")).collect()[0]["r"]


def col_on(spark, expr_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["r"] for r in df.select(expr_fn(F.col("v")).alias("r")).collect()]


def test_nullify_sentinels(spark):
    vals = ["", "  ", "nan", "None", "NaN", " nan ", "real", None]
    out = col_on(spark, N.nullify_sentinels, vals)
    assert out == [None, None, None, None, None, None, "real", None]


def test_norm_email(spark):
    vals = [
        "  Alice@Example.COM ",
        "bad-at-example.com",
        "a@b.c",
        "x@y",          # no dot after @
        "weird@x.com extra",  # prefix match passes (re.match parity)
        None,
    ]
    out = col_on(spark, N.norm_email, vals)
    assert out == ["alice@example.com", None, "a@b.c", None, "weird@x.com extra", None]


def test_digits_only_and_norm_phone(spark):
    assert col_on(spark, N.digits_only, ["+1 (555) 123-4567"]) == ["15551234567"]
    # >= 10 digits -> keep LAST 10 (fill_missing_contacts.py:14-21)
    out = col_on(spark, N.norm_phone, ["+1 (555) 123-4567", "123456", "", None])
    assert out == ["5551234567", "123456", None, None]


def test_phone_valid(spark):
    out = col_on(spark, lambda c: N.phone_valid(c), ["5551234", "123", "1" * 15, "1" * 16])
    assert out == [True, False, True, False]


def test_title_case_pandas_parity(spark):
    import pandas as pd

    vals = ["o'brien o'neil", "anne-marie smith", "MIXED case", "  ed  ", "d3v ops", "a"]
    expected = pd.Series(vals).str.title().tolist()
    out = col_on(spark, N.title_case, vals)
    assert out == expected


def test_yn_flag(spark):
    out = col_on(spark, N.yn_flag, [" y ", "N", "yes", "1", "", None])
    assert out == ["Y", "N", None, None, None, None]


def test_norm_ws(spark):
    out = col_on(spark, N.norm_ws, ["  John   Q.\t Smith "])
    assert out == ["john q. smith"]


def test_full_name_fallback(spark):
    df = spark.createDataFrame(
        [("Ann", "Lee", "ignored"), ("", "", "Full Name"), (None, None, None)],
        "first string, last string, fullname string",
    )
    out = [
        r["r"]
        for r in df.select(
            N.full_name("first", "last", "fullname").alias("r")
        ).collect()
    ]
    assert out == ["Ann Lee", "Full Name", None]


def test_parse_ts_coerce(spark):
    out = col_on(spark, N.parse_ts, ["2010-12-13 14:54:49.000", "not a date"])
    assert out[0] is not None and out[0].year == 2010
    assert out[1] is None


def test_longest_valid_aggregate(spark):
    df = spark.createDataFrame(
        [(1, "ab", 1), (1, "abcd", 2), (1, "nan", 3), (1, None, 4), (2, "", 1)],
        "k int, v string, rn int",
    )
    out = (
        df.groupBy("k")
        .agg(N.longest_valid(F.col("v"), -F.col("rn")).alias("best"))
        .orderBy("k")
        .collect()
    )
    assert out[0]["best"] == "abcd"
    assert out[1]["best"] is None


def test_bpe_ish_tokens(spark):
    import pyspark.sql.functions as F

    from bcg_contacts_data_pipeline_spark.functions.text import (
        bpe_ish_token_count,
        bpe_ish_tokens,
    )

    df = spark.createDataFrame([("GPT-4 rocks!",), ("",)], ["t"])
    rows = df.select(
        bpe_ish_tokens("t").alias("toks"),
        bpe_ish_token_count("t").alias("n"),
    ).collect()
    assert rows[0].toks == ["GPT", "-", "4", "rocks", "!"]
    assert rows[0].n == 5
    assert rows[1].n == 0


def test_rolling_hash_order_sensitive(spark):
    from bcg_contacts_data_pipeline_spark.functions.text import rolling_hash

    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("a b c",)], ["t"]
    )
    h = [r[0] for r in df.select(rolling_hash("t")).collect()]
    assert h[0] == h[2]
    assert h[0] != h[1]
    # manual fold check
    want = 0
    for ch in "a b c":
        want = (want * 31 + ord(ch)) % ((1 << 31) - 1)
    assert h[0] == want

def test_pii_counts_and_redact(spark):
    from bcg_contacts_data_pipeline_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            ("mail bob@corp.example and eve@x.io, call 555-123-4567",),
            ("server at 192.168.0.1 and 10.0.0.7",),
            ("no pii here",),
            ("",),
        ],
        "v string",
    )
    rows = df.select(
        pii_counts("v").alias("p"), redact_pii("v").alias("r")
    ).collect()
    assert (rows[0].p.email, rows[0].p.phone, rows[0].p.ipv4) == (2, 1, 0)
    assert rows[0].r == "mail [PII] and [PII], call [PII]"
    assert (rows[1].p.email, rows[1].p.phone, rows[1].p.ipv4) == (0, 0, 2)
    assert rows[1].r == "server at [PII] and [PII]"
    assert (rows[2].p.email, rows[2].p.phone, rows[2].p.ipv4) == (0, 0, 0)
    assert rows[2].r == "no pii here"
    assert (rows[3].p.email, rows[3].p.phone, rows[3].p.ipv4) == (0, 0, 0)


def test_repetition_ratio(spark):
    from bcg_contacts_data_pipeline_spark.functions.text import (
        repetition_ratio,
    )

    df = spark.createDataFrame(
        [
            ("buy now " * 6,),          # one 3-gram window cycle, heavy repeats
            ("all words here are completely distinct tokens",),
            ("one two",),               # < n tokens -> 0.0
            ("",),
        ],
        "v string",
    )
    out = [r.r for r in df.select(repetition_ratio("v").alias("r")).collect()]
    # "buy now "*6 -> 12 tokens -> 10 grams, only 2 distinct ("buy now buy",
    # "now buy now") -> 1 - 2/10 = 0.8
    assert out[0] == 0.8
    assert out[1] == 0.0
    assert out[2] == 0.0
    assert out[3] == 0.0
    # case-insensitive: repeated phrase differing only in case still repeats
    df2 = spark.createDataFrame([("Buy Now buy NOW bUy noW",)], "v string")
    r = df2.select(repetition_ratio("v").alias("r")).collect()[0].r
    # 6 tokens -> 4 grams, all "buy now buy"/"now buy now" -> 2 distinct
    assert r == 0.5

def test_hash_bucket_and_split(spark):
    from bcg_contacts_data_pipeline_spark.functions.sampling import (
        assign_split,
        hash_bucket,
    )
    import pytest

    df = spark.range(1000).select(F.col("id"))
    out = df.select(
        "id",
        hash_bucket("id", 100, "s1").alias("b"),
        assign_split("id", seed="s1").alias("split"),
    ).collect()
    # buckets in range, split consistent with bucket
    for r in out:
        assert 0 <= r.b < 100
        want = "train" if r.b < 80 else ("val" if r.b < 90 else "test")
        assert r.split == want
    # deterministic: same seed -> same assignment; different seed -> differs
    again = {r.id: r.b for r in df.select("id", hash_bucket("id", 100, "s1").alias("b")).collect()}
    other = {r.id: r.b for r in df.select("id", hash_bucket("id", 100, "s2").alias("b")).collect()}
    assert all(again[r.id] == r.b for r in out)
    assert any(again[k] != other[k] for k in again)
    # roughly balanced: each split near its weight on 1000 ids
    from collections import Counter
    counts = Counter(r.split for r in out)
    assert 700 < counts["train"] < 900
    assert 50 < counts["val"] < 160
    assert 50 < counts["test"] < 160
    # stability under growth: assignment of id is independent of the frame
    sub = {r.id: r.b for r in spark.range(10).select("id", hash_bucket("id", 100, "s1").alias("b")).collect()}
    assert all(sub[k] == again[k] for k in sub)

    with pytest.raises(ValueError, match="sum to 100"):
        assign_split("id", {"a": 50, "b": 40})


def test_tfidf_top_terms(spark):
    from bcg_contacts_data_pipeline_spark.operators.tfidf import (
        tfidf_top_terms,
    )
    import math

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
            (4, ""),
        ],
        "id long, text string",
    )
    rows = tfidf_top_terms(df, "id", "text", k=2).collect()
    got = {(r.id, r.rank): (r.term, r.tf, r.df, r.tfidf) for r in rows}
    # N=4. doc1: apple tf2 df1 -> 2*ln(4)=2.772589; banana tf1 df2 -> ln(2)
    assert got[(1, 1)] == ("apple", 2, 1, round(2 * math.log(4.0), 6))
    assert got[(1, 2)] == ("banana", 1, 2, round(math.log(2.0), 6))
    # doc3: cherry tf3 df2 -> 3*ln(2)=2.079442 beats durian ln(4)=1.386294
    assert got[(3, 1)][0] == "cherry"
    assert got[(3, 2)][0] == "durian"
    # blank doc emits nothing; k caps rows per doc
    assert not any(r.id == 4 for r in rows)
    assert max(r.rank for r in rows) <= 2
