"""Pin normalize_sql.py SQL-text builders to their normalize.py twins.

The pipeline's wide projections build expressions as SQL strings (py4j
round-trip economics — see functions/normalize_sql.py); the composable
public surface stays Column-based. Two representations of one semantic
can drift, so every builder is evaluated side-by-side with its twin over
an adversarial corpus — any divergence is a red test naming the function.
"""

import pyspark.sql.functions as F
import pytest

from bcg_contacts_data_pipeline_spark.functions import normalize as N
from bcg_contacts_data_pipeline_spark.functions import normalize_sql as NS

#: Edge cases across every rule: sentinels (bare and padded), case mixes,
#: emails (valid/invalid/anchor-abuse), phones, float-suffixed ints,
#: whitespace runs, unicode, quotes, NULL.
CORPUS = [
    None, "", " ", "nan", " nan ", "None", "NaN", "NAN", "none",
    "Alice", "o'brien o`malley", "JOHN SMITH-JONES", "  spaced   out  ",
    "a@b.co", " A@B.Co ", "not-an-email", "x@y", "pre a@b.co post",
    "@@@", "a@b.c@d.e", "+1 (555) 123-4567", "0123456789012345",
    "42", "42.0", "-17.000", "3.14", "42.", ".0", "-42.0x",
    "y", "N", " Y ", "yes", "Ü", "naïve café", "tab\there",
    "2020-01-02 03:04:05", "02/01/2020", "garbage date",
    "a\\b", "it's", 'quo"te',
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(v,) for v in CORPUS], "v string")


PAIRS = [
    ("nullify_sentinels", lambda: N.nullify_sentinels(F.col("v")),
     lambda: NS.nullify_sentinels_sql("v")),
    ("norm_email", lambda: N.norm_email(F.col("v")),
     lambda: NS.norm_email_sql("v")),
    ("digits_only", lambda: N.digits_only(F.col("v")),
     lambda: NS.digits_only_sql("v")),
    ("title_case", lambda: N.title_case(F.col("v")),
     lambda: NS.title_case_sql("v")),
    ("yn_flag", lambda: N.yn_flag(F.col("v")),
     lambda: NS.yn_flag_sql("v")),
    ("norm_ws", lambda: N.norm_ws(F.col("v")),
     lambda: NS.norm_ws_sql("v")),
    ("parse_ts", lambda: N.parse_ts(F.col("v")),
     lambda: NS.parse_ts_sql("v")),
    ("is_valid_value", lambda: N.is_valid_value(F.col("v")),
     lambda: NS.is_valid_value_sql("v")),
    # int_preserve has no Column twin by name; its semantics were inlined
    # in the pre-SQL clean_fields — pin against that original form.
    ("int_preserve", lambda: (
        F.when(
            N.nullify_sentinels(F.col("v")).rlike(r"^-?\d+\.0+$"),
            F.regexp_replace(N.nullify_sentinels(F.col("v")), r"\.0+$", ""),
        ).otherwise(N.nullify_sentinels(F.col("v")))
    ), lambda: NS.int_preserve_sql(NS.nullify_sentinels_sql("v"))),
]


@pytest.mark.parametrize("name,col_fn,sql_fn", PAIRS, ids=[p[0] for p in PAIRS])
def test_sql_twin_equivalence(corpus_df, name, col_fn, sql_fn):
    rows = corpus_df.select(
        "v",
        col_fn().alias("col_form"),
        F.expr(sql_fn()).alias("sql_form"),
    ).collect()
    bad = [(r.v, r.col_form, r.sql_form) for r in rows
           if r.col_form != r.sql_form]
    assert not bad, f"{name}: SQL twin diverged from Column twin: {bad[:5]}"


def test_sentinel_lists_agree():
    """SENTINEL_IN (SQL text) must enumerate exactly normalize.SENTINELS."""
    inner = NS.SENTINEL_IN.strip("()")
    sql_vals = {s.strip().strip("'") for s in inner.split(",")}
    assert sql_vals == set(N.SENTINELS)


def test_longest_valid_agg_sql_matches_column_form(spark):
    df = spark.createDataFrame(
        [("k", "ab", 1, 1), ("k", "abc", 2, 2), ("k", "nan", 9, 3),
         ("k", None, 9, 4), ("k", "xyz", 2, 5),  # len-3 tie: ord wins
         ("j", "", 5, 6), ("j", "q", 0, 7)],
        "key string, v string, __ord long, id long",
    )
    via_sql = (
        df.groupBy("key")
        .agg(F.expr(NS.longest_valid_agg_sql("v", "`__ord`")))
        .collect()
    )
    valid = N.is_valid_value(F.col("v"))
    order = F.when(valid, F.struct(
        F.length(F.col("v").cast("string")).alias("l"),
        F.col("__ord").alias("o"),
    ))
    via_col = (
        df.groupBy("key")
        .agg(F.max_by(F.when(valid, F.col("v")), order).alias("v"))
        .collect()
    )
    assert {(r.key, r.v) for r in via_sql} == {(r.key, r.v) for r in via_col}
    assert {(r.key, r.v) for r in via_sql} == {("k", "xyz"), ("j", "q")}


def test_quoting_handles_hostile_names(spark):
    df = spark.createDataFrame([("nan",), ("ok",)], ["weird name"])
    out = df.selectExpr(
        f"{NS.nullify_sentinels_sql(NS.q('weird name'))} AS cleaned"
    ).collect()
    assert [r.cleaned for r in out] == [None, "ok"]
