"""Property-based test for the round-14 gopher_quality operator vs a
direct Python model of the declared semantics (every metric and the
composed keep decision), plus crafted per-rule cases.

Same strategy as test_properties_r13.py: small generated documents over
a mixed alphabet (prose words, stop words, symbols, bullets, newlines)
so every rule trips sometimes, the Spark operator vs brute force.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bcg_contacts_data_pipeline_spark.operators.profile import (
    GOPHER_STOP_WORDS,
    gopher_quality,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tokens chosen so each rule trips sometimes: stop words, short/long
# words, symbol tokens, bullet starters, ellipsis enders, digits
TOKENS = st.sampled_from(
    [
        "the", "to", "of", "and", "data", "query", "x1", "42",
        "#", "##", "...", "-", "*", "•item", "done...",
        "zzzzzzzzzzzzzzzz", "a",
    ]
)
SEP = st.sampled_from([" ", " ", " ", "\n"])  # mostly spaces, some lines


@st.composite
def doc(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    toks = [draw(TOKENS) for _ in range(n)]
    seps = [draw(SEP) for _ in range(n - 1)]
    return "".join(
        t + s for t, s in zip(toks, seps + [""])
    )


def _model(text: str) -> dict:
    """Brute-force restatement of the declared semantics — word = \\s+
    token of the space-trimmed text, line = newline segment."""
    t = re.split(r"\s+", text.strip(" "))
    lines = text.split("\n")
    n = len(t)
    mean_wl = (sum(len(w) for w in t) / n) if n > 0 else 0.0
    symbols = text.count("#") + len(re.findall(r"\.\.\.", text))
    sym_ratio = (symbols / n) if n > 0 else 0.0
    bullet = sum(
        1 for l in lines if re.match(r"^\s*[-*•]", l)
    ) / len(lines)
    ell = sum(
        1 for l in lines if re.search(r"(\.\.\.|…)\s*$", l)
    ) / len(lines)
    alpha = (
        sum(1 for w in t if re.search(r"[A-Za-z]", w)) / n if n > 0 else 0.0
    )
    stops = len({w.lower() for w in t} & set(GOPHER_STOP_WORDS))
    keep = (
        (50 <= n <= 100_000)
        and (3.0 <= mean_wl <= 10.0)
        and sym_ratio <= 0.10
        and bullet < 0.90
        and ell < 0.30
        and alpha >= 0.80
        and stops >= 2
    )
    return dict(
        n_tokens=n,
        mean_word_len=mean_wl,
        symbol_ratio=sym_ratio,
        bullet_frac=bullet,
        ellipsis_frac=ell,
        alpha_frac=alpha,
        n_stop_hits=stops,
        keep=keep,
    )


@given(st.lists(doc(), min_size=1, max_size=6))
@settings(**SETTINGS)
def test_gopher_quality_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality(df, "doc_id", "text").collect()
    }
    assert set(got) == set(range(len(texts)))
    for i, text in enumerate(texts):
        want = _model(text)
        g = got[i]
        for k, v in want.items():
            assert g[k] == v, (k, text, g[k], v)


def test_gopher_quality_rules_trip_individually(spark):
    """One crafted doc per rule, each failing exactly that rule against
    an otherwise-passing prose baseline."""
    prose = " ".join(
        ["the", "data", "and", "rows", "move"] * 12
    )  # 60 words, mean len 3.6, stops {the, and}
    rows = [
        (1, prose),
        (2, "the and data"),  # word count < 50
        (3, " ".join(["the", "and"] + ["a"] * 58)),  # mean word len < 3
        (4, prose + " " + " ".join(["#"] * 10)),  # symbol ratio > 0.1
        (5, "\n".join(["- " + prose] * 10)),  # 100% bullet lines
        (6, "\n".join([prose + " done..."] * 10)),  # 100% ellipsis lines
        (7, " ".join(["the", "and"] + ["123"] * 58)),  # alpha frac < 0.8
        (8, " ".join(["data", "rows", "move"] * 20)),  # 0 stop words
        (9, None),  # excluded entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in gopher_quality(df, "doc_id", "text").collect()
    }
    assert set(out) == set(range(1, 9))
    assert out[1]["keep"]
    assert not out[2]["keep"] and out[2]["n_tokens"] == 3
    assert not out[3]["keep"] and out[3]["mean_word_len"] < 3.0
    assert not out[4]["keep"] and out[4]["symbol_ratio"] > 0.10
    assert not out[5]["keep"] and out[5]["bullet_frac"] == 1.0
    assert not out[6]["keep"] and out[6]["ellipsis_frac"] == 1.0
    assert not out[7]["keep"] and out[7]["alpha_frac"] < 0.80
    assert not out[8]["keep"] and out[8]["n_stop_hits"] == 0


def test_gopher_quality_plan_is_shuffle_free(spark):
    """The operator's scale contract: a pure projection — zero exchanges
    in the optimized plan, so it pipelines on top of the scan."""
    df = spark.createDataFrame(
        [(1, "the data and the rows")], "doc_id long, text string"
    )
    plan = gopher_quality(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
