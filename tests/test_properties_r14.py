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


# ---------------------------------------------------------------------------
# C4 family (round 14): c4_clean + c4_span_dedup vs direct Python models
# ---------------------------------------------------------------------------

from bcg_contacts_data_pipeline_spark.operators.dedup import (  # noqa: E402
    c4_span_dedup,
)
from bcg_contacts_data_pipeline_spark.operators.profile import (  # noqa: E402
    c4_clean,
)

# lines assembled from tokens that trip each C4 rule sometimes:
# terminal-punct enders, short lines, javascript, lorem ipsum, braces
C4_TOKENS = st.sampled_from(
    [
        "data", "rows", "move.", "done!", "why?", 'said"', "x",
        "javascript", "lorem", "ipsum", "{", "}", "a.b", "...",
    ]
)


@st.composite
def c4_doc(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    toks = [draw(C4_TOKENS) for _ in range(n)]
    seps = [draw(SEP) for _ in range(n - 1)]
    return "".join(t + s for t, s in zip(toks, seps + [""]))


def _c4_model(text: str) -> dict:
    """Brute-force restatement of the declared semantics. trim() on
    BOTH engines strips spaces only, so the model uses strip(' ')."""
    lines = text.split("\n")
    kl = [
        l
        for l in lines
        if re.search(r'[.!?"]\s*$', l)
        and len(re.split(r"\s+", l.strip(" "))) >= 3
        and "javascript" not in l.lower()
    ]
    tc = "\n".join(kl)
    n_sent = len(
        [s for s in re.split(r"[.!?]+", tc) if s.strip(" ") != ""]
    )
    lorem = "lorem ipsum" in text.lower()
    brace = "{" in text or "}" in text
    return dict(
        n_lines=len(lines),
        lines_kept=len(kl),
        n_sentences=n_sent,
        has_lorem=lorem,
        has_brace=brace,
        keep=(n_sent >= 5 and not lorem and not brace),
        text_clean=tc,
    )


@given(st.lists(c4_doc(), min_size=1, max_size=6))
@settings(**SETTINGS)
def test_c4_clean_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in c4_clean(df, "doc_id", "text").collect()
    }
    assert set(got) == set(range(len(texts)))
    for i, text in enumerate(texts):
        want = _c4_model(text)
        for k, v in want.items():
            assert got[i][k] == v, (k, text, got[i][k], v)


def test_c4_clean_rules_trip_individually(spark):
    """One crafted doc per rule against an otherwise-passing baseline;
    NULL text excluded entirely (the quality-family scope rule)."""
    good_line = "the data rows move on."
    page = "\n".join([good_line] * 6)  # 6 kept lines, 6 sentences
    rows = [
        (1, page),
        (2, "\n".join(["no terminal punct"] * 6)),  # punct rule
        (3, "\n".join(["so short."] * 6)),  # <3 words per line
        (4, "\n".join(["enable javascript to view."] * 6)),  # js line
        (5, page + "\nlorem ipsum dolor."),  # lorem page discard
        (6, page + "\nint main() {."),  # brace page discard
        (7, "\n".join([good_line] * 4)),  # only 4 sentences
        (8, 'she said "done he said"'),  # closing-quote terminal OK
        (9, None),  # excluded entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in c4_clean(df, "doc_id", "text").collect()
    }
    assert set(out) == set(range(1, 9))
    assert out[1]["keep"] and out[1]["lines_kept"] == 6
    assert out[2]["lines_kept"] == 0 and not out[2]["keep"]
    assert out[3]["lines_kept"] == 0 and not out[3]["keep"]
    assert out[4]["lines_kept"] == 0 and not out[4]["keep"]
    assert out[5]["has_lorem"] and not out[5]["keep"]
    assert out[6]["has_brace"] and not out[6]["keep"]
    assert out[7]["n_sentences"] == 4 and not out[7]["keep"]
    assert out[8]["lines_kept"] == 1  # ends in a closing double quote


def test_c4_clean_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(1, "the data rows move on.")], "doc_id long, text string"
    )
    plan = (
        c4_clean(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# sentences drawn from a tiny pool so duplicated 3-sentence spans are
# common rather than contrived (within-doc repeats included)
C4_SENT = st.sampled_from(["aa bb", "cc", "dd ee", "ff"])


@st.composite
def span_doc(draw):
    n = draw(st.integers(min_value=0, max_value=10))
    sents = [draw(C4_SENT) for _ in range(n)]
    punct = [draw(st.sampled_from([". ", "! ", "? "])) for _ in range(n)]
    return "".join(s + p for s, p in zip(sents, punct))


def _span_model(texts: list, span: int = 3) -> dict:
    """Brute-force restatement: global occurrence counts per sentence
    window, keep-first (doc, start), losers' positions removed."""
    sents = {
        d: [
            s
            for s in (
                x.strip(" ") for x in re.split(r"[.!?]+", t)
            )
            if s != ""
        ]
        for d, t in texts
        if t is not None
    }
    occ: dict = {}
    for d, s in sents.items():
        for i in range(len(s) - span + 1):
            occ.setdefault(tuple(s[i : i + span]), []).append((d, i + 1))
    covered: dict = {d: set() for d in sents}
    for places in occ.values():
        if len(places) >= 2:
            w = min(places)
            for d, start in places:
                if (d, start) != w:
                    covered[d].update(range(start, start + span))
    out = {}
    for d, s in sents.items():
        kept = [x for p, x in enumerate(s, 1) if p not in covered[d]]
        out[d] = dict(
            n_sentences=len(s),
            n_spans=max(len(s) - span + 1, 0),
            dup_sentences=len(s) - len(kept),
            text_dedup=". ".join(kept),
        )
    return out


@given(st.lists(span_doc(), min_size=2, max_size=6))
@settings(**SETTINGS)
def test_c4_span_dedup_matches_python_model(spark, texts):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in c4_span_dedup(df, "doc_id", "text").collect()
    }
    want = _span_model(rows)
    assert set(got) == set(want)
    for d, w in want.items():
        for k, v in w.items():
            assert got[d][k] == v, (k, d, texts, got[d][k], v)


def test_c4_span_dedup_crafted(spark):
    """Cross-doc dup (punctuation-variant spellings collapse), within-
    doc repeat, short-doc passthrough, NULL-text exclusion."""
    rows = [
        (1, "A1. B2. C3. D4."),
        (2, "X. A1. B2. C3."),  # loses A1 B2 C3 to doc 1
        (3, "A1! B2? C3."),  # same span via other punctuation
        (4, "P. Q. R. P. Q. R."),  # within-doc repeat of (P,Q,R)
        (5, "one. two."),  # < span sentences: passthrough
        (6, None),  # excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in c4_span_dedup(df, "doc_id", "text").collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["dup_sentences"] == 0
    assert out[1]["text_dedup"] == "A1. B2. C3. D4"
    assert out[2]["dup_sentences"] == 3 and out[2]["text_dedup"] == "X"
    assert out[3]["dup_sentences"] == 3 and out[3]["text_dedup"] == ""
    assert out[4]["dup_sentences"] == 3
    assert out[4]["text_dedup"] == "P. Q. R"
    assert out[5] == dict(
        doc_id=5,
        n_sentences=2,
        n_spans=0,
        dup_sentences=0,
        text_dedup="one. two",
    )


def test_c4_span_dedup_zero_sentence_doc(spark):
    """Pin the r14 single-pass rebuild's empty-range guard: a doc whose
    text yields ZERO sentences (punctuation/whitespace only) must pass
    through with empty text, not a descending sequence(1, 0) artifact."""
    rows = [
        (1, "!!! ?? ."),
        (2, "A1. B2. C3. D4."),
        (3, "X. A1. B2. C3."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in c4_span_dedup(df, "doc_id", "text").collect()
    }
    assert out[1] == dict(
        doc_id=1, n_sentences=0, n_spans=0, dup_sentences=0, text_dedup=""
    )
    assert out[3]["dup_sentences"] == 3 and out[3]["text_dedup"] == "X"


# ---------------------------------------------------------------------------
# gopher_dup_lines (round 14): duplicate-line fraction rungs vs model
# ---------------------------------------------------------------------------

from bcg_contacts_data_pipeline_spark.operators.profile import (  # noqa: E402
    gopher_dup_lines,
)

# short lines from a tiny pool so within-doc duplicates are common
DL_LINE = st.sampled_from(["aa", "bb cc", "dd", "", "  ", "ee ff gg"])


@st.composite
def dl_doc(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    return "\n".join(draw(DL_LINE) for _ in range(n))


def _dl_model(text: str) -> dict:
    lines = [
        l for l in (x.strip(" ") for x in text.split("\n")) if l != ""
    ]
    n, k = len(lines), len(set(lines))
    tc = sum(len(l) for l in lines)
    dc = sum(len(l) for l in set(lines))
    lf = (n - k) / n if n > 0 else 0.0
    cf = (tc - dc) / tc if tc > 0 else 0.0
    return dict(
        n_lines=n,
        n_distinct_lines=k,
        dup_line_frac=lf,
        dup_char_frac=cf,
        keep=(lf <= 0.30 and cf <= 0.20),
    )


@given(st.lists(dl_doc(), min_size=1, max_size=6))
@settings(**SETTINGS)
def test_gopher_dup_lines_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_dup_lines(df, "doc_id", "text").collect()
    }
    assert set(got) == set(range(len(texts)))
    for i, text in enumerate(texts):
        for key, v in _dl_model(text).items():
            assert got[i][key] == v, (key, text, got[i][key], v)


def test_gopher_dup_lines_crafted(spark):
    rows = [
        (1, "x y\nx y\nx y\nz"),  # 2/4 dup lines, heavy char mass
        (2, "p\nq\nr"),  # all distinct: keep
        (3, ""),  # no lines: 0.0/0.0, keep
        (4, "solo\n\n  \nsolo"),  # blanks excluded, 1 dup of 2
        (5, None),  # excluded entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_dup_lines(df, "doc_id", "text").collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_lines"] == 4 and out[1]["n_distinct_lines"] == 2
    assert out[1]["dup_line_frac"] == 0.5 and not out[1]["keep"]
    assert out[2]["keep"] and out[2]["dup_line_frac"] == 0.0
    assert out[3] == dict(
        doc_id=3,
        n_lines=0,
        n_distinct_lines=0,
        dup_line_frac=0.0,
        dup_char_frac=0.0,
        keep=True,
    )
    assert out[4]["n_lines"] == 2 and out[4]["dup_line_frac"] == 0.5
    # paragraph twin: same arithmetic over a '\n\n' regex split
    para = gopher_dup_lines(
        spark.createDataFrame(
            [(1, "aa\n\naa\n\nbb")], "doc_id long, text string"
        ),
        "doc_id",
        "text",
        delimiter="\n\n",
    ).collect()[0]
    assert para["n_lines"] == 3 and para["n_distinct_lines"] == 2


def test_gopher_dup_lines_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(1, "x\nx\ny")], "doc_id long, text string"
    )
    plan = (
        gopher_dup_lines(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_c4_clean_bad_words_page_discard(spark):
    """The parametrized bad-words hook (empty by default): a page
    containing any listed word (case-insensitive whole-token match)
    flips keep; the metrics columns are unaffected."""
    good_line = "the data rows move on."
    page = "\n".join([good_line] * 6)
    df = spark.createDataFrame(
        [(1, page), (2, page + "\nBADWORD data rows go.")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in c4_clean(
            df, "doc_id", "text", bad_words=("badword",)
        ).collect()
    }
    assert out[1]["keep"]
    assert not out[2]["keep"]  # token matched case-insensitively
    # same doc without the hook: keep stands
    out2 = {
        r["doc_id"]: r["keep"]
        for r in c4_clean(df, "doc_id", "text").collect()
    }
    assert out2[2]
