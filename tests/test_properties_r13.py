"""Property-based tests for the round-13 operators: substring_spans /
substring_trim vs a direct Python model of the declared semantics
(k-gram postings over the df-capped gram universe, per-diagonal maximal
runs, keep-first trim coverage).

Same strategy as test_properties.py: small generated corpora over a
tiny token alphabet (to force shared grams), the Spark operator vs a
brute-force model.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny alphabet + short docs: shared k-grams (and within-doc repeats,
# exercising multi-position postings) are common rather than contrived
doc = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=24
).map(" ".join)
corpus = st.lists(doc, min_size=2, max_size=6)

K, MIN_LEN, MAX_DF = 3, 4, 3


def _model_spans(
    texts: list[str],
    k: int,
    min_len: int,
    max_df: int,
    occ_cap: int | None = None,
):
    """Brute-force restatement of the declared semantics: postings on
    the df-capped gram universe (first ``occ_cap`` positions per
    (doc, gram) when set) -> per (pair, diagonal) maximal runs."""
    toks = {i: t.strip().split(" ") for i, t in enumerate(texts)}
    posts: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for d, t in toks.items():
        seen: dict[tuple, int] = defaultdict(int)
        for i in range(len(t) - k + 1):
            g = tuple(t[i : i + k])
            seen[g] += 1
            if occ_cap is not None and seen[g] > occ_cap:
                continue
            posts[g].append((d, i + 1))
    kept = {
        g: ps
        for g, ps in posts.items()
        if 2 <= len({d for d, _ in ps}) <= max_df
    }
    matches = defaultdict(set)  # (a, b, diag) -> {ia}
    for ps in kept.values():
        for da, ia in ps:
            for db, ib in ps:
                if da < db:
                    matches[(da, db, ia - ib)].add(ia)
    spans = set()
    for (da, db, diag), ias in matches.items():
        run: list[int] = []
        for ia in sorted(ias) + [None]:
            if run and (ia is None or ia != run[-1] + 1):
                length = run[-1] - run[0] + k
                if length >= min_len:
                    spans.add((da, db, run[0], run[0] - diag, length))
                run = []
            if ia is not None:
                run.append(ia)
    return spans


def _model_trim(texts, k, min_len, max_df):
    spans = _model_spans(texts, k, min_len, max_df)
    out = {}
    for d, text in enumerate(texts):
        t = text.strip().split(" ")
        covered = set()
        for (_da, db, _a, b_start, length) in spans:
            if db == d:
                covered.update(range(b_start, b_start + length))
        kept = [tok for p, tok in enumerate(t, start=1) if p not in covered]
        out[d] = (len(t), len(covered), " ".join(kept))
    return out


@given(corpus)
@settings(**SETTINGS)
def test_substring_spans_matches_python_model(spark, texts):
    from bcg_contacts_data_pipeline_spark.operators.dedup import (
        substring_spans,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.len_tokens)
        for r in substring_spans(
            df, "doc_id", "text", k=K, min_len=MIN_LEN, max_df=MAX_DF
        ).collect()
    }
    assert got == _model_spans(texts, K, MIN_LEN, MAX_DF)


@given(corpus)
@settings(**SETTINGS)
def test_substring_trim_matches_python_model(spark, texts):
    from bcg_contacts_data_pipeline_spark.operators.dedup import (
        substring_trim,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.text_trimmed)
        for r in substring_trim(
            df, "doc_id", "text", k=K, min_len=MIN_LEN, max_df=MAX_DF
        ).collect()
    }
    assert got == _model_trim(texts, K, MIN_LEN, MAX_DF)


@given(corpus, st.sampled_from([1, 2, 99]))
@settings(**SETTINGS)
def test_substring_spans_occ_cap_matches_python_model(spark, texts, cap):
    """The capped twin's declared semantics (first ``occ_cap`` positions
    per (doc, gram), then the usual df-cap + diagonal runs) vs the
    brute-force model — cap=99 also pins that a non-binding cap is
    byte-identical to the exact operator on these corpora."""
    from bcg_contacts_data_pipeline_spark.operators.dedup import (
        substring_spans,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.len_tokens)
        for r in substring_spans(
            df, "doc_id", "text", k=K, min_len=MIN_LEN, max_df=MAX_DF,
            occ_cap=cap,
        ).collect()
    }
    assert got == _model_spans(texts, K, MIN_LEN, MAX_DF, occ_cap=cap)
    if cap == 99:
        assert got == _model_spans(texts, K, MIN_LEN, MAX_DF)
