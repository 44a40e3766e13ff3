"""Property-based test for the round-7c prefix-filter similarity join:
random tiny corpora vs a brute-force O(n²) Jaccard model. The testdata
oracle proves losslessness on one corpus; this proves it on adversarial
ones — heavy shingle skew (tiny vocab), duplicate docs, docs shorter
than the shingle width, and thresholds other than 1/2.

Same strategy as test_properties.py: small generated inputs, the Spark
operator vs a direct Python model of the declared semantics.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny vocabulary ON PURPOSE: few distinct tokens -> few distinct
# shingles shared by many docs -> maximal posting-list skew, the regime
# where a broken prefix rule would actually drop pairs.
doc = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
    min_size=0,
    max_size=12,
)
corpus = st.lists(doc, min_size=2, max_size=10)
thresh = st.sampled_from([(1, 2), (1, 4), (3, 4)])


def brute_pairs(docs, n, t_num, t_den):
    """O(n²) model over distinct lowercase n-gram shingles."""
    sets = {}
    for i, words in enumerate(docs):
        ws = [w.lower() for w in words]
        if len(ws) >= n:
            sets[i] = {tuple(ws[j : j + n]) for j in range(len(ws) - n + 1)}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            shared = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - shared
            if union and shared * t_den >= t_num * union:
                out[(a, b)] = (shared, len(sets[a]), len(sets[b]))
    return out


@given(docs=corpus, t=thresh)
@settings(**SETTINGS)
def test_prefix_filter_matches_bruteforce(spark, docs, t):
    from bcg_contacts_data_pipeline_spark.operators.similarity import (
        prefix_filter_pairs,
    )

    t_num, t_den = t
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): (r.shared, r.size_a, r.size_b)
        for r in prefix_filter_pairs(
            df, "doc_id", "text", n=3, t_num=t_num, t_den=t_den
        ).collect()
    }
    assert got == brute_pairs(docs, 3, t_num, t_den)
