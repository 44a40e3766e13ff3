"""Property-based tests for the round-6 operators: blocked embedding
pair generation vs a direct brute-force model, and gap-fill density /
forward-fill semantics vs a Python replay.

Same strategy as test_properties.py: small generated inputs, the Spark
operator vs a direct Python model of the declared semantics.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bcg_contacts_data_pipeline_spark.operators.similarity import (
    embedding_pairs,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# embedding_pairs: the blocked upper-triangle cogroup must produce
# exactly the brute-force pair set for any vectors, any block count —
# including duplicate-row absorption and ids hashing into few blocks
# ---------------------------------------------------------------------------

vec = st.lists(
    st.floats(
        min_value=-2.0, max_value=2.0, allow_nan=False, allow_infinity=False
    ),
    min_size=3,
    max_size=3,
)


@given(
    st.lists(vec, min_size=2, max_size=12, unique_by=tuple),
    st.sampled_from([0.3, 0.7, 0.95]),
    st.integers(min_value=1, max_value=5),
)
@settings(**SETTINGS)
def test_embedding_pairs_matches_brute_force(spark, vecs, threshold, blocks):
    # a zero vector has no cosine; keep vectors away from the origin
    vecs = [v for v in vecs if math.sqrt(sum(x * x for x in v)) > 1e-6]
    if len(vecs) < 2:
        return
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_pairs(
            df, "vec_id", "embedding", threshold, corpus_blocks=blocks
        ).collect()
    }

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y  # same sequential fold as _seq_scores
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    want = {
        (a, b)
        for a in range(len(vecs))
        for b in range(a + 1, len(vecs))
        if cos(vecs[a], vecs[b]) >= threshold
    }
    assert got == want


# ---------------------------------------------------------------------------
# gapfill_forward_fill: dense axis exactly spans each key's range, and
# v_filled replays as "last observed per-unit sum" in a Python model
# ---------------------------------------------------------------------------

event = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=72),  # hour offset
    st.integers(min_value=-1000, max_value=1000),  # value in cents
)


@given(st.lists(event, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_gapfill_matches_python_replay(spark, events):
    from datetime import datetime, timedelta

    from bcg_contacts_data_pipeline_spark.operators.temporal import (
        gapfill_forward_fill,
    )

    base = datetime(2024, 3, 1)
    rows = [
        (k, base + timedelta(hours=h, minutes=(v % 50) + 1), v / 100.0)
        for k, h, v in events
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, value double"
    )
    got = {
        (r.user_id, r.hour): (r.n_events, r.v_filled, r.is_gap)
        for r in gapfill_forward_fill(
            df, "user_id", "ts", "value", unit="hour"
        ).collect()
    }

    # python replay: per-key hourly sums, dense axis, forward fill
    from collections import defaultdict

    sums: dict = defaultdict(lambda: defaultdict(float))
    counts: dict = defaultdict(lambda: defaultdict(int))
    for k, ts, v in rows:
        h = ts.replace(minute=0, second=0, microsecond=0)
        sums[k][h] += v
        counts[k][h] += 1
    want = {}
    for k in sums:
        hs = sorted(sums[k])
        cur = hs[0]
        last = None
        while cur <= hs[-1]:
            if cur in sums[k]:
                last = round(sums[k][cur], 6)  # decimal(18,6) agg
                want[(k, cur)] = (counts[k][cur], last, False)
            else:
                want[(k, cur)] = (0, last, True)
            cur += timedelta(hours=1)
    assert set(got) == set(want)
    for key in want:
        wn, wv, wg = want[key]
        gn, gv, gg = got[key]
        assert (gn, gg) == (wn, wg), (key, got[key], want[key])
        assert gv == pytest.approx(wv, abs=1e-9), (key, gv, wv)

