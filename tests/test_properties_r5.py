"""Property-based tests for the round-5 operators: chunk coverage,
upsert merge semantics, quantile-bin structure, funnel ordering.

Same strategy as test_properties.py: small generated inputs, the Spark
operator vs a direct Python model of the declared semantics.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.operators.analytics import (
    funnel_stages,
    with_quantile_bin,
)
from bcg_contacts_data_pipeline_spark.operators.cdc import upsert_latest
from bcg_contacts_data_pipeline_spark.operators.chunking import chunk_documents

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# chunk_documents: every char covered, starts follow the stride grid,
# reconstruction works for disjoint chunks
# ---------------------------------------------------------------------------

doc_texts = st.text(alphabet="ab 中\n.", min_size=0, max_size=60)


@given(
    st.lists(doc_texts, min_size=1, max_size=4),
    st.integers(min_value=1, max_value=15),
    st.integers(min_value=1, max_value=15),
)
@settings(**SETTINGS)
def test_chunk_coverage_and_grid(spark, texts, size, stride):
    stride = min(stride, size)  # gaps would un-cover chars by design
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    out = chunk_documents(
        df, "doc_id", "text", size=size, stride=stride, keep_text=True
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(texts):
        rows = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        # starts follow the stride grid exactly
        assert [r["chunk_start"] for r in rows] == [
            1 + j * stride for j in range(len(rows))
        ]
        # every char covered at least once; text content round-trips
        covered = set()
        for r in rows:
            assert r["chunk_text"] == text[r["chunk_start"] - 1 : r["chunk_start"] - 1 + size]
            covered.update(range(r["chunk_start"] - 1, r["chunk_start"] - 1 + r["chunk_len"]))
        assert covered == set(range(len(text)))
        # at least one chunk even when empty
        assert len(rows) >= 1


# ---------------------------------------------------------------------------
# upsert_latest == dict-based latest-wins model
# ---------------------------------------------------------------------------

upd_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.text(alphabet="xyz", min_size=0, max_size=3),  # value
        st.booleans(),  # tombstone
    ),
    min_size=0,
    max_size=8,
)


@given(upd_rows)
@settings(**SETTINGS)
def test_upsert_matches_model(spark, updates):
    base = [(k, f"b{k}", 1, False) for k in range(4)]
    # per-key versions strictly increase in list order (CDC log property)
    seen: dict[int, int] = {}
    upd = []
    for k, v, dele in updates:
        seen[k] = seen.get(k, 1) + 1
        upd.append((k, v, seen[k], dele))
    schema = "k int, v string, version int, is_deleted boolean"
    out = upsert_latest(
        spark.createDataFrame(base, schema),
        spark.createDataFrame(upd, schema) if upd else spark.createDataFrame([], schema),
        ["k"],
        "version",
        "is_deleted",
    )
    got = {r["k"]: (r["v"], r["version"]) for r in out.collect()}
    model: dict[int, tuple] = {k: (f"b{k}", 1, False) for k in range(4)}
    for k, v, ver, dele in upd:
        cur = model.get(k)
        if cur is None or ver >= cur[1]:
            model[k] = (v, ver, dele)
    want = {k: (v, ver) for k, (v, ver, dele) in model.items() if not dele}
    assert got == want


# ---------------------------------------------------------------------------
# with_quantile_bin: monotone bins, sizes within 1 of each other, full range
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=7),
)
@settings(**SETTINGS)
def test_quantile_bin_structure(spark, n, k):
    df = spark.range(n).select(F.col("id").cast("int").alias("v"))
    out = with_quantile_bin(df, [F.col("v")], k=k, bin_name="b").collect()
    got = {r["v"]: r["b"] for r in out}
    bins = [got[v] for v in range(n)]
    assert bins == sorted(bins)  # monotone in rank
    assert all(1 <= b <= k for b in bins)
    from collections import Counter

    sizes = Counter(bins)
    if n >= k:
        assert set(sizes) == set(range(1, k + 1))  # every bin occupied
    assert max(sizes.values()) - min(sizes.values()) <= 1  # even spread
    # exact formula parity
    assert bins == [((v) * k) // n + 1 for v in range(n)]


# ---------------------------------------------------------------------------
# funnel_stages == sequential-scan model (strict-after semantics)
# ---------------------------------------------------------------------------

event_seqs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=50),  # minutes offset (ties likely)
        st.sampled_from(["view", "click", "purchase", "other"]),
    ),
    min_size=0,
    max_size=14,
)

STAGES = ["view", "click", "purchase"]


def _model_funnel(events):
    """Earliest stage-k event strictly after stage k-1's time."""
    out = {}
    for u in {e[0] for e in events}:
        evs = [(ts, et) for (uu, ts, et) in events if uu == u]
        times = []
        prev = None
        for i, stage in enumerate(STAGES):
            cands = [
                ts for ts, et in evs
                if et == stage and (i == 0 or (prev is not None and ts > prev))
            ]
            cur = min(cands) if cands and (i == 0 or prev is not None) else None
            times.append(cur)
            prev = cur
        out[u] = tuple(times)
    return out


@given(event_seqs)
@settings(**SETTINGS)
def test_funnel_matches_model(spark, raw):
    if not raw:
        return
    base = datetime(2024, 1, 1)
    rows = [(u, base + timedelta(minutes=m), et) for (u, m, et) in raw]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    got = {
        r["user_id"]: (r["stage_0_ts"], r["stage_1_ts"], r["stage_2_ts"])
        for r in funnel_stages(df, "user_id", "ts", "event_type", STAGES).collect()
    }
    assert got == _model_funnel(rows)
