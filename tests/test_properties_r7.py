"""Property-based tests for the round-7 operators: SCD2 history vs a
Python replay of the declared semantics, fuzzy blocked linkage vs an
unblocked brute force restricted to agreeing blocks, Morton keys vs a
direct bit-interleave model, and the image encode->parse round trip
over random dimensions.

Same strategy as test_properties.py: small generated inputs, the Spark
operator vs a direct Python model of the declared semantics.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# scd2_history == python replay: sort per key, drop unchanged, number,
# chain intervals
# ---------------------------------------------------------------------------

change = st.tuples(
    st.integers(min_value=0, max_value=2),  # entity
    st.integers(min_value=0, max_value=20),  # day offset
    st.sampled_from(["A", "B", None]),  # attribute (incl. NULL)
)


@given(st.lists(change, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_scd2_matches_python_replay(spark, changes):
    from datetime import datetime, timedelta

    from bcg_contacts_data_pipeline_spark.operators.cdc import scd2_history

    t0 = datetime(2024, 1, 1)
    rows = [
        (k, t0 + timedelta(days=d), seq, v)
        for seq, (k, d, v) in enumerate(changes)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, seq long, v string")
    got = {}
    for r in scd2_history(df, ["k"], "ts", ["v"], tiebreak="seq").collect():
        got.setdefault(r.k, []).append(r)
    for v in got.values():
        v.sort(key=lambda r: r.version)

    # python model
    want: dict[int, list] = {}
    by_key: dict[int, list] = {}
    for k, ts, seq, v in rows:
        by_key.setdefault(k, []).append((ts, seq, v))
    for k, evs in by_key.items():
        evs.sort()
        kept = []
        for ts, _seq, v in evs:
            if not kept or kept[-1][1] != v:
                kept.append((ts, v))
        want[k] = kept

    assert set(got) == set(want)
    for k in want:
        gk = got[k]
        assert [r.version for r in gk] == list(range(1, len(want[k]) + 1))
        assert [(r.effective_from, r.v) for r in gk] == want[k]
        for a, b in zip(gk, gk[1:]):
            assert a.effective_to == b.effective_from and not a.is_current
        assert gk[-1].is_current and gk[-1].effective_to is None


# ---------------------------------------------------------------------------
# fuzzy_pairs_blocked == brute force over pairs whose blocks agree
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


name = st.text(alphabet="abc", min_size=1, max_size=5)


@given(st.lists(name, min_size=2, max_size=12), st.integers(0, 2))
@settings(**SETTINGS)
def test_fuzzy_pairs_match_brute_force(spark, names, maxd):
    import pyspark.sql.functions as F

    from bcg_contacts_data_pipeline_spark.operators.similarity import (
        fuzzy_pairs_blocked,
    )

    rows = [(i, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    blocking = [F.length("name"), F.substring("name", 1, 1)]
    got = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_pairs_blocked(
            df, "id", "name", blocking, max_distance=maxd
        ).collect()
    }
    want = {
        (a, b): _lev(names[a], names[b])
        for a in range(len(names))
        for b in range(a + 1, len(names))
        if len(names[a]) == len(names[b])
        and names[a][:1] == names[b][:1]
        and _lev(names[a], names[b]) <= maxd
    }
    assert got == want


# ---------------------------------------------------------------------------
# zorder_key == python bit interleave
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=15,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_zorder_key_matches_python_interleave(spark, pts):
    from bcg_contacts_data_pipeline_spark.io.layout import zorder_key

    df = spark.createDataFrame(pts, "x long, y long, z long")
    got = {
        (r.x, r.y, r.z): r.k
        for r in df.select(
            "x", "y", "z", zorder_key(["x", "y", "z"], bits=8).alias("k")
        ).collect()
    }
    for x, y, z in pts:
        want = 0
        for b in range(8):
            want |= ((x >> b) & 1) << (3 * b)
            want |= ((y >> b) & 1) << (3 * b + 1)
            want |= ((z >> b) & 1) << (3 * b + 2)
        assert got[(x, y, z)] == want


# ---------------------------------------------------------------------------
# image encode -> parse round trip over random dimensions (driver-side)
# ---------------------------------------------------------------------------


@given(st.integers(1, 2000), st.integers(1, 2000), st.sampled_from([0, 1, 2]))
@settings(max_examples=40, deadline=None)
def test_image_roundtrip_random_dims(w, h, fmt_i):
    from bcg_contacts_data_pipeline_spark.operators import multimodal as M

    synth = [M.png_bytes, M.jpeg_bytes, M.webp_bytes][fmt_i]
    fmt = ["png", "jpeg", "webp"][fmt_i]
    assert M.parse_image_meta(synth(w, h)) == (w, h, fmt)


# ---------------------------------------------------------------------------
# HLL sketch mergeability: union of shard sketches == one whole-corpus
# sketch, bit-for-bit at the estimate level.
# ---------------------------------------------------------------------------


def test_hll_union_of_shards_equals_whole(spark):
    """The property the 100 TB rollup rests on: build one sketch per
    disjoint shard, union the BINARY sketches, and the estimate equals
    the single-pass whole-corpus sketch exactly (HLL register state is
    a deterministic function of the value set — merge is register-wise
    max, so shard boundaries can't change the result). Also pins that
    a value appearing in BOTH shards isn't double counted."""
    import pyspark.sql.functions as F

    rows = [(i % 4, f"user_{i % 350}") for i in range(2000)]
    df = spark.createDataFrame(rows, ["shard", "uid"])

    whole = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("est")
    ).collect()[0].est

    merged = (
        df.groupBy("shard")
        .agg(F.hll_sketch_agg("uid").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert merged == whole, (merged, whole)
    # sanity: estimate is near the true 350 (lgK=12 -> ~1.6% sigma)
    assert abs(merged - 350) / 350 < 0.05, merged


def test_jl_projection_concentration(spark):
    """The JL property the projection exists for: squared-norm ratios
    concentrate near 1 (E[ratio] = 1 for Rademacher projections).
    Bounds are loose 3-sigma-ish envelopes for k=16 (sigma ~ sqrt(2/k)
    ~ 0.35): the MEAN must sit tight, individual rows may wander."""
    import pyspark.sql.functions as F

    from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES

    df = QUERIES["embedding_project"](spark, "/root/testdata/sf0.001")
    # output is exploded (vec_id, pos, value, norm_ratio); norm_ratio is
    # per-vector, so dedup to one row per vec_id before the stats
    per_vec = df.select("vec_id", "norm_ratio").distinct()
    stats = per_vec.agg(
        F.avg("norm_ratio").alias("mean"),
        F.min("norm_ratio").alias("lo"),
        F.max("norm_ratio").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert 0.9 < stats.mean < 1.1, stats
    assert stats.lo > 0.1 and stats.hi < 4.0, stats
    assert stats.n == 500
    # every projected vector has the right width (16 exploded rows)
    widths = (
        df.groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .select("k")
        .distinct()
        .collect()
    )
    assert [r.k for r in widths] == [16]


def test_centroid_matches_naive_mean_within_quantization(spark):
    """The dyadic-quantized distributed centroid equals the naive
    numpy mean to within the 2^-40 quantization bound (plus float64
    summation noise, orders of magnitude below the assert)."""
    import numpy as np

    from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    # query output is exploded (label, n_vectors, pos, mean_val);
    # reassemble the centroid vectors by 0-based pos
    rows = QUERIES["embedding_centroids"](spark, sf).collect()
    got = {}
    for r in rows:
        vec, _ = got.setdefault(r.label, ({}, r.n_vectors))
        vec[r.pos] = r.mean_val
    got = {
        lab: (
            np.array([vec[p] for p in sorted(vec)]),
            n,
        )
        for lab, (vec, n) in got.items()
    }
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(r.embedding)
    assert set(got) == set(by_label)
    for lab, vecs in by_label.items():
        naive = np.mean(np.array(vecs, dtype=np.float64), axis=0)
        cent, n = got[lab]
        assert n == len(vecs)
        assert np.max(np.abs(cent - naive)) < 2.0**-38, lab


def test_value_histogram_degenerate_constant_column(spark, tmp_path):
    """An all-equal value column makes hi == lo and the equi-width
    bucket expression 0/0 -> NaN without the guard (floor(NaN) casts
    to NULL, or errors under ANSI mode). The CASE guard must pin every
    row to bucket 0 with lo == hi edges — the input a profiling query
    actually meets on constant columns."""
    import datetime as dt

    from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i), 1, "view", 42.5, "{}")
        for i in range(7)
    ] + [(99, dt.datetime(2024, 1, 1, 1, 0), 2, "view", None, "{}")]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = QUERIES["value_histogram"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.bucket, r.bucket_lo, r.bucket_hi, r.n) == (0, 42.5, 42.5, 7)
