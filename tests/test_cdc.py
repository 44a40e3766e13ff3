"""operators/cdc.py — latest-wins upsert and snapshot diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.operators.cdc import (
    snapshot_diff,
    upsert_latest,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 1, False), (3, "c", 1, False)],
        "k int, v string, version int, is_deleted boolean",
    )


def test_upsert_update_insert_tombstone(spark):
    upd = spark.createDataFrame(
        [(2, "b2", 2, False), (3, None, 2, True), (4, "d", 2, False)],
        "k int, v string, version int, is_deleted boolean",
    )
    out = upsert_latest(_base(spark), upd, ["k"], "version", "is_deleted")
    rows = {r["k"]: (r["v"], r["version"]) for r in out.collect()}
    # 1 untouched, 2 updated, 3 tombstoned away, 4 inserted.
    assert rows == {1: ("a", 1), 2: ("b2", 2), 4: ("d", 2)}


def test_upsert_without_delete_col_keeps_tombstone_rows(spark):
    upd = spark.createDataFrame(
        [(3, "c2", 2, True)], "k int, v string, version int, is_deleted boolean"
    )
    out = upsert_latest(_base(spark), upd, ["k"], "version")
    assert out.count() == 3  # no tombstone semantics without delete_col


def test_upsert_schema_mismatch_raises(spark):
    bad = spark.createDataFrame([(1, "x")], "k int, other string")
    with pytest.raises(ValueError):
        upsert_latest(_base(spark), bad, ["k"], "version")


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "k int, p double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (3, None), (5, 50.0)], "k int, p double"
    )
    out = snapshot_diff(old, new, ["k"], ["p"])
    got = {r["k"]: r["status"] for r in out.collect()}
    # 3 is unchanged because the compare is null-safe (null <=> null).
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "removed",
        5: "added",
    }
    chg = out.filter(F.col("k") == 2).first()
    assert chg["old_p"] == 20.0 and chg["new_p"] == 25.0


def test_snapshot_diff_shared_lineage(spark):
    """Both snapshots derived from the SAME frame (the common case: two
    versions of one table) must not hit ambiguous-column resolution."""
    base = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("p"))
    new = base.filter(F.col("k") % 3 != 0)
    out = snapshot_diff(base, new, ["k"], ["p"])
    counts = {r["status"]: r["n"] for r in out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert counts == {"removed": 4, "unchanged": 6}


def test_snapshot_diff_null_key_rows(spark):
    """A NULL business key matches across snapshots (the join is
    null-safe), so presence must come from side markers, not key
    null-ness: an identical null-key row is 'unchanged', never 'added'."""
    old = spark.createDataFrame([(None, 10.0), (1, 1.0)], "k int, p double")
    new = spark.createDataFrame([(None, 10.0), (1, 2.0)], "k int, p double")
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"], ["p"]).collect()}
    assert got == {None: "unchanged", 1: "changed"}
    # null-key row present only in old -> removed (not 'added')
    got2 = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new.filter(F.col("k").isNotNull()), ["k"], ["p"]).collect()
    }
    assert got2 == {None: "removed", 1: "changed"}


def test_upsert_latest_null_version_fails_loudly(spark):
    """A NULL version must fail the job, not emit a silent all-NULL row:
    without the guard, a key whose rows are all NULL-versioned makes
    max_by return a NULL struct that survives the tombstone filter
    (round-5 advisor flag)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    base = spark.createDataFrame(
        [(1, "a", 1)], "k int, v string, ver int"
    )
    bad = spark.createDataFrame(
        [(2, "b", None)], "k int, v string, ver int"
    )
    with pytest.raises(SparkRuntimeException, match="NULL ver"):
        upsert_latest(base, bad, ["k"], "ver").collect()


def test_scd2_history_collapses_and_intervals(spark):
    """SCD2 semantics on a handcrafted log: heartbeats restating the
    same value produce NO new version; intervals chain exactly
    (effective_to = next effective_from); the open version is
    is_current; a NULL attribute on the first event is kept."""
    from bcg_contacts_data_pipeline_spark.operators.cdc import scd2_history

    rows = [
        # entity 1: A -> A (heartbeat, collapsed) -> B -> B -> A
        (1, "2024-01-01 00:00:00", 1, "A"),
        (1, "2024-01-02 00:00:00", 2, "A"),
        (1, "2024-01-03 00:00:00", 3, "B"),
        (1, "2024-01-04 00:00:00", 4, "B"),
        (1, "2024-01-05 00:00:00", 5, "A"),
        # entity 2: starts NULL (must be kept), then X
        (2, "2024-01-01 00:00:00", 6, None),
        (2, "2024-01-02 00:00:00", 7, "X"),
        # entity 3: same-ts tie broken by seq
        (3, "2024-01-01 00:00:00", 9, "Q"),
        (3, "2024-01-01 00:00:00", 8, "P"),
    ]
    df = spark.createDataFrame(
        rows, "k int, ts_s string, seq int, status string"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "seq", "status")

    out = scd2_history(
        df, ["k"], "ts", ["status"], tiebreak="seq"
    ).collect()
    hist = {}
    for r in out:
        hist.setdefault(r.k, []).append(r)
    for v in hist.values():
        v.sort(key=lambda r: r.version)

    assert [r.status for r in hist[1]] == ["A", "B", "A"]
    assert [r.version for r in hist[1]] == [1, 2, 3]
    # intervals chain: effective_to == next effective_from
    for a, b in zip(hist[1], hist[1][1:]):
        assert a.effective_to == b.effective_from
    assert hist[1][-1].is_current and hist[1][-1].effective_to is None
    assert not hist[1][0].is_current

    assert [r.status for r in hist[2]] == [None, "X"]
    # same-ts tie: seq 8 ("P") precedes seq 9 ("Q")
    assert [r.status for r in hist[3]] == ["P", "Q"]


def test_scd2_no_collapse_keeps_heartbeats(spark):
    from bcg_contacts_data_pipeline_spark.operators.cdc import scd2_history

    df = spark.createDataFrame(
        [(1, "2024-01-01", "A"), (1, "2024-01-02", "A")],
        "k int, ts_s string, status string",
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "status")
    assert scd2_history(df, ["k"], "ts", ["status"]).count() == 1
    assert (
        scd2_history(
            df, ["k"], "ts", ["status"], collapse_unchanged=False
        ).count()
        == 2
    )
