"""Streaming operators vs their batch twins on a finite source (sf0.001).

Each streaming op run under Trigger.AvailableNow must equal the batch
computation of the same semantics — that equivalence is what makes the
driver's DuckDB oracles valid for the stream_* queries.
"""

import pyspark.sql.functions as F
import pytest

from bcg_contacts_data_pipeline_spark import streaming as S
from bcg_contacts_data_pipeline_spark.io.events import read_events

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return read_events(spark, SF)


def test_windowed_agg_equals_batch(spark, events):
    st = S.events_stream(spark, SF)
    out = S.run_available_now(
        S.windowed_agg(
            st, "ts", "1 hour", ["event_type"],
            [F.count(F.lit(1)).alias("n")], watermark="1 hour",
        ),
        "complete",
    )
    batch = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.window_start, r.event_type): r.n for r in out.collect()}
    want = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    assert got == want


def test_session_agg_equals_batch_sessionize(spark, events):
    from bcg_contacts_data_pipeline_spark.operators.temporal import sessionize

    st = S.events_stream(spark, SF)
    out = S.run_available_now(
        S.session_agg(
            st, ["user_id"], "ts", "30 minutes",
            [F.count(F.lit(1)).alias("n")], watermark="1 hour",
        ),
        "complete",
    )
    batch = (
        sessionize(events, "user_id", "ts", 1_800_000_000, "event_id")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n"))
    )
    got = {(r.user_id, r.session_start): r.n for r in out.collect()}
    want = {(r.user_id, r.session_start): r.n for r in batch.collect()}
    assert got == want


def test_dedup_within_watermark_is_distinct(spark, events):
    st = S.events_stream(spark, SF)
    out = S.run_available_now(
        S.dedup_within_watermark(
            st, ["user_id", "event_type"], "ts", "2 hours"
        ).select("user_id", "event_type"),
        "append",
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, events.select("user_id", "event_type").distinct().collect())
    )


def test_running_user_stats(spark, events):
    st = S.events_stream(spark, SF)
    out = S.run_available_now(
        S.running_user_stats(st.select("user_id", "value")), "update"
    )
    want = {
        r.user_id: (r.n, r.mx)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    got = {r.user_id: (r.n_events, r.max_value) for r in out.collect()}
    assert got.keys() == want.keys()
    for k, (n, mx) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(mx)


def test_stage_as_dir_idempotent(tmp_path):
    f = tmp_path / "x.parquet"
    f.write_bytes(b"")
    d1 = S.stage_as_dir(str(f))
    d2 = S.stage_as_dir(str(f))
    assert d1 == d2
    import os

    assert os.path.islink(os.path.join(d1, "x.parquet"))


def test_file_sink_exactly_once(spark, tmp_path, events):
    """Durable parquet sink + checkpoint: a second AvailableNow run over
    the same source must be a no-op (offsets committed), not a double
    write."""
    st = S.events_stream(spark, SF)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dd = S.dedup_within_watermark(
        st, ["user_id", "event_type"], "ts", "2 hours"
    ).select("user_id", "event_type")
    S.run_to_files(dd, out, ckpt)
    n1 = spark.read.parquet(out).count()
    S.run_to_files(dd, out, ckpt)  # same checkpoint -> nothing new
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == events.select("user_id", "event_type").distinct().count()


def test_stream_stream_join_matches_batch_range_join(spark, events):
    """Finite drain of the watermarked stream-stream join == the batch
    range join with the same predicate."""
    views = S.events_stream(spark, SF).filter(
        F.col("event_type") == "view"
    ).select(F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts"))
    clicks = S.events_stream(spark, SF).filter(
        F.col("event_type") == "click"
    ).select(F.col("event_id").alias("cid"), F.col("user_id").alias("cuid"), F.col("ts").alias("cts"))
    st = S.stream_stream_time_join(
        views, clicks, "user_id", "cuid", "vts", "cts", "6 HOURS", "1 hour"
    ).select("vid", "cid")
    got = {
        (r["vid"], r["cid"])
        for r in S.run_available_now(st, "append", shuffle_partitions=4).collect()
    }
    v = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts")
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cuid"), F.col("ts").alias("cts")
    )
    want = {
        (r["vid"], r["cid"])
        for r in v.join(
            c,
            (v["user_id"] == c["cuid"])
            & (c["cts"] > v["vts"])
            & (c["cts"] <= v["vts"] + F.expr("INTERVAL 6 HOURS")),
        ).select("vid", "cid").collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_join_rejects_same_key_name(spark):
    st = S.events_stream(spark, SF)
    with pytest.raises(ValueError):
        S.stream_stream_time_join(st, st, "user_id", "user_id", "ts", "ts", "1 HOUR", "1 hour")


def test_tws_runtime_gate(spark):
    """transformWithState twin: runs with full batch parity when the
    protobuf runtime exists; without it, fails fast with a clear error
    instead of crashing the streaming worker mid-query."""
    from bcg_contacts_data_pipeline_spark.streaming.ops import (
        _have_tws_runtime,
        running_user_stats_tws,
    )

    st = S.events_stream(spark, SF).select("user_id", "value")
    if not _have_tws_runtime(spark):
        with pytest.raises(ImportError, match="protobuf"):
            running_user_stats_tws(st)
        return
    out = S.run_available_now(
        running_user_stats_tws(st), "update", shuffle_partitions=4
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {
        r["user_id"]: (r["n"], r["mx"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.max(F.col("value").cast("double")).alias("mx"),
        )
        .collect()
    }
    got = {
        r["user_id"]: (r["n_events"], r["max_value"]) for r in out.collect()
    }
    assert got == want


def test_rocksdb_state_store_provider(spark, events):
    """The 100 TB streaming config (RocksDB state store) must actually
    run: the same watermarked windowed aggregation produces identical
    results under the RocksDB provider as under the default HDFS-backed
    one. Scoped conf, restored after."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )

    def run():
        st = S.events_stream(spark, SF)
        agg = S.windowed_agg(
            st, "ts", "1 hour", ["event_type"],
            [F.count(F.lit(1)).alias("n_events")],
            watermark="1 hour",
        )
        res = S.run_available_now(agg, "complete", shuffle_partitions=4)
        return {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in res.collect()
        }

    base = run()
    spark.conf.set(key, rocks)
    try:
        with_rocks = run()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert with_rocks == base and len(base) > 0


def test_update_mode_multi_batch_incremental_emission(spark, tmp_path):
    """`update` output mode — the mode a live dashboard sink actually
    uses with stateful aggs (round-5 verdict item 7): each micro-batch
    emits only the keys whose aggregate CHANGED, so the sink accumulates
    a history of per-key revisions rather than append's one-shot rows or
    complete's full-table snapshots.

    Three source files drained one per trigger (maxFilesPerTrigger=1)
    give three micro-batches. Deterministic final-state check: counts
    are monotone, so each key's LAST revision is its max — must equal
    the batch groundtruth; and the 'hot' key present in every file must
    have emitted one revision per batch (3 rows), proving the emission
    really was incremental, while a key present in one file emits one."""
    rows = {
        "f1": [("hot", 1), ("only1", 1)],
        "f2": [("hot", 2), ("both23", 1)],
        "f3": [("hot", 3), ("both23", 2)],
    }
    src = tmp_path / "src"
    src.mkdir()
    for fname, data in rows.items():
        spark.createDataFrame(data, "k string, v int").coalesce(
            1
        ).write.parquet(str(src / fname))
    # flatten the per-file subdirs into one dir of parquet files
    import glob as globmod
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, p in enumerate(sorted(globmod.glob(str(src / "*" / "*.parquet")))):
        shutil.copy(p, flat / f"{i}.parquet")

    stream = (
        spark.readStream.schema("k string, v int")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(flat))
    )
    agg = stream.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    )
    out = S.run_available_now(agg, "update", shuffle_partitions=4)
    revs = out.collect()

    # final state: last (= max, counts are monotone) revision per key
    final = {}
    for r in revs:
        cur = final.get(r["k"])
        if cur is None or r["n"] > cur[0]:
            final[r["k"]] = (r["n"], r["total"])
    assert final == {
        "hot": (3, 6),
        "only1": (1, 1),
        "both23": (2, 3),
    }
    # incremental emission: one revision per batch the key appeared in
    per_key = {}
    for r in revs:
        per_key[r["k"]] = per_key.get(r["k"], 0) + 1
    assert per_key == {"hot": 3, "only1": 1, "both23": 2}


def test_foreach_batch_idempotent_sink(spark, tmp_path, events):
    """foreachBatch exactly-once recipe: (1) a normal drain lands every
    row exactly once across batch_id partitions; (2) a REDELIVERED
    batch (foreachBatch is at-least-once — simulated by re-invoking the
    writer with an already-used batch_id) replaces its own directory
    instead of appending duplicates; (3) a second drain on the same
    checkpoint is a no-op (commit log)."""
    st = S.events_stream(spark, SF)
    out = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")
    proj = st.select("event_id", "user_id", "event_type")
    writer = S.idempotent_batch_writer(out)

    S.run_foreach_batch(proj, writer, ckpt, output_mode="append")
    back = spark.read.option("basePath", out).parquet(out)
    n_events = events.count()
    assert back.count() == n_events
    assert back.select("event_id").distinct().count() == n_events
    batch_ids = [r.batch_id for r in back.select("batch_id").distinct().collect()]
    assert batch_ids

    # simulate at-least-once redelivery of an existing batch id
    # (materialized first — a lazy self-read would race its own overwrite)
    src = spark.read.parquet(f"{out}/batch_id={batch_ids[0]}")
    redelivered = spark.createDataFrame(src.collect(), src.schema)
    writer(redelivered, batch_ids[0])
    again = spark.read.option("basePath", out).parquet(out)
    assert again.count() == n_events, "redelivered batch duplicated rows"

    # same checkpoint -> offsets committed -> nothing new
    S.run_foreach_batch(proj, writer, ckpt, output_mode="append")
    assert spark.read.option("basePath", out).parquet(out).count() == n_events


def test_stream_stream_join_how_guard(spark):
    """Unknown join types fail loudly at plan-build time, not as an
    obscure Catalyst error mid-stream."""
    import pytest as _pytest

    from bcg_contacts_data_pipeline_spark import streaming as S

    st = S.events_stream(spark, "/root/testdata/sf0.001")
    left = st.select(F.col("event_id").alias("l_id"),
                     F.col("user_id").alias("l_u"), F.col("ts").alias("l_ts"))
    right = st.select(F.col("event_id").alias("r_id"),
                      F.col("user_id").alias("r_u"), F.col("ts").alias("r_ts"))
    with _pytest.raises(ValueError, match="how must be one of"):
        S.stream_stream_time_join(
            left, right, left_key="l_u", right_key="r_u",
            left_ts="l_ts", right_ts="r_ts",
            within="1 HOUR", watermark="1 hour", how="fullOuter",
        )


def test_session_close_timer_fires_and_holds(spark, tmp_path):
    """Pins the EventTimeTimeout lifecycle directly: user 100's lone
    session ends long before the watermark, so ONLY the timer can emit
    it (no later event closes it); user 200's session ends at the
    stream head, inside the watermark horizon, so it must stay in
    state and NOT emit. Also pins intra-batch close: user 100's first
    session is closed by its own later event."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    rows = [
        # user 100: session 1 (2 events), gap > 30min, session 2 (1 event)
        (100, t(0)), (100, t(10)), (100, t(60)),
        # user 200: lone event at the head of the stream
        (200, t(600)),
    ]
    src = tmp_path / "events.parquet"
    spark.createDataFrame(rows, ["user_id", "ts"]).coalesce(1).write.parquet(
        str(src)
    )
    schema = spark.read.parquet(str(src)).schema
    stream = S.file_stream(spark, str(src), schema)
    out = S.run_available_now(
        S.session_close_stream(
            stream, "ts", gap="30 minutes", watermark="30 minutes"
        ),
        "append",
        shuffle_partitions=4,
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out.collect()
    }
    # intra-batch close: session 1 of user 100
    assert (100, t(0), t(10), 2) in got
    # timer close: session 2 of user 100 (end 0:60 + 30min gap = 1:30
    # < watermark 9:30) — only hasTimedOut can have emitted this
    assert (100, t(60), t(60), 1) in got
    # user 200's session (end 10:00 + gap = 10:30 >= watermark 9:30)
    # must still be open in state
    assert not any(u == 200 for u, *_ in got)
    assert len(got) == 2


def test_windowed_agg_recovers_from_interrupted_drain(spark, events, tmp_path):
    """Exactly-once across a mid-stream interruption: a windowed agg is
    stopped partway through a multi-file drain, then a NEW query object
    resumes from the same checkpoint — the state store must restore and
    the final complete-mode table must equal the batch computation over
    ALL files, with nothing lost and nothing double-counted. This is
    the failure-recovery contract a cluster restart relies on; the
    rerun-idempotency test above only covers the already-drained case."""
    import time

    from bcg_contacts_data_pipeline_spark.io.events import (
        normalize_event_ts,
    )

    src = str(tmp_path / "src")
    events.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    ckpt = str(tmp_path / "ckpt")

    def build():
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return S.windowed_agg(
            normalize_event_ts(raw),
            "ts",
            "1 hour",
            [],
            [F.count(F.lit(1)).alias("n")],
            watermark="1 hour",
        )

    # Phase 1: spaced micro-batches; stop after the first completes but
    # (at the 2 s cadence) well before all four files are consumed.
    q1 = (
        build()
        .writeStream.format("memory")
        .queryName("recover_phase1")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(processingTime="2 seconds")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        lp = q1.lastProgress
        if lp is not None and lp["numInputRows"] > 0:
            break
        time.sleep(0.2)
    q1.stop()
    n_phase1 = spark.table("recover_phase1").agg(F.sum("n")).collect()[0][0]
    total = events.count()

    # Phase 2: new query, same checkpoint — drain whatever remains.
    q2 = (
        build()
        .writeStream.format("memory")
        .queryName("recover_phase2")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120)
    q2.stop()

    if n_phase1 is not None and n_phase1 == total:
        # Lost the race: phase 1 drained everything before stop(); the
        # recovery path is then covered by the rerun-idempotency test.
        # Assert phase 1 itself was already exact rather than skipping.
        got = {
            r.window_start: r.n for r in spark.table("recover_phase1").collect()
        }
    else:
        got = {
            r.window_start: r.n for r in spark.table("recover_phase2").collect()
        }
    expect = {
        r.h: r.n
        for r in events.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_duplicated_source_delivers_replays_and_dedup_collapses(spark, events):
    """The at-least-once source must actually replay (2x raw rows) and
    dropDuplicatesWithinWatermark must collapse it back to exactly the
    single-copy row count — otherwise stream_dedup_then_rollup would
    pass trivially."""
    raw = S.run_available_now(
        S.events_stream_duplicated(spark, SF, copies=2).select("event_id"),
        "append",
        shuffle_partitions=8,
    )
    n = events.count()
    assert raw.count() == 2 * n
    dd = S.run_available_now(
        S.events_stream_duplicated(spark, SF, copies=2)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id"),
        "append",
        shuffle_partitions=8,
    )
    assert dd.count() == n


def test_session_close_fn_out_of_order_across_batches():
    """An event legal under the watermark can arrive in a LATER
    micro-batch than a larger timestamp; the extend branch must keep
    the stored session end MONOTONE (max), not drag it backwards —
    a backwards end mis-times the close timer and can mis-split the
    session on the next batch. Drives the state fn directly with a
    stub GroupState across two batches."""
    import pandas as pd

    from bcg_contacts_data_pipeline_spark.streaming.ops import (
        _make_session_close_fn,
    )

    class StubState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False
            self.timeout = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutTimestamp(self, ms):
            self.timeout = ms

    gap_us = 60_000_000  # 1 minute
    fn = _make_session_close_fn(gap_us)
    state = StubState()

    def batch(*ts_s):
        return [
            pd.DataFrame({"ts": pd.to_datetime(list(ts_s), unit="s")})
        ]

    # batch 1: events at t=100s and t=130s -> open session [100, 130]
    list(fn((1,), iter(batch(100, 130)), state))
    assert state.get == (100_000_000, 130_000_000, 2)
    t1 = state.timeout

    # batch 2: out-of-order event at t=110s (within the session span).
    # End must stay 130s (monotone), count incremented, timer unmoved.
    list(fn((1,), iter(batch(110)), state))
    assert state.get == (100_000_000, 130_000_000, 3)
    assert state.timeout == t1

    # batch 3: t=115s then a gap-breaking t=300s -> session closes with
    # the TRUE end 130s, not a dragged-back one
    out = list(fn((1,), iter(batch(115, 300)), state))
    assert len(out) == 1
    closed = out[0]
    assert closed["session_end"].iloc[0] == pd.Timestamp(130, unit="s")
    assert closed["n_events"].iloc[0] == 4
    assert state.get == (300_000_000, 300_000_000, 1)


def test_processing_time_trigger_micro_batch_loop(spark, tmp_path):
    """The operators must not be AvailableNow-only: drive a watermarked
    windowed aggregation under a real ``processingTime`` trigger — the
    production micro-batch loop — feeding the file source
    incrementally and letting ``processAllAvailable`` drain between
    feeds. Proves (a) the query starts and advances batches under the
    wall-clock trigger, (b) late-batch data lands in the right window
    across separate micro-batches, (c) counts match the batch twin."""
    import datetime as dt
    import os

    src = f"{tmp_path}/src"
    os.makedirs(src)
    ckpt = f"{tmp_path}/ckpt"

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/{name}")
        # move the part file into the watched dir atomically
        import glob
        import shutil

        part = glob.glob(f"{tmp_path}/{name}/part-*.parquet")[0]
        shutil.move(part, f"{src}/{name}.parquet")

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    write_batch(
        "b0",
        [
            (1, t0, "view"),
            (2, t0 + dt.timedelta(minutes=10), "view"),
            (3, t0 + dt.timedelta(hours=1, minutes=5), "click"),
        ],
    )

    schema = "event_id long, ts timestamp, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    out = S.windowed_agg(
        stream, "ts", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("n")], watermark="2 hours",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("__proc_time_smoke")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        first_batch = q.lastProgress["batchId"]
        got1 = {
            (r.window_start, r.event_type): r.n
            for r in spark.sql("SELECT * FROM __proc_time_smoke").collect()
        }
        assert got1 == {
            (t0, "view"): 2,
            (t0 + dt.timedelta(hours=1), "click"): 1,
        }

        # second feed: one event into the FIRST window (in-watermark
        # late data, arriving in a later micro-batch) and one new
        write_batch(
            "b1",
            [
                (4, t0 + dt.timedelta(minutes=30), "view"),
                (5, t0 + dt.timedelta(hours=2, minutes=1), "view"),
            ],
        )
        q.processAllAvailable()
        assert q.lastProgress["batchId"] > first_batch  # the loop advanced
        got2 = {
            (r.window_start, r.event_type): r.n
            for r in spark.sql("SELECT * FROM __proc_time_smoke").collect()
        }
        assert got2 == {
            (t0, "view"): 3,
            (t0 + dt.timedelta(hours=1), "click"): 1,
            (t0 + dt.timedelta(hours=2), "view"): 1,
        }
    finally:
        q.stop()


def test_statestore_reader_reconciles_open_sessions(spark, events, tmp_path):
    """Production state introspection (Spark 4 state data source): after a
    finite drain of the emit-on-close sessionizer, read the checkpoint's
    state store back as a batch DataFrame and reconcile EXACTLY:

        emitted sessions  ∪  open sessions still in state
            ==  batch sessionization of the full input

    This is the engine's analogue of the reference's audit-log-as-oracle
    pattern (`fill_missing_contacts.py:124-131`: every mutation is
    journaled so the final state can be re-derived and checked) — here
    the journal is the checkpoint itself, and the state source makes it
    queryable for ops/debugging without touching the running stream.
    """
    from bcg_contacts_data_pipeline_spark.operators.temporal import sessionize

    gap_us = 1_800_000_000  # 30 minutes

    # drain to a durable file sink so the checkpoint survives the query
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    st = S.events_stream(spark, SF).select("user_id", "ts")
    sess = S.session_close_stream(
        st, "ts", gap="30 minutes", watermark="30 minutes"
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        S.run_to_files(sess, out_dir, ckpt, output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    emitted = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in spark.read.parquet(out_dir)
        .select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            "n_events",
        )
        .collect()
    }

    # the state-metadata source names the operator and its store layout
    md = spark.read.format("state-metadata").load(ckpt).collect()
    assert [m.operatorName for m in md] == ["applyInPandasWithState"]
    assert md[0].numPartitions == 8

    # the statestore source exposes key + user state + registered timer
    state = spark.read.format("statestore").option("path", ckpt).load()
    open_rows = state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.groupState.start").alias("start_us"),
        F.col("value.groupState.end").alias("end_us"),
        F.col("value.groupState.n").alias("n_events"),
        F.col("value.timeoutTimestamp").alias("timer_ms"),
    ).collect()
    in_state = {
        (r.user_id, r.start_us, r.end_us, r.n_events) for r in open_rows
    }
    assert in_state, "finite drain should leave at least one open session"

    # each open session's registered timer is exactly ceil((end+gap)/1ms)
    for r in open_rows:
        assert r.timer_ms == -(-(r.end_us + gap_us) // 1000)

    # exact reconciliation against the batch twin
    want = {
        (r.user_id, r.start_us, r.end_us, r.n)
        for r in sessionize(events, "user_id", "ts", gap_us, "event_id")
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert emitted.isdisjoint(in_state)
    assert emitted | in_state == want


def test_statestore_join_buffers_reconcile_with_cutoff(spark, events, tmp_path):
    """State introspection for the symmetricHashJoin operator: after a
    finite drain of the watermarked LEFT OUTER view->click attribution
    join, read BOTH join buffers back (statestore source, joinSide
    option) and verify the buffered sets against the cutoff algebra the
    oracle states:

    - no view is lost: every view_id is in the emitted output or in the
      left buffer;
    - the left buffer holds EXACTLY the views whose match window is
      still open at the final watermark (view_ts + within >= W, where
      W = least(max view ts, max click ts) - delay) — the rows that
      could still match on an unbounded stream;
    - every view unemitted by the outer join is still buffered (the
      complement law the `stream_click_attribution_outer` oracle
      relies on);
    - the right buffer only holds real clicks (keyed by user).
    """
    import datetime as dt

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    views = S.events_stream(spark, SF).filter(
        F.col("event_type") == "view"
    ).select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    clicks = S.events_stream(spark, SF).filter(
        F.col("event_type") == "click"
    ).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = S.stream_stream_time_join(
        views, clicks,
        left_key="user_id", right_key="c_user_id",
        left_ts="view_ts", right_ts="click_ts",
        within="6 HOURS", watermark="1 hour", how="leftOuter",
    ).select("view_id", "click_id", "user_id", "view_ts", "click_ts")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        S.run_to_files(joined, out_dir, ckpt, output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    emitted_ids = {
        r.view_id for r in spark.read.parquet(out_dir).select("view_id").collect()
    }

    md = spark.read.format("state-metadata").load(ckpt).collect()
    assert {m.operatorName for m in md} == {"symmetricHashJoin"}

    buffered_left = {
        (r.view_id, r.user_id, r.view_ts)
        for r in spark.read.format("statestore")
        .option("path", ckpt).option("joinSide", "left").load()
        .select("value.view_id", "value.user_id", "value.view_ts")
        .collect()
    }
    buffered_right = {
        (r.click_id, r.c_user_id)
        for r in spark.read.format("statestore")
        .option("path", ckpt).option("joinSide", "right").load()
        .select("value.click_id", "value.c_user_id")
        .collect()
    }

    ev = events.select("event_id", "user_id", "ts", "event_type")
    all_views = {
        (r.event_id, r.user_id, r.ts)
        for r in ev.filter(F.col("event_type") == "view").collect()
    }
    all_clicks = {
        (r.event_id, r.user_id)
        for r in ev.filter(F.col("event_type") == "click").collect()
    }
    max_view = max(ts for _, _, ts in all_views)
    max_click = max(
        r.ts for r in ev.filter(F.col("event_type") == "click").collect()
    )
    wm = min(max_view, max_click) - dt.timedelta(hours=1)

    # exact left-buffer membership: match window still open at cutoff
    want_buffered = {
        v for v in all_views if v[2] + dt.timedelta(hours=6) >= wm
    }
    assert buffered_left == want_buffered

    # no loss, and the unemitted views are exactly the buffered ones
    buffered_ids = {v[0] for v in buffered_left}
    assert emitted_ids | buffered_ids == {v[0] for v in all_views}
    assert {v[0] for v in all_views} - emitted_ids <= buffered_ids

    assert buffered_right <= all_clicks
