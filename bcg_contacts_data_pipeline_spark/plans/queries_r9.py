"""Round-9 surface: production state-store introspection.

Spark 4's state data source (`spark.read.format("statestore")`) turns a
streaming checkpoint into a queryable batch table — the ops/debugging
surface a production streaming deployment needs (what is my sessionizer
holding? which keys are stuck open?). The reference's analogue is its
audit-log-as-oracle pattern (`fill_missing_contacts.py:124-131`: every
mutation journaled so final state is re-derivable and checkable); here
the journal is the checkpoint itself.

``statestore_open_sessions`` is the certified entry: it drains the
emit-on-close sessionizer (`stream_sessions_timeout`'s operator) to a
durable checkpoint, then reads the checkpoint's state store back and
returns the OPEN sessions — the exact complement of the emitted set, so
the DuckDB oracle is the complement of `stream_sessions_timeout`'s
(is_last sessions whose ``end + gap`` has not yet passed the final
watermark). Emitted ∪ state == batch sessionization is separately
asserted in `tests/test_streaming.py::
test_statestore_reader_reconciles_open_sessions`.

Scale: the state read is one task per state-store partition, reading
only the final snapshot/delta files — proportional to OPEN keys, never
to the event history. At 100 TB of events the open-session state is
bounded by active users within one watermark horizon.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.plans.queries import register


def _ensure_state_coordinator(spark: SparkSession) -> bool:
    """The statestore batch reader resolves state through the session's
    StateStoreCoordinator RPC endpoint, which Spark creates LAZILY on the
    first streaming-query start — a session that has only ever read
    batch data has no endpoint and the read fails with
    CANNOT_LOAD_STATE_STORE / RpcEndpointNotFoundException. Touch the
    (private[sql] — public in bytecode) lazy val to force creation.
    Returns False if the internal accessor is unavailable, in which case
    the caller must guarantee a streaming query ran in this session."""
    try:
        (
            spark._jsparkSession.sessionState()
            .streamingQueryManager()
            .stateStoreCoordinator()
        )
        return True
    except Exception:  # noqa: BLE001 — internal API; fall back to a drain
        return False


def _drained_sessions_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Drain the sessionizer once per (process, sf_dir) into a
    deterministic temp checkpoint; reuse on later calls (a `_done`
    sentinel is written only after the drain commits, so an interrupted
    drain is rebuilt from scratch, never trusted)."""
    from bcg_contacts_data_pipeline_spark import streaming as S

    # salt the cache key with the operator's schemas: a code change to
    # the sessionizer invalidates checkpoints left by older versions
    from bcg_contacts_data_pipeline_spark.streaming import ops as _ops

    salt = f"{sf_dir}|{_ops._SESSION_OUT_SCHEMA}|{_ops._SESSION_STATE_SCHEMA}|gap30m"
    digest = hashlib.sha256(salt.encode()).hexdigest()[:16]
    root = os.path.join(
        tempfile.gettempdir(), f"bcg_sessions_ckpt_{digest}"
    )
    ckpt, out, done = (
        os.path.join(root, "ckpt"),
        os.path.join(root, "out"),
        os.path.join(root, "_done"),
    )
    if os.path.exists(done):
        if _ensure_state_coordinator(spark):
            return ckpt
        # coordinator can't be forced through the internal accessor:
        # fall through and re-drain — running a streaming query is the
        # public way to create the endpoint this session needs to read
    else:
        _ensure_state_coordinator(spark)
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    st = S.events_stream(spark, sf_dir).select("user_id", "ts")
    sess = S.session_close_stream(
        st, "ts", gap="30 minutes", watermark="30 minutes"
    )
    # scoped shuffle override, same rationale as runner.run_available_now:
    # one state store per shuffle partition is per-query fixed cost
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        S.run_to_files(sess, out, ckpt, output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    with open(done, "w") as f:
        f.write("ok")
    return ckpt


@register(
    "statestore_open_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    grouped AS (
      SELECT user_id, sid,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, sid),
    flagged AS (
      SELECT g.*,
             sid = MAX(sid) OVER (PARTITION BY user_id) AS is_last
      FROM grouped g),
    wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events)
    SELECT user_id, session_start, session_end, n_events
    FROM flagged, wm
    WHERE is_last
      AND session_end + INTERVAL 30 MINUTE >= wm.w
    """,
)
def statestore_open_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint state introspection: the sessions still OPEN in the
    sessionizer's state store after a finite AvailableNow drain, read
    back through the Spark 4 state data source. Exact complement of
    ``stream_sessions_timeout``'s emitted set (same watermark algebra,
    flipped inequality) — together they partition the batch
    sessionization, which the oracle states declaratively."""
    ckpt = _drained_sessions_checkpoint(spark, sf_dir)
    state = spark.read.format("statestore").option("path", ckpt).load()
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.timestamp_micros(F.col("value.groupState.start")).alias(
            "session_start"
        ),
        F.timestamp_micros(F.col("value.groupState.end")).alias(
            "session_end"
        ),
        F.col("value.groupState.n").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Incremental near-dup: daily batch vs history, lossless prefix filter.
# ---------------------------------------------------------------------------


@register(
    "incremental_neardup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE length(trim(text)) > 0),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks WHERE len(t) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT s.id_a, s.id_b, s.shared,
           sa.n AS size_a, sb.n AS size_b,
           CAST(s.shared AS DOUBLE) / CAST(sa.n + sb.n - s.shared AS DOUBLE)
             AS jaccard
    FROM shared s
    JOIN sizes sa ON s.id_a = sa.doc_id
    JOIN sizes sb ON s.id_b = sb.doc_id
    WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n + sb.n - s.shared AS DOUBLE)
          >= 0.5
      AND (s.id_a % 10 = 0 OR s.id_b % 10 = 0)
    """,
)
def incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-crawl INCREMENTAL near-dup: exact 3-gram Jaccard >= 0.5
    pairs touching today's batch (docs with ``doc_id % 10 = 0`` stand in
    for the new crawl; the rest are history), via the lossless prefix
    filter probing the full prefix index — history x history pairs,
    already adjudicated on previous days, are never recomputed.

    The near-dup sibling of ``incremental_dedup`` (exact-hash version):
    together they give the daily-ingest shape both dedup families need
    at 100 TB — join the new batch against a persisted index instead of
    rescanning all pairs. The oracle is the declarative full join
    restricted to pairs with a new member, so the driver's hash check
    proves the incremental candidate rule drops nothing (recall = 1)
    while generating only new x all candidates.
    """
    from bcg_contacts_data_pipeline_spark.operators.similarity import (
        prefix_filter_pairs,
    )
    from bcg_contacts_data_pipeline_spark.plans.queries import _t

    docs = _t(spark, sf_dir, "documents")
    return prefix_filter_pairs(
        docs,
        "doc_id",
        "text",
        n=3,
        t_num=1,
        t_den=2,
        probe_pred=lambda id_col: id_col % 10 == 0,
    )
