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


#: set after this process drains once: the drain itself creates the
#: StateStoreCoordinator, so later reuse never needs the internal
#: accessor (and never falls into a rebuild loop if that API vanishes)
_DRAINED_THIS_PROCESS = False


def _events_fingerprint(sf_dir: str) -> str:
    """Cheap content fingerprint of the events table: sorted relative
    file names + sizes + mtimes. Regenerating the data at the same path
    changes the fingerprint, so a cached checkpoint can never serve
    state computed from old rows."""
    root = os.path.join(sf_dir, "events.parquet")
    parts = []
    if os.path.isdir(root):
        for dirpath, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                parts.append(
                    f"{os.path.relpath(p, root)}:{st.st_size}:{st.st_mtime_ns}"
                )
    elif os.path.exists(root):
        st = os.stat(root)
        parts.append(f".:{st.st_size}:{st.st_mtime_ns}")
    # os.walk yields directories in arbitrary scandir order — sort the
    # COLLECTED relpaths so the digest is canonical for partitioned
    # (nested) parquet, not dependent on filesystem enumeration order
    return "|".join(sorted(parts))


def _drained_sessions_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Drain the sessionizer once per (process, data version) into a
    content-keyed temp checkpoint; reuse on later calls. Publication is
    an ATOMIC RENAME of a uniquely-named build dir, so a reader can
    never observe a partial checkpoint and concurrent builders race
    harmlessly (first rename wins, losers discard their build)."""
    global _DRAINED_THIS_PROCESS
    import shutil
    import uuid

    from bcg_contacts_data_pipeline_spark import streaming as S

    # cache key = data fingerprint + operator schemas: either changing
    # invalidates checkpoints left by older data or older code
    from bcg_contacts_data_pipeline_spark.streaming import ops as _ops

    salt = (
        f"{sf_dir}|{_events_fingerprint(sf_dir)}|{_ops._SESSION_OUT_SCHEMA}"
        f"|{_ops._SESSION_STATE_SCHEMA}|gap30m"
    )
    digest = hashlib.sha256(salt.encode()).hexdigest()[:16]
    root = os.path.join(tempfile.gettempdir(), f"bcg_sessions_ckpt_{digest}")
    ckpt = os.path.join(root, "ckpt")

    if os.path.isdir(root):  # rename-published => complete
        try:
            # refresh the root's mtime on every reuse: the sweep below
            # ages roots by mtime, and a long-lived process re-reading
            # one digest must keep it out of other processes' sweeps
            os.utime(root)
        except OSError:
            pass
        if _DRAINED_THIS_PROCESS or _ensure_state_coordinator(spark):
            return ckpt
        # coordinator can't be forced and no drain ran yet in this
        # process: fall through once — the drain below creates the
        # endpoint the statestore read needs (flag prevents loops)
    else:
        _ensure_state_coordinator(spark)

    build = f"{root}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(build)
    st = S.events_stream(spark, sf_dir).select("user_id", "ts")
    sess = S.session_close_stream(
        st, "ts", gap="30 minutes", watermark="30 minutes"
    )
    # scoped shuffle override, same rationale as runner.run_available_now:
    # one state store per shuffle partition is per-query fixed cost
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        S.run_to_files(
            sess,
            os.path.join(build, "out"),
            os.path.join(build, "ckpt"),
            output_mode="append",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    _DRAINED_THIS_PROCESS = True
    try:
        os.rename(build, root)
    except OSError:
        # a concurrent builder published first; theirs is complete
        shutil.rmtree(build, ignore_errors=True)
    # bound /tmp growth: sweep SUPERSEDED roots (other digests — old
    # data versions / old code) once they're a day old; the age floor
    # plus the cache-hit utime above keeps us from deleting a
    # checkpoint a concurrent process is actively re-reading, and the
    # OSError guard covers a concurrent sweeper winning the race
    # between glob and stat
    import glob as _glob
    import time as _time

    now = _time.time()
    for other in _glob.glob(
        os.path.join(tempfile.gettempdir(), "bcg_sessions_ckpt_*")
    ):
        try:
            if other != root and now - os.path.getmtime(other) > 86_400:
                shutil.rmtree(other, ignore_errors=True)
        except OSError:
            pass  # another sweeper removed it between glob and stat
    return ckpt


from bcg_contacts_data_pipeline_spark.plans.oracle_templates import (  # noqa: E402
    SESSIONS_ORACLE_TEMPLATE,
)


@register(
    "statestore_open_sessions",
    # the EXACT complement of stream_sessions_timeout's cutoff, built
    # from the same shared scaffold so the complement law cannot drift
    oracle=SESSIONS_ORACLE_TEMPLATE.format(
        cutoff="""is_last
      AND session_end + INTERVAL 30 MINUTE >= wm.w"""
    ),
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


from bcg_contacts_data_pipeline_spark.plans.oracle_templates import (  # noqa: E402
    JACCARD_PAIRS_ORACLE_TEMPLATE,
)


@register(
    "incremental_neardup",
    # the full-join oracle restricted to pairs with a new-batch member,
    # built from prefix_jaccard_pairs' shared scaffold so the
    # restriction law cannot drift
    oracle=JACCARD_PAIRS_ORACLE_TEMPLATE.format(
        extra_where="""
      AND (s.id_a % 10 = 0 OR s.id_b % 10 = 0)"""
    ),
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
