"""Connected components over a pair graph — the closure step of the
dedup family.

The similarity operators (ngram_jaccard_pairs / minhash_lsh_pairs /
simhash_pairs / embedding_neardup) emit PAIRS; deduplicating a corpus
needs CLUSTERS: if A~B and B~C, then {A,B,C} is one duplicate group even
though A~C was never scored. This is connected components, the standard
final stage of large-scale near-dup dedup pipelines.

Algorithm: iterated label propagation to the minimum ("hash-to-min"
style). Each node's label starts as its own id; every round each node
adopts the min label in its closed neighborhood; converged when no label
changes. Rounds needed = graph diameter (near-dup graphs are shallow —
a handful of rounds in practice; ``max_iter`` bounds pathological
chains).

Scale shape per round: one join edges->labels + one groupBy min — both
partitioned by node id, no driver-side data except the single converged?
counter (an aggregate). Edges are held in BOTH directions once
(symmetrized up front) so each round is a single equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.operators.pins import PinScope


def free_local_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a ``localCheckpoint``'s materialized blocks.

    ``DataFrame.unpersist`` only touches the SQL cache; a checkpoint's
    blocks belong to the underlying RDD, reachable through the
    ``LogicalRDD`` plan node. Spark's ContextCleaner would free them
    eventually (when the JVM-side RDD is garbage collected), but an
    iterative operator that checkpoints per round should not hold every
    round's blocks until GC. Freeing makes the frame UNRECOMPUTABLE
    (lineage was truncated) — only call once nothing will read it again.
    Guarded: the accessor path is Spark-internal, so any mismatch
    degrades to the ContextCleaner behavior instead of failing the job.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_iter: int | None = None,
    checkpoint: str = "local",
    pins: PinScope | None = None,
) -> DataFrame:
    """(node, component) with component = min node id of the component.

    ``nodes`` (optional) adds isolated vertices that appear in no edge —
    pass the full corpus so singletons come out labeled too.

    ``max_iter``: adaptive by default (``None`` — iterate until the
    changed-label count reaches zero; min-label propagation terminates in
    at most graph-diameter rounds, so the loop is finite without a cap).
    Pass a bound to trade completeness for a latency ceiling on
    pathological chain graphs; hitting the bound returns the (possibly
    unconverged) labels.

    ``checkpoint``: per-round lineage truncation strategy —
    - ``"local"`` (default): ``localCheckpoint`` — executor-local blocks,
      no configuration needed; right for local mode and short jobs. A
      lost executor loses blocks and fails the job (no lineage left to
      recompute from).
    - ``"reliable"``: ``checkpoint`` to the fault-tolerant FS configured
      via ``spark.sparkContext.setCheckpointDir`` — survives executor
      loss; the right choice for long-running cluster jobs at scale.

    Checkpoint block lifetime (local mode): each round's label
    checkpoint is freed as soon as the next round has materialized, so
    live block storage is bounded at sym + 2 label frames regardless of
    graph diameter (a 50-round pathological chain no longer holds 50
    label snapshots until GC). The two frames that must outlive the
    call — sym is not needed after the loop and is freed on exit; the
    FINAL labels back the returned DataFrame — the final checkpoint is
    registered in ``pins`` when a scope is passed (release it only
    after your sinks have run; the frame cannot be recomputed), else it
    is left to Spark's ContextCleaner like before.
    """
    if checkpoint not in ("local", "reliable"):
        raise ValueError(f"checkpoint must be 'local' or 'reliable', got {checkpoint!r}")

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint == "reliable":
            if edges.sparkSession.sparkContext.getCheckpointDir() is None:
                raise ValueError(
                    "checkpoint='reliable' needs spark.sparkContext."
                    "setCheckpointDir(<fault-tolerant path>) first"
                )
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # Materialize the symmetrized edge list ONCE: it is joined every
    # round, and without this the upstream pair computation (e.g. the
    # whole ngram-Jaccard pipeline) would re-execute per iteration —
    # measured ~6x slower on a 5-round graph.
    sym = _truncate(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    verts = sym.select(F.col("u").alias("node")).distinct()
    if nodes is not None:
        extra = nodes.select(
            F.col(node_col or nodes.columns[0]).alias("node")
        ).distinct()
        verts = verts.unionByName(extra).distinct()

    comp_type = verts.schema["node"].dataType
    labels = verts.select("node", F.col("node").alias("comp"))
    prev_ck: DataFrame | None = None  # superseded round checkpoint
    rounds = 0
    while max_iter is None or rounds < max_iter:
        rounds += 1
        # each node: min(own label, labels of neighbors). The self row
        # carries the previous label in ``old`` (neighbor rows carry
        # NULL, which min() ignores), so the convergence check below is
        # a filter over the aggregate's own output — no extra
        # labels-vs-new-labels join per round.
        nbr = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .select(
                F.col("u").alias("node"),
                "comp",
                F.lit(None).cast(comp_type).alias("old"),
            )
        )
        new_labels = (
            labels.select("node", "comp", F.col("comp").alias("old"))
            .unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.min("old").alias("old"))
        )
        # Checkpointing truncates the growing lineage (iterative plans
        # re-expand otherwise and planning cost compounds per round) and
        # lets the changed-count action reuse the materialized result.
        new_labels = _truncate(new_labels)
        changed = new_labels.filter(F.col("comp") != F.col("old")).count()
        # The new round is fully materialized (eager checkpoint + the
        # count action above); the previous round's blocks can never be
        # read again — free them now instead of waiting for GC.
        if checkpoint == "local" and prev_ck is not None:
            free_local_checkpoint(prev_ck)
        prev_ck = new_labels
        labels = new_labels.select("node", "comp")
        if changed == 0:
            break
    # prev_ck is None only when max_iter=0 skipped the loop entirely —
    # then the returned labels still derive from sym and neither may be
    # freed.
    if prev_ck is not None:
        if checkpoint == "local":
            free_local_checkpoint(sym)
            if pins is not None:
                pins.adopt(prev_ck, free_local_checkpoint)
        elif pins is not None:
            # reliable mode: the final frame is backed by checkpoint
            # FILES (the fault-tolerance artifact — they outlive the
            # scope by design; spark.cleaner.referenceTracking
            # .cleanCheckpoints governs their lifetime). Register with a
            # no-op releaser so the caller's scope accounting — adopt
            # here, len()/release() there — behaves identically in both
            # modes instead of silently skipping the registration.
            pins.adopt(prev_ck, lambda df: None)
    return labels
