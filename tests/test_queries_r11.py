"""Round-11 query semantics, pinned on constructed corpora (independent
of the DuckDB oracle, which certifies the same laws statistically at
sf): the capped-ANN twin and the incremental-curation composition."""

import pyspark.sql.functions as F

from bcg_contacts_data_pipeline_spark.operators.dedup import content_hash
from bcg_contacts_data_pipeline_spark.operators.graph import (
    incremental_components,
)
from bcg_contacts_data_pipeline_spark.operators.similarity import (
    prefix_filter_pairs,
)


def _compose(spark, rows):
    """Run the incremental_curation_e2e composition over a constructed
    documents frame (same code path as plans/queries_r11.py, with the
    table injected)."""
    from pyspark.sql import Window

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hashed = docs.select("doc_id", "text", content_hash("text").alias("h"))
    base = hashed.filter(F.col("doc_id") % 10 != 0)
    batch = hashed.filter(F.col("doc_id") % 10 == 0)
    base_rep = (
        base.filter(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.min("doc_id").alias("__base_rep"))
    )
    batch_min = F.min("doc_id").over(Window.partitionBy("h"))
    anchor = F.when(
        F.col("__base_rep").isNotNull(), F.col("__base_rep")
    ).when(
        F.col("h").isNotNull() & (F.col("doc_id") != batch_min), batch_min
    )
    adjud = batch.join(base_rep, "h", "left").select(
        "doc_id", "text", anchor.alias("__anchor")
    )
    survivors = adjud.filter(F.col("__anchor").isNull()).select(
        "doc_id", "text"
    )
    dropped = adjud.filter(F.col("__anchor").isNotNull()).select(
        "doc_id", "__anchor"
    )
    corpus = base.select("doc_id", "text").unionByName(survivors)
    new_edges = prefix_filter_pairs(
        corpus, "doc_id", "text", n=3, t_num=1, t_den=2,
        probe_pred=lambda c: c % 10 == 0,
    ).select("id_a", "id_b")
    old_labels = base.join(base_rep, "h", "left").select(
        F.col("doc_id").alias("node"),
        F.coalesce("__base_rep", "doc_id").alias("comp"),
    )
    selfedges = survivors.select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    merged = incremental_components(old_labels, new_edges.unionByName(selfedges))
    inherited = dropped.join(
        merged, dropped["__anchor"] == merged["node"]
    ).select(dropped["doc_id"], merged["comp"])
    out = merged.select(F.col("node").alias("doc_id"), "comp").unionByName(
        inherited
    )
    return {r["doc_id"]: r["comp"] for r in out.collect()}, {
        r["doc_id"] for r in survivors.collect()
    }


def test_incremental_curation_handoffs(spark):
    """Every handoff in the composition, one constructed corpus:
    - batch doc identical to history -> anchored to the base rep,
      inherits its component, never reaches pair generation;
    - two identical batch docs with no base match -> min survives,
      the other anchors to it;
    - a batch near-dup (not exact) of a history doc -> survives dedup,
      edges to it via jaccard, merges into its component;
    - NULL-text docs label themselves (no NULL-group collapse);
    - the label table is total (one row per input doc).
    """
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    neartxt = "alpha beta gamma delta epsilon zeta eta iota"  # J=7/9 >= .5
    rows = [
        (1, shared),        # history; rep of the shared-text family
        (11, shared),       # history exact dup of 1 -> old comp 1
        (3, "totally different words here"),   # history singleton
        (5, None),          # history NULL text -> labels itself
        (10, shared),       # batch exact dup of history -> anchor 1
        (20, neartxt),      # batch near-dup of history 1 -> edge, comp 1
        (30, "brand new unseen content thirty"),  # batch, genuinely new
        (40, "brand new unseen content thirty"),  # batch dup of 30
        (50, None),         # batch NULL text -> survivor, labels itself
    ]
    comp, survivors = _compose(spark, rows)

    assert survivors == {20, 30, 50}  # 10 dropped (base), 40 dropped (batch)
    assert comp[1] == 1 and comp[11] == 1
    assert comp[10] == 1       # dup-of-base inherits through the anchor
    assert comp[20] == 1       # near-dup merged by the jaccard edge
    assert comp[3] == 3        # untouched history singleton
    assert comp[30] == 30 and comp[40] == 30  # in-batch dup anchors to min
    assert comp[5] == 5 and comp[50] == 50    # NULLs never collapse
    assert len(comp) == len(rows)             # label table is total


def test_incremental_curation_matches_registered_query_shape(spark):
    """The registered query returns (doc_id, comp) with one row per
    document at sf0.001 — totality at a real SF."""
    from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["incremental_curation_e2e"](spark, sf)
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    rows = out.collect()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
