"""Round-10 surface: malformed-row quarantine for the TSV edge.

The reference's loaders assume well-formed TSV
(`cleaning/clean_contacts.py:260` and
`cleaning/fill_missing_contacts.py:150,184` read with plain
`pd.read_csv(sep='\t')` — a bad row either silently misparses or kills
the load). At 100 TB a feed WILL contain malformed rows, and the
right semantics are the ones `operators/multimodal.media_quarantine`
already gives the binary edge: tolerant decode, corrupt rows routed to
a QUERYABLE quarantine with the raw payload preserved — never a crashed
job, never silent loss.

``tsv_quarantine`` is the tabular sibling: a TSV feed is parsed with
Spark's PERMISSIVE CSV mode + ``columnNameOfCorruptRecord`` (the
engine-native quarantine mechanism — the parser keeps the raw line of
every row that fails the schema), and the query returns the quarantined
rows with their recoverable key fields extracted from the raw line. The
feed is synthesized deterministically from the documents table (rows
where ``doc_id % 7 = 0`` get a non-numeric token planted in a numeric
field), so the DuckDB oracle states the expected quarantine membership
declaratively and the driver hash-checks it.

Scale shape: one scan, zero shuffles — line synthesis, ``from_csv``,
and the corrupt-record filter are all narrow Catalyst projections
(JVM-side UnivocityParser per row, no Python). At 100 TB this is
scan-speed, and the quarantine output is proportional to the corruption
rate, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.plans.queries import register

#: the TSV schema the feed is parsed against; ``_corrupt`` is the
#: PERMISSIVE-mode corrupt-record column and must be part of the schema
#: handed to from_csv (same contract as the csv file source)
_FEED_SCHEMA = "doc_id BIGINT, lang STRING, n_chars BIGINT, _corrupt STRING"


@register(
    "tsv_quarantine",
    oracle="""
SELECT doc_id,
       coalesce(lang, '') AS lang,
       'unparseable_n_chars' AS reason
FROM documents
WHERE doc_id % 7 = 0
""",
)
def tsv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE corrupt-record quarantine over a synthesized TSV feed:
    rows whose numeric field fails the schema land in the quarantine
    with key fields recovered from the preserved raw line. Reference
    edge: clean_contacts.py:260's pandas read_csv, which has no
    tolerant path; engine sibling:
    operators/multimodal.media_quarantine."""
    from bcg_contacts_data_pipeline_spark.plans.queries import _t

    docs = _t(spark, sf_dir, "documents")
    # deterministic corruption: every 7th doc_id ships '#<n>' where the
    # feed schema demands a BIGINT — unparseable, row -> quarantine.
    # NULLable fields are coalesced so the synthesis is TOTAL: a plain
    # concat() would turn one NULL field into a NULL line and silently
    # drop the row from both sides — the exact loss this query exists
    # to prevent (the oracle coalesces identically).
    lines = docs.selectExpr(
        r"""concat(
              cast(doc_id AS string), '\t',
              coalesce(lang, ''), '\t',
              CASE WHEN doc_id % 7 = 0
                   THEN concat('#', coalesce(cast(n_chars AS string), ''))
                   ELSE coalesce(cast(n_chars AS string), '') END
            ) AS raw"""
    )
    parsed = lines.selectExpr(
        "raw",
        f"""from_csv(
              raw,
              '{_FEED_SCHEMA}',
              map('sep', '\\t',
                  'mode', 'PERMISSIVE',
                  'columnNameOfCorruptRecord', '_corrupt')
            ) AS rec""",
    )
    return parsed.filter("rec._corrupt IS NOT NULL").selectExpr(
        # key recovery from the preserved raw line, not from the
        # (partially-null) parsed struct — the quarantine consumer's view
        "cast(split(rec._corrupt, '\\t')[0] AS bigint) AS doc_id",
        "split(rec._corrupt, '\\t')[1] AS lang",
        "'unparseable_n_chars' AS reason",
    )


# ---------------------------------------------------------------------------
# Capped MinHash recall: the 100 TB twin of minhash_recall.
# ---------------------------------------------------------------------------


def _capped_recall_oracle() -> str:
    from bcg_contacts_data_pipeline_spark.plans.queries import (
        _RECALL_ORACLE_TMPL,
        _TOKS_SQL,
    )

    return _RECALL_ORACLE_TMPL.format(toks=_TOKS_SQL, min_tokens=3)


@register("minhash_recall_capped", oracle=_capped_recall_oracle())
def minhash_recall_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``minhash_recall`` with the PRODUCTION hot-bucket cap
    (``max_bucket=100``, `similarity.py:_drop_hot_buckets`). At every
    shipped SF the corpus's identical-text clusters have exactly 2
    members (doc + constructed copy), far under the cap, so the result
    — and the oracle — are identical to the uncapped baseline's
    (recall 1.0). The cap exists for what the uncapped baseline cannot
    survive: SCALE.md's 100x replica makes every cluster 200 identical
    docs, where the complete-candidate set is Θ(clusters·clone²) —
    3.2e9 band-join rows, quadratic BY DESIGN since the baseline must
    emit every true pair. The cap routes such clusters out of pairwise
    scoring (cluster-by-bucket handling is the right tool for 200-way
    clones), keeping the pair generator's output bounded by
    clusters·cap² — this query is the tier-2 scale-probe member for the
    MinHash family (SCALE.md), the uncapped baseline stays the
    completeness certificate at 1x/10x."""
    from bcg_contacts_data_pipeline_spark.functions.text import tokens
    from bcg_contacts_data_pipeline_spark.operators.similarity import (
        minhash_lsh_pairs_from_sigs,
        minhash_signatures,
    )
    from bcg_contacts_data_pipeline_spark.plans.queries import (
        _COPY_OFFSET,
        _recall_frame,
        _sigs_with_copy,
        _t,
    )

    docs = _t(spark, sf_dir, "documents")
    # signatures once per text, ids exploded after (_sigs_with_copy)
    pairs = minhash_lsh_pairs_from_sigs(
        _sigs_with_copy(
            minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=64)
        ),
        "doc_id",
        num_hashes=64,
        bands=16,
        verify_threshold=0.5,
        max_bucket=100,
    )
    truth = docs.filter(
        (F.length(F.trim("text")) > 0) & (F.size(tokens(F.col("text"))) >= 3)
    ).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + F.lit(_COPY_OFFSET)).alias("id_b"),
    )
    return _recall_frame(pairs, truth)


# ---------------------------------------------------------------------------
# Incremental connected components: merge today's edges into yesterday's
# labeling — the clustering leg of the daily-crawl shape.
# ---------------------------------------------------------------------------

from bcg_contacts_data_pipeline_spark.plans.oracle_templates import (  # noqa: E402
    INCREMENTAL_CC_ORACLE,
)


@register("incremental_components", oracle=INCREMENTAL_CC_ORACLE)
def q_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-crawl INCREMENTAL clustering: history documents
    (``doc_id % 10 != 0``) carry yesterday's labeling — exact-dup
    clusters, derived by one groupBy (min doc_id per text), the shape a
    warehouse persists; today's batch (``% 10 = 0``) contributes only
    the NEW near-dup edges (the same prefix-filtered incremental
    generator ``incremental_neardup`` certifies — history×history pairs
    are never recomputed). ``graph.incremental_components`` merges them
    by CONTRACTING each old component to its min-id label and
    propagating labels over the tiny contracted graph only. The oracle
    recomputes CC(old-star ∪ new-jaccard edges) from scratch by
    recursive CTE over the shared edge definitions, so the driver's
    hash check proves the contraction algebra exact: the incremental
    merge is bit-identical to the full recompute.

    Scale: the contracted graph has one vertex per AFFECTED component —
    proportional to today's batch and its collisions, never to the
    historical corpus. With a persisted (node, comp) table this keeps
    corpus clustering O(batch) per day at 100 TB.
    """
    from bcg_contacts_data_pipeline_spark.operators.graph import (
        incremental_components,
    )
    from bcg_contacts_data_pipeline_spark.operators.similarity import (
        prefix_filter_pairs,
    )
    from bcg_contacts_data_pipeline_spark.plans.queries import _t

    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    # yesterday's labeling: exact-dup components need no CC at all —
    # component label = min doc_id per identical text (NULL text rows
    # hash to NULL, join nothing and label themselves, same as the
    # oracle's star join). The group/join key is sha2-256 of the text,
    # not the text itself (r14, guide §2.3 "shuffle keys, not
    # payloads"): both exchanges carried the FULL document as the key;
    # the hash is the same collision-resistant equality decision
    # paragraph_dedup documents, at 64 bytes per row
    hist_h = hist.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("__h")
    )
    rep = hist_h.groupBy("__h").agg(F.min("doc_id").alias("__m"))
    old_labels = hist_h.join(rep, "__h", "left").select(
        F.col("doc_id").alias("node"),
        F.coalesce("__m", "doc_id").alias("comp"),
    )
    # today's edges: pairs with >= 1 new-batch member (never history
    # x history) — the certified incremental generator
    new_pairs = prefix_filter_pairs(
        docs, "doc_id", "text", n=3, t_num=1, t_den=2,
        probe_pred=lambda c: c % 10 == 0,
    ).select("id_a", "id_b")
    # new docs that collide with nothing still need a label
    new_singletons = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    merged = incremental_components(
        old_labels, new_pairs.unionByName(new_singletons)
    )
    return merged.select(F.col("node").alias("doc_id"), "comp")
