"""Round-12 surface: PSL-correct domain quotas, semantic dedup, the
batch URL-frontier history dedup, and quality-score calibration.

Headliner is the eTLD+1 fix (VERDICT r11 ask #1): per-domain quota
sampling keyed by the REGISTRABLE domain via the checked-in
public-suffix snapshot (`functions/public_suffix.py`) instead of the
last-two-labels heuristic — on a ccTLD corpus the heuristic collapses
every ``.co.uk`` site into one quota bucket, inverting the operator's
purpose; the PSL path keys each registrant separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.plans.queries import (
    _COPY_OFFSET,
    _DOT_SQL,
    _t,
    register,
)

# ---------------------------------------------------------------------------
# eTLD+1 quota sampling over a mixed ccTLD / private-suffix crawl.
# ---------------------------------------------------------------------------

_ETLD_QUOTA = 8  # engages at every shipped SF (~11 docs/domain at sf0.01)

#: suffix classes the fixture rotates through: a default-rule TLD, two
#: ccTLD second-level hierarchies, and a PRIVATE-section multi-tenant
#: host — the four shapes that make-or-break a real crawl quota.
_ETLD_SUFFIXES = [".ORG", ".Co.UK", ".com.AU", ".GitHub.IO"]
_ETLD_SUFFIXES_SQL = ["org", "co.uk", "com.au", "github.io"]


@register(
    "etld1_quota_sample",
    # ground truth from the synthesis arithmetic: the registrable domain
    # is site{k}.{suffix} regardless of the www. subdomain or the label
    # case — DuckDB states the kept set without any PSL logic, so the
    # hash check certifies the broadcast suffix-match join (exact
    # multi-label rules, private section, subdomain folding, case fold)
    # against an independent statement of the expected answer.
    oracle=f"""
    WITH u AS (
      SELECT doc_id, n_chars,
             'site' || CAST((doc_id // 3) % 11 AS VARCHAR) || '.' ||
             CASE doc_id % 4
               WHEN 0 THEN '{_ETLD_SUFFIXES_SQL[0]}'
               WHEN 1 THEN '{_ETLD_SUFFIXES_SQL[1]}'
               WHEN 2 THEN '{_ETLD_SUFFIXES_SQL[2]}'
               ELSE '{_ETLD_SUFFIXES_SQL[3]}' END AS domain
      FROM documents),
    ranked AS (
      SELECT domain, doc_id, n_chars,
             row_number() OVER (PARTITION BY domain
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM u)
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk <= {_ETLD_QUOTA} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           MIN(CASE WHEN rk <= {_ETLD_QUOTA} THEN doc_id END) AS first_kept
    FROM ranked GROUP BY domain
    """,
)
def q_etld1_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling keyed by the TRUE registrable domain
    (eTLD+1, `functions/public_suffix.py:from_url` — broadcast
    suffix-match join against the checked-in public-suffix snapshot).
    The fixture is the adversarial mix the 2-label heuristic gets wrong:
    hosts rotate over four suffix classes (``.org`` default-rule,
    ``.co.uk`` / ``.com.au`` ccTLD second-levels, ``.github.io``
    private-section multi-tenant), half behind a ``www.`` subdomain,
    all mixed-case. The heuristic would key every ``.co.uk`` host as
    ``co.uk`` — ONE bucket for the whole country hierarchy — and
    likewise fold every github.io publisher together; the PSL path
    keys each registrant (``site{{k}}.co.uk``) separately, which the
    arithmetic oracle states independently.

    Scale shape: the PSL match is three broadcast hash joins (no
    shuffle, no UDF — `tests/test_public_suffix.py` pins the plan);
    the quota is one per-domain window shuffle, same as
    ``domain_quota_sample``."""
    from bcg_contacts_data_pipeline_spark.functions.public_suffix import (
        from_url,
    )

    docs = _t(spark, sf_dir, "documents")
    suffix = F.elt(
        (F.col("doc_id") % 4).cast("int") + 1,
        *[F.lit(s) for s in _ETLD_SUFFIXES],
    )
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 8 < 4, F.lit("")).otherwise(F.lit("WWW.")),
        F.lit("Site"),
        (F.expr("doc_id DIV 3") % 11).cast("string"),
        suffix,
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = from_url(
        docs.select("doc_id", "n_chars", url.alias("url")), "url", out="domain"
    ).drop("url").withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("rk") <= _ETLD_QUOTA, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.min(F.when(F.col("rk") <= _ETLD_QUOTA, F.col("doc_id"))).alias(
            "first_kept"
        ),
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup: the dedup rung above near-dup.
# ---------------------------------------------------------------------------

_SEM_K = 8
_SEM_TAU = 0.8
#: rep-cap for within-cluster scoring; measured doubled-corpus cluster
#: maxima: 140 at sf0.01, 584 at sf0.1 — idle at every shipped SF, so
#: the uncapped DuckDB oracle applies verbatim (the ann_lsh_capped twin
#: recipe). Engages only on the 100x clone replica, where any clone's
#: original sorts into the cap-smallest-id base and scores 1.0.
_SEM_CAP = 1024


def _semantic_dedup_oracle() -> str:
    dot_ee = _DOT_SQL.format(a="embedding", b="embedding")
    dot_ec = _DOT_SQL.format(a="e.embedding", b="c.cvec")
    dot_xy = _DOT_SQL.format(a="x.embedding", b="y.embedding")
    return f"""
    WITH base AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {_COPY_OFFSET} AS vec_id, embedding FROM embeddings),
    e AS (
      SELECT vec_id, embedding, sqrt({dot_ee}) AS nrm FROM base),
    c AS (
      SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm
      FROM e ORDER BY vec_id LIMIT {_SEM_K}),
    a AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {dot_ec} / (e.nrm * c.cnrm) DESC, c.cid) AS rn
        FROM e, c) WHERE rn = 1),
    m AS (
      SELECT a.vec_id, a.cluster, e.embedding, e.nrm
      FROM a JOIN e USING (vec_id)),
    p AS (
      SELECT x.vec_id, MAX({dot_xy} / (x.nrm * y.nrm)) AS mp
      FROM m x JOIN m y
        ON x.cluster = y.cluster AND y.vec_id < x.vec_id
      GROUP BY x.vec_id)
    SELECT m.vec_id, m.cluster,
           COALESCE(p.mp, -1.0) AS max_prior,
           COALESCE(p.mp, -1.0) < {_SEM_TAU} AS keep
    FROM m LEFT JOIN p ON m.vec_id = p.vec_id
    """


@register("semantic_dedup", oracle=_semantic_dedup_oracle())
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (`operators/similarity.py:
    semantic_dedup`) over the constructed-duplicate corpus (the
    ``minhash_recall`` proof shape): corpus ∪ id-offset copy, so every
    copy has an exact semantic duplicate with a LOWER id — identical
    vectors land in the same cluster for ANY codebook, the copy's
    max-prior cosine is exactly 1.0 >= τ and it must be dropped, while
    every original (no prior above 0.50 on this corpus, measured) must
    be kept. The DuckDB oracle restates the ENTIRE pipeline — seeded
    centroids, cosine assignment with (cos DESC, cid ASC) ties,
    within-cluster lower-id max — so the driver's hash check certifies
    assignment, grouping, scoring and the keep decision bit-for-bit
    (scores on both engines accumulate dimension-sequentially; see
    ``_seq_scores``).

    Scale shape: one broadcast-codebook corpus pass, one shuffle
    (groupBy cluster), per-cluster scoring capped at
    |cluster| x {cap} by the rep-cap (idle at shipped SFs — cluster
    max 584 at sf0.1 vs cap {cap}; engages on the 100x clone replica
    where clusters grow ~100x, exact for clone families)."""
    from bcg_contacts_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    from bcg_contacts_data_pipeline_spark.plans.queries import _emb_with_copy

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_dedup(
        _emb_with_copy(emb),
        "vec_id",
        "embedding",
        n_clusters=_SEM_K,
        threshold=_SEM_TAU,
        max_cluster=_SEM_CAP,
    )


if q_semantic_dedup.__doc__:
    q_semantic_dedup.__doc__ = q_semantic_dedup.__doc__.replace(
        "{cap}", str(_SEM_CAP)
    )


# ---------------------------------------------------------------------------
# IVF capped twin: the 100 TB production path for the IVF ANN family.
# ---------------------------------------------------------------------------

#: member-side cap for per-cell scoring. Measured doubled-corpus cell
#: maxima (16 cells, 1 Lloyd iteration): 74 at sf0.01, 290 at sf0.1 —
#: the cap never triggers at any shipped SF, so the query is
#: bit-identical to `embedding_ann_ivf` and SHARES its
#: constructed-duplicate recall oracle. On the 100x clone replica every
#: clone family concentrates in one cell (identical vectors, identical
#: centroid distances) and uncapped in-cell scoring goes locally
#: quadratic — there the cap routes members to representative scoring
#: (|queries| x cap, exact for clones). Same constant as
#: `embedding_ann_lsh_capped`'s max_bucket.
_IVF_MAX_CELL = 512


@register(
    "embedding_ann_ivf_capped",
    oracle="""
    SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_true,
           CAST(2 * COUNT(*) AS BIGINT) AS n_found,
           CAST(2 * COUNT(*) AS DOUBLE) / (2 * COUNT(*)) AS recall
    FROM embeddings
    """,
)
def q_embedding_ann_ivf_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embedding_ann_ivf`` with the PRODUCTION member-side cap
    (``max_cell=512``): bit-identical to the uncapped baseline at every
    shipped SF (cell max 290 at sf0.1 vs cap 512 — the cap is idle, so
    the constructed-duplicate recall proof and its oracle apply
    verbatim), engaged only by the clone-cell degeneracy the 100x
    scale replica manufactures. This query is the tier-2 scale-probe
    member for the IVF family (VERDICT r11 ask #6); the uncapped
    baseline stays the completeness certificate at 1x/10x. Same twin
    recipe as ``embedding_ann_lsh_capped`` / ``minhash_recall_capped``.
    """
    from bcg_contacts_data_pipeline_spark.operators.similarity import (
        embedding_ann_ivf,
    )
    from bcg_contacts_data_pipeline_spark.plans.queries import (
        _recall_frame,
    )

    from bcg_contacts_data_pipeline_spark.plans.queries import _emb_with_copy

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = embedding_ann_ivf(
        _emb_with_copy(emb),
        "vec_id",
        "embedding",
        n_centroids=16,
        n_probe=4,
        k=5,
        max_cell=_IVF_MAX_CELL,
    )
    pairs = out.select(
        F.col("query_id").alias("id_a"), F.col("neighbor_id").alias("id_b")
    )
    # both truth directions from ONE pass over the id column (r14: the
    # fwd ∪ reversed(fwd) union planned the scan twice)
    truth = emb.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("vec_id").alias("id_a"),
                    (F.col("vec_id") + F.lit(_COPY_OFFSET)).alias("id_b"),
                ),
                F.struct(
                    (F.col("vec_id") + F.lit(_COPY_OFFSET)).alias("id_a"),
                    F.col("vec_id").alias("id_b"),
                ),
            )
        ).alias("__t")
    ).select("__t.id_a", "__t.id_b")
    return _recall_frame(pairs, truth)


# ---------------------------------------------------------------------------
# Batch URL-frontier history dedup: the batch twin of stream_url_dedup.
# ---------------------------------------------------------------------------

from bcg_contacts_data_pipeline_spark.plans.queries_r11 import (  # noqa: E402
    _canonical_url_sql,
    _messy_url,
)


@register(
    "url_frontier_delta",
    # ground truth from the alias-class arithmetic (the
    # url_canonical_dedup recipe): a resource rid's aliases canonicalize
    # to its base URL (+ the sorted-query URL for the %5=4 class);
    # batch = rid % 6 IN (0, 2), history = rid % 3 <> 0, so rid%6==2
    # discoveries are re-discoveries (already in the frontier) and only
    # rid%6==0 canonicals are NEW — stated entirely in event_id math.
    oracle=f"""
    WITH b AS (
      SELECT event_id,
             {_canonical_url_sql("event_id", "Delta", "/page/")} AS cu
      FROM events WHERE (event_id // 5) % 6 IN (0, 2)),
    h AS (
      SELECT DISTINCT
             {_canonical_url_sql("event_id", "Delta", "/page/")} AS cu
      FROM events WHERE (event_id // 5) % 3 <> 0)
    SELECT cu AS canonical_url,
           MIN(event_id) AS first_event,
           CAST(COUNT(*) AS BIGINT) AS n_discoveries
    FROM b WHERE cu NOT IN (SELECT cu FROM h)
    GROUP BY cu
    """,
)
def q_url_frontier_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch URL-frontier HISTORY dedup — the batch twin of
    ``stream_url_dedup`` and the missing half of its disclosed
    semantics: the stream's watermark state is the RECENT frontier
    (refetch window), while global crawl history lives in a persisted
    frontier table that today's discoveries are anti-joined against.
    Fixture: discovered URLs synthesize from event_ids (the
    ``url_canonical_dedup`` five-alias mess classes); the frontier
    history is every resource with ``rid % 3 != 0``, today's discovery
    batch every alias of resources with ``rid % 6 IN (0, 2)`` — so
    rid%6==2 discoveries are RE-discoveries the history filter must
    drop, rid%6==0 resources are genuinely new (two canonicals each:
    the base URL and the sorted-query variant). Output is the frontier
    DELTA: each new canonical URL with its first discovering event and
    discovery count — exactly the rows a daily pipeline appends to the
    frontier table as tomorrow's state.

    Scale shape: the incremental-family contract — in-batch alias
    collapse and the history anti-probe fold into ONE pass keyed on the
    canonical URL (r14, guide §2.4): each qualifying discovery-log row
    canonicalizes once and carries two flags (in today's batch / in the
    frontier history), a single groupBy computes the batch aggregates
    over flagged rows plus ``max(in_history)``, and the anti-join
    becomes a post-aggregation filter — the pre-r14 shape scanned the
    log twice, canonicalized the overlap rows twice, and paid three
    canonical-URL shuffles (batch agg + history DISTINCT + the
    anti-join) for what one map-side-combinable aggregate decides.
    History stays touched only through its canonical index (recomputed
    here from the fixture arithmetic because the oracle needs an
    independent statement of it); at 100 TB the one shuffle is the
    standard new-key probe every crawl scheduler runs."""
    from bcg_contacts_data_pipeline_spark.functions.urls import (
        url_canonicalize,
    )

    ev = _t(spark, sf_dir, "events").select("event_id")
    rid = F.expr("event_id DIV 5")
    canon = url_canonicalize(
        _messy_url("event_id", "Delta", "/page/")
    ).alias("canonical_url")
    in_batch = (rid % 6).isin(0, 2)
    in_hist = rid % 3 != 0

    flagged = ev.filter(in_batch | in_hist).select(
        "event_id", canon, in_batch.alias("__b"), in_hist.alias("__h")
    )
    return (
        flagged.groupBy("canonical_url")
        .agg(
            F.min(F.when(F.col("__b"), F.col("event_id"))).alias(
                "first_event"
            ),
            F.count(F.when(F.col("__b"), F.lit(1))).alias("n_discoveries"),
            F.max("__h").alias("__seen"),
        )
        .filter(~F.col("__seen") & (F.col("n_discoveries") > 0))
        .drop("__seen")
    )


# ---------------------------------------------------------------------------
# Quality-classifier calibration: reliability-diagram bins.
# ---------------------------------------------------------------------------

from bcg_contacts_data_pipeline_spark.plans.queries import (  # noqa: E402
    _STOPLIST_SQL,
    _TOKS_SQL,
)


@register(
    "quality_calibration",
    # the lang_quality oracle's exact-integer-component score, binned
    # into reliability-diagram deciles against the table's labeled lang
    # column; the decimal(27,15) staging makes the per-bin mean of
    # bit-identical doubles associative (engine-exact), the same recipe
    # as every money aggregate in this registry.
    oracle=f"""
    WITH counts AS (
      SELECT doc_id, lang,
             CAST(CASE WHEN length(trim(text)) > 0 THEN len({_TOKS_SQL}) ELSE 0 END AS DOUBLE) AS nt,
             CAST(length(text) AS DOUBLE) AS nc,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS pc,
             CAST(CASE WHEN length(trim(text)) > 0
                  THEN len(list_filter({_TOKS_SQL}, t -> list_contains({_STOPLIST_SQL}, lower(t))))
                  ELSE 0 END AS DOUBLE) AS st
      FROM documents),
    scored AS (
      SELECT doc_id, lang,
             CASE WHEN nt > 0 THEN
               0.4 * least(nt / 100.0, 1.0)
               + 0.3 * least(st / nt * 3.0, 1.0)
               + 0.3 * (1.0 - least(pc / nc * 10.0, 1.0))
             ELSE 0.0 END AS quality
      FROM counts)
    SELECT CAST(least(floor(quality * 10), 9) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(quality AS DECIMAL(27,15))) AS DOUBLE) / COUNT(*)
             AS avg_quality,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_en,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS frac_en
    FROM scored GROUP BY 1
    """,
)
def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram calibration of the quality classifier
    (`functions/text.py:quality_score`) against the corpus's labeled
    ``lang`` column: documents bin by score decile; each bin reports
    its mean score (the classifier's stated confidence) next to the
    observed English rate (what a quality-as-English-proxy signal
    actually delivers). The divergence between ``avg_quality`` and
    ``frac_en`` per bin is the calibration error a curation pipeline
    monitors before trusting a score threshold to gate 100 TB of data
    — the text-analysis family's model-evaluation rung (VERDICT r11
    ask #8 option b).

    Engine-exactness: the score is already bit-identical across
    engines (exact integer components, one IEEE expression); the
    per-bin mean stages the doubles through DECIMAL(27,15) so the sum
    is associative (shuffle-order-proof), then one IEEE division —
    the registry's standard recipe. Scale shape: one scan, one
    groupBy on a 10-value key with map-side partials; AQE coalesces
    the post-shuffle partitions."""
    from bcg_contacts_data_pipeline_spark.functions import text as T

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "lang", T.quality_score("text").alias("quality")
    )
    en = F.when(F.col("lang") == "en", 1).otherwise(0)
    return (
        scored.withColumn(
            "bin",
            F.least(F.floor(F.col("quality") * 10), F.lit(9)).cast("long"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("quality").cast("decimal(27,15)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_quality"),
            F.sum(en).cast("long").alias("n_en"),
            (F.sum(en).cast("double") / F.count(F.lit(1))).alias("frac_en"),
        )
    )
