"""Round-13 surface: exact substring (span) dedup — the suffix-array
rung of the dedup ladder (VERDICT r12 ask #8).

The ladder so far covers URL, document (exact hash), paragraph,
MinHash/SimHash near-dup, and semantic (SemDeDup) dedup; the remaining
literature rung is Lee et al. 2022's exact substring dedup — duplicated
token spans >= N tokens shared across otherwise-different documents
(licence blocks, quoted passages, templated boilerplate). The operator
(`operators/dedup.py:substring_spans`) re-expresses the suffix-array
construction as k-gram fingerprint postings + per-diagonal maximal-run
merge, exact for every span >= k tokens and df-capped like every pair
generator in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.operators.dedup import (
    substring_spans,
    substring_trim,
)
from bcg_contacts_data_pipeline_spark.plans.queries import _t, register

_SS_K = 8
_SS_MIN_LEN = 15
_SS_MAX_DF = 64


@register(
    "substring_dedup",
    # The oracle restates the whole pipeline in DuckDB: same single-space
    # tokenization, same md5 gram fingerprints, same 2..max_df df-cap,
    # same diagonal/island run merge — so the hash check certifies every
    # stage (postings, cap, pair join, window arithmetic) end to end.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, str_split(trim(text), ' ') AS t
      FROM documents WHERE text IS NOT NULL
    ), grams AS (
      SELECT doc_id, i,
             md5(array_to_string(t[i:i+{_SS_K}-1], ' ')) AS g
      FROM toks, unnest(range(1, len(t)-{_SS_K}+2)) AS r(i)
      WHERE len(t) >= {_SS_K}
    ), keep AS (
      SELECT g FROM grams GROUP BY g
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {_SS_MAX_DF}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.i AS ia, b.i AS ib
      FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
      WHERE a.doc_id < b.doc_id
    ), runs AS (
      SELECT doc_a, doc_b, ia, ib, ia - ib AS diag,
             ia - row_number() OVER (PARTITION BY doc_a, doc_b, ia - ib
                                     ORDER BY ia) AS run
      FROM pairs
    ), spans AS (
      SELECT doc_a, doc_b, MIN(ia) AS a_start, MIN(ib) AS b_start,
             MAX(ia) - MIN(ia) + {_SS_K} AS len_tokens
      FROM runs GROUP BY doc_a, doc_b, diag, run
    )
    SELECT doc_a, doc_b,
           CAST(a_start AS BIGINT) AS a_start,
           CAST(b_start AS BIGINT) AS b_start,
           CAST(len_tokens AS BIGINT) AS len_tokens
    FROM spans WHERE len_tokens >= {_SS_MIN_LEN}
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans >= {min_len} tokens across the
    documents corpus (k-gram postings + diagonal run merge — see
    `operators/dedup.py:substring_spans` for the full scale design).
    Reference scope note: the reference pipeline is contacts-TSV only;
    this is beyond-reference training-data surface (Lee et al. 2022)."""
    spans = substring_spans(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        k=_SS_K,
        min_len=_SS_MIN_LEN,
        max_df=_SS_MAX_DF,
    )
    # House convention for growth-bound outputs (r13 post-close hygiene
    # rule, extended to the find-half per VERDICT r13 ask #1): NO global
    # orderBy — the span output is exactly what grows fastest with
    # duplication (the query's own 100x SCALE row is output-bound), so a
    # range shuffle of it is pure waste and the compare is
    # order-insensitive anyway.
    return spans.select(
        "doc_a",
        "doc_b",
        F.col("a_start").cast("long").alias("a_start"),
        F.col("b_start").cast("long").alias("b_start"),
        F.col("len_tokens").cast("long").alias("len_tokens"),
    )


@register(
    "substring_dedup_trim",
    # Same full-pipeline restatement as substring_dedup, extended by the
    # coverage expansion, the anti-join, and the ordered rebuild — so
    # the hash check certifies the trim semantics (keep the lowest-id
    # occurrence, drop covered tokens everywhere else) end to end.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, str_split(trim(text), ' ') AS t
      FROM documents WHERE text IS NOT NULL
    ), grams AS (
      SELECT doc_id, i,
             md5(array_to_string(t[i:i+{_SS_K}-1], ' ')) AS g
      FROM toks, unnest(range(1, len(t)-{_SS_K}+2)) AS r(i)
      WHERE len(t) >= {_SS_K}
    ), keep AS (
      SELECT g FROM grams GROUP BY g
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {_SS_MAX_DF}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.i AS ia, b.i AS ib
      FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
      WHERE a.doc_id < b.doc_id
    ), runs AS (
      SELECT doc_a, doc_b, ia, ib, ia - ib AS diag,
             ia - row_number() OVER (PARTITION BY doc_a, doc_b, ia - ib
                                     ORDER BY ia) AS run
      FROM pairs
    ), spans AS (
      SELECT doc_a, doc_b, MIN(ia) AS a_start, MIN(ib) AS b_start,
             MAX(ia) - MIN(ia) + {_SS_K} AS len_tokens
      FROM runs GROUP BY doc_a, doc_b, diag, run
      HAVING MAX(ia) - MIN(ia) + {_SS_K} >= {_SS_MIN_LEN}
    ), covered AS (
      SELECT DISTINCT doc_b AS doc_id, b_start + u.i AS p
      FROM spans, unnest(range(0, len_tokens)) AS u(i)
    ), pos AS (
      SELECT doc_id, i AS p, t[i] AS tok
      FROM toks, unnest(range(1, len(t)+1)) AS r(i)
    ), kept AS (
      SELECT pos.doc_id, pos.p, pos.tok
      FROM pos ANTI JOIN covered USING (doc_id, p)
    )
    SELECT toks.doc_id,
           CAST(len(toks.t) AS BIGINT) AS n_tokens,
           CAST(len(toks.t) - COUNT(kept.p) AS BIGINT) AS dup_tokens,
           md5(COALESCE(string_agg(kept.tok, ' ' ORDER BY kept.p), ''))
             AS trim_md5
    FROM toks LEFT JOIN kept ON kept.doc_id = toks.doc_id
    GROUP BY toks.doc_id, len(toks.t)
    """,
)
def q_substring_dedup_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRIM half of Lee et al. 2022 (`operators/dedup.py:
    substring_trim`): every document rebuilt with its cross-document
    duplicated spans removed, first (lowest-id) occurrence kept.
    Completes the find->trim pair begun by ``substring_dedup``.
    House conventions for corpus-sized outputs (the paragraph_dedup
    precedent): NO global orderBy (a full range shuffle of the rebuilt
    corpus buys nothing — the compare is order-insensitive), and the
    rebuilt text ships as its md5 so the compare payload stays
    fixed-width."""
    out = substring_trim(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        k=_SS_K,
        min_len=_SS_MIN_LEN,
        max_df=_SS_MAX_DF,
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "dup_tokens",
        F.md5("text_trimmed").alias("trim_md5"),
    )


_GR_TOP_N, _GR_DUP_N = 2, 6
_GR_TOP_MAX, _GR_DUP_MAX = 0.20, 0.14


@register(
    "gopher_repetition",
    # Full-pipeline restatement: same tokenization, same md5 grams, the
    # max-count top-gram mass, and the DISTINCT-position duplicated-gram
    # coverage — certifying the overlap-safe coverage arithmetic and
    # both keep thresholds end to end.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, str_split(trim(text), ' ') AS t,
             len(str_split(trim(text), ' ')) AS n
      FROM documents WHERE text IS NOT NULL
    ), g2 AS (
      SELECT doc_id, n, i,
             md5(array_to_string(t[i:i+{_GR_TOP_N}-1], ' ')) AS g
      FROM toks, unnest(range(1, len(t)-{_GR_TOP_N}+2)) AS r(i)
      WHERE n >= {_GR_TOP_N}
    ), top AS (
      SELECT doc_id, MAX(c) * {_GR_TOP_N} AS top_toks
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g)
      GROUP BY doc_id
    ), g6 AS (
      SELECT doc_id, i,
             md5(array_to_string(t[i:i+{_GR_DUP_N}-1], ' ')) AS g
      FROM toks, unnest(range(1, len(t)-{_GR_DUP_N}+2)) AS r(i)
      WHERE n >= {_GR_DUP_N}
    ), dup AS (
      SELECT doc_id, g FROM g6 GROUP BY doc_id, g HAVING COUNT(*) >= 2
    ), cov AS (
      SELECT doc_id, COUNT(*) AS covered FROM (
        SELECT DISTINCT g6.doc_id, g6.i + u.o AS p
        FROM g6 JOIN dup USING (doc_id, g),
             unnest(range(0, {_GR_DUP_N})) AS u(o)
      ) GROUP BY doc_id
    )
    SELECT toks.doc_id,
           CAST(toks.n AS BIGINT) AS n_tokens,
           CASE WHEN toks.n > 0
                THEN COALESCE(top.top_toks, 0) * 1.0 / toks.n
                ELSE 0.0 END AS top_frac,
           CASE WHEN toks.n > 0
                THEN COALESCE(cov.covered, 0) * 1.0 / toks.n
                ELSE 0.0 END AS dup_frac,
           (COALESCE(top.top_toks, 0) * 1.0 / toks.n <= {_GR_TOP_MAX}
            AND COALESCE(cov.covered, 0) * 1.0 / toks.n <= {_GR_DUP_MAX})
             AS keep
    FROM toks
    LEFT JOIN top USING (doc_id)
    LEFT JOIN cov USING (doc_id)
    """,
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition quality filters (`operators/profile.py:
    gopher_repetition`): top-2-gram token mass + duplicated-6-gram
    position coverage per document, with the paper's keep thresholds.
    The within-document rung of the quality family — catches repetition
    no cross-document dedup can see."""
    from bcg_contacts_data_pipeline_spark.operators.profile import (
        gopher_repetition,
    )

    return gopher_repetition(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        top_n=_GR_TOP_N,
        dup_n=_GR_DUP_N,
        top_frac_max=_GR_TOP_MAX,
        dup_frac_max=_GR_DUP_MAX,
    )  # no global orderBy: corpus-sized output, order-insensitive compare
