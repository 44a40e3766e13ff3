"""Shared DuckDB-oracle scaffolds used by more than one round module.

LEAF module by design — imports nothing from this package. The round
modules (`queries_r7b`, `queries_r7c`, `queries_r9`, ...) all import the
registry hub (`plans.queries`), whose tail imports them back; a template
defined in one round module and imported at module level by a later one
re-enters the partially-initialized module when a test imports the
DEFINING module first (Python resolves the hub's tail imports against
sys.modules), raising ImportError on an order nobody controls. Keeping
the shared text here makes every import order safe, and keeps the
original guarantee: two queries built from ONE template cannot silently
drift apart if the session/shingle definition changes.
"""

#: Shared sessionization-oracle scaffold: the CTE chain + projection,
#: parameterized ONLY by the final cutoff predicate. Built on by
#: ``stream_sessions_timeout`` (emitted sessions: the cutoff has passed)
#: and ``statestore_open_sessions`` (the EXACT complement: still open).
SESSIONS_ORACLE_TEMPLATE = """
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
    WHERE {cutoff}
    """

#: Shared exact-Jaccard edge definition (3-gram shingles over whitespace
#: tokens): the CTE chain every jaccard-pairs oracle builds on. ONE text
#: so the edge definition cannot drift between the pair queries and the
#: component queries that cluster the same edges.
_JACCARD_BASE_CTES = """
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
      GROUP BY a.doc_id, b.doc_id)"""

#: Shared exact-Jaccard-pairs oracle scaffold (3-gram shingles, t=0.5),
#: parameterized only by an extra WHERE clause. Built on by
#: ``prefix_jaccard_pairs`` (no restriction) and ``incremental_neardup``
#: (pairs with a new-batch member).
JACCARD_PAIRS_ORACLE_TEMPLATE = _JACCARD_BASE_CTES + """
    SELECT s.id_a, s.id_b, s.shared,
           sa.n AS size_a, sb.n AS size_b,
           CAST(s.shared AS DOUBLE) / CAST(sa.n + sb.n - s.shared AS DOUBLE)
             AS jaccard
    FROM shared s
    JOIN sizes sa ON s.id_a = sa.doc_id
    JOIN sizes sb ON s.id_b = sb.doc_id
    WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n + sb.n - s.shared AS DOUBLE)
          >= 0.5{extra_where}
    """

#: Declarative twin of the incremental_components query: min-label CC,
#: recomputed FROM SCRATCH by recursive CTE, over the union of
#: (a) yesterday's exact-dup star edges among history docs (same text →
#: min-id representative) and (b) today's t=0.5 jaccard edges touching
#: the new batch (doc_id % 10 = 0) — the same shared edge CTEs, so the
#: edge definition cannot drift from the pair queries'.
INCREMENTAL_CC_ORACLE = _JACCARD_BASE_CTES + """,
    jedges AS (
      SELECT s.id_a, s.id_b FROM shared s
      JOIN sizes sa ON s.id_a = sa.doc_id
      JOIN sizes sb ON s.id_b = sb.doc_id
      WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n + sb.n - s.shared AS DOUBLE)
            >= 0.5
        AND (s.id_a % 10 = 0 OR s.id_b % 10 = 0)),
    hrep AS (
      SELECT text, MIN(doc_id) AS m FROM documents
      WHERE doc_id % 10 != 0 GROUP BY text),
    hstar AS (
      SELECT h.m AS id_a, d.doc_id AS id_b
      FROM documents d JOIN hrep h ON d.text = h.text
      WHERE d.doc_id % 10 != 0 AND d.doc_id != h.m),
    edges AS (SELECT id_a, id_b FROM jedges
              UNION ALL SELECT id_a, id_b FROM hstar),
    sym AS (SELECT id_a AS u, id_b AS v FROM edges
            UNION SELECT id_b, id_a FROM edges),
    reach AS (
      WITH RECURSIVE r(node, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.v, r.lab FROM r JOIN sym s ON s.u = r.node)
      SELECT node, MIN(lab) AS comp FROM r GROUP BY node)
    SELECT node AS doc_id, comp FROM reach
    """

#: Declarative twin of the incremental_curation_e2e composition: the
#: hash-dedup adjudication (batch docs anchor to the base representative
#: or the batch minimum of their normalized content), the retained-graph
#: components recomputed FROM SCRATCH by recursive CTE over the same
#: shared jaccard-edge CTEs plus the history hash-star, and dropped docs
#: inheriting their anchor's component. Built on the same edge scaffold
#: as every other jaccard oracle so the edge definition cannot drift.
#: Component labels are min ids over RETAINED nodes (history +
#: survivors) — a dropped doc's id never becomes a canonical label,
#: exactly the semantics a curation pipeline wants (canonical = a doc
#: you kept).
INCREMENTAL_CURATION_ORACLE = _JACCARD_BASE_CTES + """,
    nk AS (
      SELECT doc_id,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS h
      FROM documents),
    base_rep AS (
      SELECT h, MIN(doc_id) AS m FROM nk
      WHERE doc_id % 10 != 0 AND h IS NOT NULL GROUP BY h),
    adjud AS (
      SELECT n.doc_id,
             CASE WHEN br.m IS NOT NULL THEN br.m
                  WHEN n.h IS NOT NULL
                       AND n.doc_id <> MIN(n.doc_id)
                                       OVER (PARTITION BY n.h)
                       THEN MIN(n.doc_id) OVER (PARTITION BY n.h)
             END AS anchor
      FROM nk n LEFT JOIN base_rep br ON n.h = br.h
      WHERE n.doc_id % 10 = 0),
    retained AS (
      SELECT doc_id FROM nk WHERE doc_id % 10 != 0
      UNION ALL
      SELECT doc_id FROM adjud WHERE anchor IS NULL),
    jedges AS (
      SELECT s.id_a, s.id_b FROM shared s
      JOIN sizes sa ON s.id_a = sa.doc_id
      JOIN sizes sb ON s.id_b = sb.doc_id
      WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n + sb.n - s.shared AS DOUBLE)
            >= 0.5
        AND s.id_a IN (SELECT doc_id FROM retained)
        AND s.id_b IN (SELECT doc_id FROM retained)
        AND (s.id_a % 10 = 0 OR s.id_b % 10 = 0)),
    hstar AS (
      SELECT br.m AS id_a, n.doc_id AS id_b
      FROM nk n JOIN base_rep br ON n.h = br.h
      WHERE n.doc_id % 10 != 0 AND n.doc_id <> br.m),
    edges AS (SELECT id_a, id_b FROM jedges
              UNION ALL SELECT id_a, id_b FROM hstar),
    sym AS (SELECT id_a AS u, id_b AS v FROM edges
            UNION SELECT id_b, id_a FROM edges),
    reach AS (
      WITH RECURSIVE r(node, lab) AS (
        SELECT doc_id, doc_id FROM retained
        UNION
        SELECT s.v, r.lab FROM r JOIN sym s ON s.u = r.node)
      SELECT node, MIN(lab) AS comp FROM r GROUP BY node)
    SELECT node AS doc_id, comp FROM reach
    UNION ALL
    SELECT a.doc_id, r.comp FROM adjud a JOIN reach r ON a.anchor = r.node
    WHERE a.anchor IS NOT NULL
    """
