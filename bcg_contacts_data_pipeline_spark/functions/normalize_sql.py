"""SQL-text twins of the normalize.py scalar library, for WIDE projections.

Why this module exists: every pyspark Column method call is a py4j
round-trip (~0.15 ms of socket latency). Building the 88-column cleaning
projection with the Column API costs ~30 round-trips per column and
resolves to *seconds* of driver time per pipeline build (profiled: 44k
round-trips, ~9 s of a 12 s warm contacts_pipeline_e2e run). Building the
same expression as ONE SQL string per column (or one ``selectExpr`` for
the whole projection) collapses that to a handful of calls; the JVM-side
SQL parser is orders of magnitude faster than the socket.

Contract: each ``*_sql`` builder takes SQL expression TEXT (a quoted
column name or a nested builder's output) and must produce exactly the
same Catalyst semantics as its normalize.py twin. That equivalence is
pinned by tests/test_normalize_sql.py, which evaluates both twins
side-by-side over an adversarial corpus — the two representations cannot
drift without a red test.

Regex literals avoid backslashes (`[.]` not `\\.`, `[0-9]` not `\\d`)
wherever possible so SQL string-literal escaping can't corrupt them; the
one unavoidable ``\\s`` is double-escaped and covered by the twin tests.

These builders back the reference's hot cleaning path
(clean_contacts.py:88-155, 194-223); the Column API in normalize.py
remains the public composable surface (F1-F14).
"""

from __future__ import annotations

from bcg_contacts_data_pipeline_spark.functions.normalize import (  # noqa: F401
    SENTINELS,
)

#: `IN`-list form of normalize.SENTINELS — single source for both twins
#: would be circular text; the twin test pins them equal instead.
SENTINEL_IN = "('', 'nan', 'None', 'NaN')"

#: EMAIL_PATTERN with `\.` rewritten `[.]` (backslash-free, same regex).
EMAIL_PATTERN_SQL = "^[^@]+@[^@]+[.][^@]+"


def q(name: str) -> str:
    """Backtick-quote a column NAME for safe embedding in SQL text."""
    return "`" + name.replace("`", "``") + "`"


def nullify_sentinels_sql(e: str) -> str:
    """F13 twin — '', 'nan', 'None', 'NaN' (after trim) -> NULL."""
    return (
        f"CASE WHEN trim({e}) IN {SENTINEL_IN} "
        f"THEN CAST(NULL AS STRING) ELSE {e} END"
    )


def norm_email_sql(e: str) -> str:
    """F1 twin — trim+lower, anchored-regex validated, else NULL."""
    low = f"lower(trim({e}))"
    return (
        f"CASE WHEN {low} RLIKE '{EMAIL_PATTERN_SQL}' "
        f"THEN {low} ELSE CAST(NULL AS STRING) END"
    )


def digits_only_sql(e: str) -> str:
    """F2 twin — strip non-digits."""
    return f"regexp_replace({e}, '[^0-9]', '')"


def title_case_sql(e: str) -> str:
    """F5 twin — pandas str.title() parity via boundary split."""
    boundary = "(?<=[^A-Za-z])(?=[A-Za-z])|(?<=[A-Za-z])(?=[^A-Za-z])"
    return (
        f"array_join(transform(split({e}, '{boundary}'), "
        "p -> CASE WHEN p RLIKE '^[A-Za-z]' "
        "THEN concat(upper(substring(p, 1, 1)), lower(substring(p, 2))) "
        "ELSE p END), '')"
    )


def yn_flag_sql(e: str) -> str:
    """F7 twin — keep upper(trim(e)) iff in {Y, N}, else NULL."""
    u = f"upper(trim({e}))"
    return (
        f"CASE WHEN {u} IN ('Y', 'N') THEN {u} "
        "ELSE CAST(NULL AS STRING) END"
    )


def norm_ws_sql(e: str) -> str:
    """F8 twin — collapse whitespace, trim, lower."""
    return f"lower(trim(regexp_replace({e}, '\\\\s+', ' ')))"


def parse_ts_sql(e: str) -> str:
    """F10 twin — coerce-to-NULL timestamp parse."""
    return f"try_to_timestamp({e})"


def int_preserve_sql(e: str) -> str:
    """F11 twin — strip a float-inference '.0' suffix from whole numbers
    (clean_contacts.py:26-54)."""
    return (
        f"CASE WHEN {e} RLIKE '^-?[0-9]+[.]0+$' "
        f"THEN regexp_replace({e}, '[.]0+$', '') ELSE {e} END"
    )


def is_valid_value_sql(e: str) -> str:
    """Merge-eligibility twin — non-null and not a sentinel."""
    return (
        f"({e} IS NOT NULL AND "
        f"trim(CAST({e} AS STRING)) NOT IN {SENTINEL_IN})"
    )


def longest_valid_agg_sql(col_name: str, order_e: str) -> str:
    """F14 twin as an AGGREGATE expression string: max_by of the valid
    value under (length, order) — the per-column body of
    most_complete_merge. ``order_e`` is SQL text for the recency rank."""
    c = q(col_name)
    valid = is_valid_value_sql(c)
    return (
        f"max_by(CASE WHEN {valid} THEN {c} END, "
        f"CASE WHEN {valid} THEN named_struct("
        f"'l', length(CAST({c} AS STRING)), 'o', {order_e}) END) AS {c}"
    )
