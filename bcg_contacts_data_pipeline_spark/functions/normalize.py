"""Scalar normalization expression library (SURVEY.md §2.5, F1–F14).

Every function takes a column (or name) and returns a pure Catalyst
``Column`` — zero Python UDFs, so the whole library runs JVM-side inside
whole-stage codegen and is safe in any 100 TB-scale hot path.

Reference semantics these reproduce (file:line cites into
/root/reference):

- F1  norm_email        cleaning/clean_contacts.py:103-109, utils/validators.py:3-4
- F2  digits_only       cleaning/clean_contacts.py:112-114
- F3  norm_phone        cleaning/fill_missing_contacts.py:14-21 (last-10 canonical)
- F4  phone_valid       cleaning/validate_fields.py:18-22 (7..15 digits)
- F5  title_case        cleaning/clean_contacts.py:117-120 (pandas str.title parity)
- F7  yn_flag           cleaning/clean_contacts.py:129-147
- F8  norm_ws           cleaning/fill_missing_contacts.py:8-12
- F9  full_name         cleaning/fill_missing_contacts.py:23-32
- F10 parse_ts          cleaning/clean_contacts.py:151 (coerce -> NULL)
- F13 nullify_sentinels cleaning/clean_contacts.py:206 ('', 'nan', 'None', 'NaN')
- F14 longest_valid     cleaning/clean_contacts.py:217 (max by length)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: String values the reference treats as null-equivalent
#: (clean_contacts.py:206). The empty string is handled via trim().
SENTINELS = ("", "nan", "None", "NaN")

#: Anchored prefix-match email pattern. The reference uses ``re.match``
#: (prefix-anchored); Spark ``rlike`` is a *search*, so the ``^`` anchor is
#: load-bearing (SURVEY §7.4).
EMAIL_PATTERN = r"^[^@]+@[^@]+\.[^@]+"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def nullify_sentinels(c: Column | str) -> Column:
    """F13 — map '', 'nan', 'None', 'NaN' (after trim) to real SQL NULL.

    Applied at ingest so the reference's two null conventions ('' vs NaN,
    SURVEY §1.2) unify into one.
    """
    c = _col(c)
    return F.when(F.trim(c).isin(*SENTINELS), F.lit(None).cast("string")).otherwise(c)


def norm_email(c: Column | str) -> Column:
    """F1 — trim+lower, keep iff it matches the anchored email regex, else NULL."""
    e = F.lower(F.trim(_col(c)))
    return F.when(e.rlike(EMAIL_PATTERN), e).otherwise(F.lit(None).cast("string"))


def digits_only(c: Column | str) -> Column:
    """F2 — strip every non-digit character."""
    return F.regexp_replace(_col(c), "[^0-9]", "")


def norm_phone(c: Column | str) -> Column:
    """F3 — canonical match key: digits only; if >= 10 digits keep the LAST 10.

    This is a *match-key* transform only; stored phone values keep full
    digits (SURVEY §7.4).
    """
    d = digits_only(c)
    return (
        F.when(F.length(d) >= 10, F.substring(d, -10, 10))
        .when(F.length(d) > 0, d)
        .otherwise(F.lit(None).cast("string"))
    )


def phone_valid(c: Column | str, lo: int = 7, hi: int = 15) -> Column:
    """F4 — boolean: digit-count within [lo, hi]. Empty/null counts as invalid
    here; callers that allow-empty guard with isNull checks (validate rules)."""
    n = F.length(digits_only(c))
    return (n >= F.lit(lo)) & (n <= F.lit(hi))


def title_case(c: Column | str) -> Column:
    """F5 — pandas ``str.title()`` parity: uppercase every letter that follows
    a non-letter, lowercase the rest (so ``o'brien`` -> ``O'Brien``, unlike
    Spark ``initcap`` which only splits on whitespace).

    Pure-expression implementation: split at every letter/non-letter
    boundary (lookaround split keeps all characters), capitalize each
    letter-run, re-join.
    """
    c = _col(c)
    parts = F.split(c, r"(?<=[^A-Za-z])(?=[A-Za-z])|(?<=[A-Za-z])(?=[^A-Za-z])")
    fixed = F.transform(
        parts,
        lambda p: F.when(
            p.rlike("^[A-Za-z]"),
            F.concat(
                F.upper(p.substr(F.lit(1), F.lit(1))),
                F.lower(p.substr(F.lit(2), F.length(p))),
            ),
        ).otherwise(p),
    )
    return F.array_join(fixed, "")


def trim_clean(c: Column | str) -> Column:
    """F6 — plain trim (address/postcode cleanup)."""
    return F.trim(_col(c))


def yn_flag(c: Column | str) -> Column:
    """F7 — tri-valued boolean: upper+trim, keep iff in {Y, N}, else NULL."""
    u = F.upper(F.trim(_col(c)))
    return F.when(u.isin("Y", "N"), u).otherwise(F.lit(None).cast("string"))


def norm_ws(c: Column | str) -> Column:
    """F8 — collapse internal whitespace, trim, lowercase (the name match key)."""
    return F.lower(F.trim(F.regexp_replace(_col(c), r"\s+", " ")))


def full_name(
    first: Column | str, last: Column | str, *fallbacks: Column | str
) -> Column:
    """F9 — `first + ' ' + last` trimmed; empty -> fall back to fullname cols."""
    joined = F.trim(F.concat_ws(" ", _col(first), _col(last)))
    candidates = [F.when(F.length(joined) > 0, joined)]
    candidates.extend(F.when(F.length(F.trim(_col(fb))) > 0, F.trim(_col(fb))) for fb in fallbacks)
    return F.coalesce(*candidates)


def norm_name(first: Column | str, last: Column | str, *fallbacks: Column | str) -> Column:
    """Join-key name normalization: full_name then whitespace-collapse+lower
    (the shared key contract of J1–J3, SURVEY §2.3)."""
    return norm_ws(full_name(first, last, *fallbacks))


def parse_ts(c: Column | str) -> Column:
    """F10 — timestamp parse with coerce-to-NULL semantics (pd.to_datetime
    errors='coerce'). ``try_to_timestamp`` so ANSI mode (Spark 4 default)
    still yields NULL on unparseable input instead of raising."""
    return F.try_to_timestamp(_col(c))


def to_number(c: Column | str, dtype: str = "double") -> Column:
    """F12 — numeric coerce (pd.to_numeric errors='coerce'): NULL on failure,
    ANSI-safe via try_cast."""
    return _col(c).try_cast(dtype)


def is_valid_value(c: Column | str) -> Column:
    """True iff the value is non-null and not a sentinel (merge-eligibility
    test used by the most-complete-record merge, clean_contacts.py:204-216)."""
    c = _col(c)
    return c.isNotNull() & ~F.trim(c.cast("string")).isin(*SENTINELS)


def longest_valid(c: Column | str, tiebreak: Column | str | None = None) -> Column:
    """F14 — aggregate: the longest valid (non-sentinel) value in the group.

    ``tiebreak`` must make the ordering total (e.g. a recency rank negated,
    or a unique id) so results are deterministic under distributed
    aggregation; without it Spark's max_by tie choice is unspecified.
    """
    c = _col(c)
    valid = is_valid_value(c)
    length = F.when(valid, F.length(c.cast("string")))
    if tiebreak is not None:
        order = F.when(valid, F.struct(F.length(c.cast("string")).alias("l"), _col(tiebreak).alias("t")))
        return F.max_by(F.when(valid, c), order)
    return F.max_by(F.when(valid, c), length)
