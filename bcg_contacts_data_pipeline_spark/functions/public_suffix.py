"""eTLD+1 (registrable domain) via a checked-in public-suffix snapshot.

The crawl-quota key done right: `functions/urls.py:url_registered_domain`
is a last-two-labels heuristic, and on any ccTLD corpus it collapses
every ``*.co.uk`` site into ONE quota bucket (``shop.example.co.uk`` ->
``co.uk``), inverting the purpose of per-domain quota sampling. This
module implements the Public Suffix List algorithm
(https://publicsuffix.org/list/ — find the prevailing rule, the public
suffix is the rule's labels, the registrable domain is the suffix plus
one preceding label) against the snapshot in
`public_suffix_data.py`, as a BROADCAST suffix-match join:

- the snapshot parses into one tiny table (rule, label count, kind
  flags) — KB-scale, broadcast to every executor;
- the host's candidate suffixes (its last 1..max_rule_labels dot-label
  runs) each probe the table with one broadcast LEFT join — equality on
  the candidate string, so Catalyst keeps everything JVM-side with NO
  shuffle and the scan stays a narrow projection;
- prevailing-rule arithmetic (exception beats all; else the longest of
  exact / wildcard / the PSL default rule ``*``) is a pure Column
  expression over the joined flags.

Scale: cost is ``max_rule_labels`` (3 for the shipped snapshot)
broadcast hash joins per row — each probe a hash lookup into a
few-hundred-entry table, no shuffle, no UDF. At 100 TB the suffix
table is still KB; a full PSL refresh (~10k rules) changes nothing
structurally.

Semantics notes (disclosed, matching the PSL spec):
- a host that IS a public suffix (``co.uk``) has no registrable domain
  -> NULL;
- a host under an unlisted TLD falls back to the PSL default rule ``*``
  (the TLD is the suffix), i.e. eTLD+1 = last two labels — exactly the
  heuristic, now as the documented fallback instead of the whole story;
- IP-literal hosts are out of scope (the PSL defines none; dots in an
  IPv4 are not labels) — quarantine upstream if the corpus has them;
- a trailing dot on the host (rare but legal) is stripped before
  matching.

SNAPSHOT SUBSET POLICY (disclosed): the checked-in snapshot in
`public_suffix_data.py` is a compact curated SUBSET (~400 lines) of
the full upstream list (~10k rules). Every rule it contains is exact
upstream text, so hosts under covered TLDs resolve exactly; a host
under a ccTLD ABSENT from the snapshot silently takes the PSL default
rule ``*`` — i.e. eTLD+1 = last two labels — which is WRONG for
multi-level registries not in the subset (e.g. ``.ke``'s ``co.ke``
is not shipped, so ``shop.example.co.ke`` -> ``co.ke`` instead of
``example.co.ke``). This is the documented failure mode, pinned by
``tests/test_public_suffix.py``. Refresh procedure: paste the full
https://publicsuffix.org/list/ text over ``SNAPSHOT`` (or pass it as
the ``snapshot=`` argument) — :func:`parse_snapshot` handles the full
format (comments, wildcards, exceptions, private section) unchanged,
and the broadcast table stays KB-scale either way.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.functions.public_suffix_data import (
    SNAPSHOT,
)
from bcg_contacts_data_pipeline_spark.functions.urls import url_host


def parse_snapshot(
    text: str | None = None,
) -> tuple[set[str], set[str], set[str]]:
    """PSL line format -> (exact rules, wildcard bases, exception rules).

    A wildcard rule ``*.bar`` is stored as its base ``bar``; an
    exception ``!foo.bar`` as ``foo.bar``. Comments (``//``) and blank
    lines are skipped; rules are lowercased (the PSL is already
    lowercase, but a pasted refresh should not silently miss matches).
    """
    exact: set[str] = set()
    wild: set[str] = set()
    exc: set[str] = set()
    for raw in (text if text is not None else SNAPSHOT).splitlines():
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            exc.add(line[1:])
        elif line.startswith("*."):
            wild.add(line[2:])
        else:
            exact.add(line)
    return exact, wild, exc


#: snapshot text -> (owning session, table, max_n): the parsed table is
#: deterministic and tiny, so re-parsing + re-planning it per operator
#: call is pure fixed overhead; memoizing keeps repeat callers (every
#: quota query in a bench run) at zero setup cost. The owning session
#: rides along and is identity-checked on every hit: a DataFrame bound
#: to a stopped/replaced SparkSession must never be served to a new one
#: (id()-keyed caches can alias a recycled address; the full snapshot
#: string as key also rules out hash collisions). BOUNDED (r12 advice):
#: an LRU capped at ``_TABLE_CACHE_MAX`` so distinct snapshot strings
#: can't grow it without limit, and every access sweeps out entries
#: whose owning session has been stopped (a stopped SparkContext's
#: ``_jsc`` is None) so dead sessions aren't pinned until a same-key
#: rebuild happens to evict them.
_TABLE_CACHE: OrderedDict[str, tuple[SparkSession, DataFrame, int]] = (
    OrderedDict()
)
_TABLE_CACHE_MAX = 8


def _sweep_table_cache() -> None:
    dead = []
    for key, (sess, _df, _n) in _TABLE_CACHE.items():
        try:
            stopped = sess.sparkContext._jsc is None
        except Exception:
            stopped = True
        if stopped:
            dead.append(key)
    for key in dead:
        del _TABLE_CACHE[key]


def suffix_table(
    spark: SparkSession, snapshot: str | None = None
) -> tuple[DataFrame, int]:
    """The snapshot as a joinable table: one row per distinct rule
    string with kind flags (a string can be several kinds — ``city.
    kawasaki.jp`` is an exception while ``kawasaki.jp`` is a wildcard
    base), plus the max label count across rules (how many candidate
    lengths :func:`with_registered_domain` must probe: wildcards and
    exceptions count the labels their MATCH consumes — base+1 for a
    wildcard — not the stored string's). Memoized per (session,
    snapshot)."""
    key = snapshot if snapshot is not None else SNAPSHOT
    _sweep_table_cache()
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        _TABLE_CACHE.move_to_end(key)
        return hit[1], hit[2]
    exact, wild, exc = parse_snapshot(snapshot)
    rows = sorted(
        {
            (r, r in exact, r in wild, r in exc)
            for r in (exact | wild | exc)
        }
    )
    df = spark.createDataFrame(
        rows, "rule string, is_exact boolean, is_wild boolean, is_exc boolean"
    )
    labels = lambda r: r.count(".") + 1  # noqa: E731
    max_n = max(
        [labels(r) for r in exact]
        + [labels(r) + 1 for r in wild]
        + [labels(r) for r in exc]
        + [1]
    )
    _TABLE_CACHE[key] = (spark, df, max_n)
    _TABLE_CACHE.move_to_end(key)
    while len(_TABLE_CACHE) > _TABLE_CACHE_MAX:
        _TABLE_CACHE.popitem(last=False)
    return df, max_n


def with_registered_domain(
    df: DataFrame,
    host: Column | str,
    out: str = "registered_domain",
    snapshot: str | None = None,
) -> DataFrame:
    """Append the PSL registrable domain (eTLD+1) of ``host`` as ``out``.

    ``host`` is a Column (or column name) holding the bare host; for a
    URL column use :func:`from_url`. NULL host -> NULL out; host equal
    to a public suffix -> NULL out (nothing registrable).

    Plan shape: lowercases/splits the host once, builds the last-n-label
    candidate strings for n = 1..max_rule_labels, probes each against
    the broadcast suffix table with a LEFT join, then resolves the
    prevailing rule as a Column expression. No shuffle, no UDF; the
    helper columns are dropped before return.

    Name hygiene (r12 advice): ``__psl_``-prefixed input columns are
    rejected up front (they would silently collide with the internal
    helper columns and surface only as an ambiguous-reference error at
    resolution time), and a pre-existing column named ``out`` is
    REPLACED (dropped before the result is appended) rather than
    duplicated.
    """
    if any(c.startswith("__psl_") for c in df.columns):
        bad = [c for c in df.columns if c.startswith("__psl_")]
        raise ValueError(
            f"with_registered_domain: input columns {bad} collide with "
            "the reserved __psl_ helper-column namespace — rename them "
            "before calling"
        )
    spark = df.sparkSession
    sfx, max_n = suffix_table(spark, snapshot)

    host_c = F.col(host) if isinstance(host, str) else host
    h = F.regexp_replace(F.lower(host_c), r"\.$", "")
    h = F.when(F.length(h) > 0, h)
    parts = F.split(h, r"\.")
    m = F.size(parts)

    work = df.select(
        "*",
        parts.alias("__psl_parts"),
        m.alias("__psl_m"),
        *[
            F.when(
                m >= n, F.concat_ws(".", F.slice(parts, -n, n))
            ).alias(f"__psl_c{n}")
            for n in range(1, max_n + 1)
        ],
    )
    for n in range(1, max_n + 1):
        probe = F.broadcast(
            sfx.select(
                F.col("rule").alias(f"__psl_r{n}"),
                F.col("is_exact").alias(f"__psl_x{n}"),
                F.col("is_wild").alias(f"__psl_w{n}"),
                F.col("is_exc").alias(f"__psl_e{n}"),
            )
        )
        work = work.join(
            probe, work[f"__psl_c{n}"] == probe[f"__psl_r{n}"], "left"
        )

    true_ = lambda c: F.coalesce(c, F.lit(False))  # noqa: E731
    m_c = F.col("__psl_m")
    # exception rule: the rule string itself is registrable — its public
    # suffix is the rule minus the leading label.
    exc_len = F.greatest(
        *[
            F.when(true_(F.col(f"__psl_e{n}")), F.lit(n))
            for n in range(1, max_n + 1)
        ],
        F.lit(0),
    )
    exact_len = F.greatest(
        *[
            F.when(true_(F.col(f"__psl_x{n}")), F.lit(n))
            for n in range(1, max_n + 1)
        ],
        F.lit(1),  # the PSL default rule `*`: the TLD is the suffix
    )
    # wildcard base matched at n labels covers hosts with >= n+1 labels;
    # a host with exactly n labels equals the base itself, where only
    # the base's own exact/default rules apply.
    wild_len = F.greatest(
        *[
            F.when(
                true_(F.col(f"__psl_w{n}")) & (m_c >= n + 1), F.lit(n + 1)
            )
            for n in range(1, max_n + 1)
        ],
        F.lit(0),
    )
    ps_len = F.when(exc_len > 0, exc_len - 1).otherwise(
        F.greatest(exact_len, wild_len)
    )
    reg = F.when(
        m_c >= ps_len + 1,
        F.concat_ws(
            ".", F.slice(F.col("__psl_parts"), -(ps_len + 1), ps_len + 1)
        ),
    )
    keep = [c for c in df.columns if c != out]
    return work.select(*keep, reg.alias(out))


def from_url(
    df: DataFrame,
    url: Column | str,
    out: str = "registered_domain",
    snapshot: str | None = None,
) -> DataFrame:
    """`with_registered_domain` over a URL column: host extraction
    (`functions/urls.py:url_host` — try_parse_url, garbage -> NULL) then
    the broadcast PSL match."""
    return with_registered_domain(df, url_host(url), out=out, snapshot=snapshot)
