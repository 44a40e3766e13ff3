"""SCALE.md freshness gate.

SCALE.md is the measured scale-up evidence behind the per-query "scales"
claims (PLANS.md, docstrings): `tools/scale_probe.py` times one query per
architecture family at 1x and Fx (and the strictly-linear tier at F2x)
and writes the ratio table plus a machine-readable JSON block. This test
pins the artifact's contract so a probe rerun that breaks the format —
or a committed SCALE.md whose numbers violate the ideal-linear bound —
fails CI instead of silently rotting.
"""

from __future__ import annotations

import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(ROOT, "SCALE.md")

# families the probe must keep covering (a subset of its PROBE list —
# one per architecture family named in VERDICT/PLANS)
REQUIRED = {
    "q1_pricing_summary",      # scan + codegen aggregate
    "exact_dedup",             # hash-groupBy dedup
    "orders_global_rank",      # two-pass global renumber
    "ngram_jaccard",           # capped posting-list pair generation
    "minhash_recall",          # MinHash banded LSH pairs
    "enrich_2of3",             # k-of-n key-match enrichment join
    "dedup_components",        # iterative connected components
    "embedding_ann_lsh",       # LSH ANN bucketing
    "stream_hourly_counts",    # streaming AvailableNow drain
    "contacts_pipeline_e2e",   # flagship end-to-end pipeline
}


@pytest.fixture(scope="module")
def payload():
    if not os.path.exists(PATH):
        pytest.fail("SCALE.md missing — run `python tools/scale_probe.py`")
    with open(PATH) as f:
        text = f.read()
    m = re.search(r"```json\n(.*?)\n```", text, re.S)
    assert m, "SCALE.md lost its machine-readable ```json block"
    return json.loads(m.group(1))


def test_scale_md_parses_and_covers_families(payload):
    assert payload["factor"] >= 10
    names = {r["query"] for r in payload["rows"]}
    missing = REQUIRED - names
    assert not missing, f"scale probe dropped families: {missing}"
    for r in payload["rows"]:
        # every row carries both timings and a derived ratio
        fx = f"t_{payload['factor']}x"
        assert r["t_1x"] > 0 and r[fx] > 0
        # ratio was computed from UNROUNDED timings then rounded to 1dp
        # (±0.05); recomputing from the 2dp-published timings adds up to
        # ±0.005·(1+ratio)/t_1x of propagation error — bound both terms
        # so an honest probe rerun can never trip this gate
        tol = 0.055 + 0.006 * (1 + r["ratio"]) / r["t_1x"]
        assert r["ratio"] == pytest.approx(r[fx] / r["t_1x"], abs=tol)


def test_scale_ratios_within_linear_bound(payload):
    """The committed evidence must actually support the claims: every
    probed query's measured Fx ratio is at or under ideal-linear. A row
    over the bound means a real super-linear design (or a contaminated
    run) — either way it must not sit in the repo as 'evidence'.

    Rows flagged ``output_quadratic`` (the uncapped complete-candidate
    baselines, whose REQUIRED output grows quadratically in clone
    multiplicity on this replica — ngram_jaccard measured 590 ->
    284,000 output rows, 481x, against an ~10x wall; PERF.md r11) get a
    bounded 1.5x allowance: their walls hover AT the ideal-linear bound
    by construction and flip across it with host draws (8.1x r10, 9.7x
    idle r11, 11.1x mid-sequence r11 on identical code) while staying
    ~40x+ SUB-output-linear. Never a blank exemption — 1.5x over is
    still a failure — and their capped twins carry the strict bound."""
    factor, tier2 = payload["factor"], payload.get("tier2")

    def bound(r, b):
        return b * (1.5 if r.get("output_quadratic") else 1.0)

    over = {
        r["query"]: r["ratio"]
        for r in payload["rows"]
        if r["ratio"] > bound(r, factor)
    }
    assert not over, f"super-linear at {factor}x: {over}"
    if tier2:
        over2 = {
            r["query"]: r["ratio2"]
            for r in payload["rows"]
            if "ratio2" in r and r["ratio2"] > bound(r, tier2)
        }
        assert not over2, f"super-linear at {tier2}x: {over2}"
    # the allowance is earned by the STRICT-bound capped twins staying
    # in the probe (they carry the production path and the 100x tier)
    if any(r.get("output_quadratic") for r in payload["rows"]):
        names = {r["query"] for r in payload["rows"]}
        assert {"minhash_recall_capped", "embedding_ann_lsh_capped"} <= names
