"""Measured scale-up probe: does the plan shape survive 10x / 100x data?

Builds a referentially-consistent Fx replica of sf0.1 under
``.scale/x{F}/`` (gitignored, deletable), then times one representative
query per architecture family at 1x and Fx and reports the wall-clock
ratio next to the ideal-linear bound. This turns the per-query "scales"
claims (PLANS.md, docstrings) into numbers: a linear-design query at 10x
data should cost <= ~10x wall (usually much less, since per-query fixed
overhead — planning, codegen, Python worker spin-up — amortizes).

Scale model ("more data, same distribution"): each fact/entity table is
replicated F times with every key column shifted by ``i * stride`` so
joins stay valid, group COUNT scales Fx while per-group size stays
constant for TPC-H-ish keys, and the two fixed dimensions (region,
nation) keep their real-world shape: they do NOT grow with the fact
data, which is exactly why the engine broadcast-joins them.

Documents/embeddings replicate with their text/vector payload UNCHANGED,
so every document gains F-1 exact cross-replica duplicates. That is
deliberate: web-scale corpora are full of exact dups, and the dedup /
similarity operators' caps (max_df posting-list caps, LSH auto-planes,
hot-bucket caps) exist precisely for this shape — the probe measures
them under it.

Usage:
    python tools/scale_probe.py [--factor 10] [--tier2 100] [--keep]

Writes SCALE.md at the repo root. Cleans .scale/ afterwards unless
--keep.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# same env override as bench.py so the two tools agree on data location
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# key columns to shift per table: {table: {column: stride}}
# strides are clean decimal powers above each keyspace's max so replica
# key ranges never collide.
KEYS = {
    "customer": {"c_custkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {
        "l_orderkey": 1_000_000,
        "l_partkey": 100_000,
        "l_suppkey": 10_000,
    },
    "part": {"p_partkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}
DIMS = ["region", "nation"]  # fixed-shape dimensions: copied once

# One query per architecture family; (name, claimed design) pairs. The
# claim is what PLANS.md / the docstring asserts; the probe checks it.
PROBE = [
    ("q1_pricing_summary", "scan + codegen aggregate"),
    ("q9_product_profit", "multi-join, broadcast dims"),
    ("exact_dedup", "hash-groupBy dedup"),
    ("dedup_merge", "most-complete merge (max_by)"),
    ("orders_global_rank", "two-pass global renumber"),
    ("pack_shards", "partition-offset shard packing"),
    ("hll_sketch_rollup", "mergeable sketch rollup"),
    ("token_stats", "text Catalyst expressions"),
    ("ngram_jaccard", "capped posting-list pair gen"),
    ("paragraph_dedup", "sha2-grouped paragraph dedup"),
    ("paragraph_boilerplate", "paragraph dedup, max_df twin"),
    ("substring_dedup", "k-gram postings + diagonal run merge"),
    ("substring_dedup_capped", "substring spans, occ_cap fan-out dial"),
    ("gopher_repetition", "doc-keyed repetition metrics"),
    ("gopher_quality", "pure-projection quality rules"),
    ("c4_line_filter", "pure-projection C4 line/page rules"),
    ("c4_span_dedup", "sentence-span dedup, keep-first"),
    ("gopher_dup_lines", "pure-projection dup-line fractions"),
    ("minhash_recall", "MinHash LSH, complete candidates"),
    ("minhash_recall_capped", "MinHash LSH, hot-bucket cap"),
    ("enrich_2of3", "k-of-n key-match enrich join"),
    ("dedup_components", "iterative CC, capped edges"),
    ("embedding_ann_lsh", "LSH ANN, auto planes"),
    ("embedding_ann_lsh_capped", "LSH ANN, rep-capped buckets"),
    ("embedding_ann_ivf_capped", "IVF ANN, rep-capped cells"),
    ("semantic_dedup", "SemDeDup, rep-capped clusters"),
    ("etld1_quota_sample", "PSL broadcast joins + quota window"),
    ("incremental_curation_e2e", "incremental trio composed"),
    ("crawl_curation_e2e", "crawl ladder composed"),
    ("curation_pipeline_v2_e2e", "v2 curation ladder composed"),
    ("sessionize", "window sessionization"),
    ("stream_hourly_counts", "streaming AvailableNow drain"),
    ("contacts_pipeline_e2e", "flagship e2e pipeline"),
]
# second-tier (100x) probe set: the strictly-linear ops for a clean
# two-decade curve PLUS the families the 100 TB claim rests on most
# heavily (VERDICT r9 ask #4) — iterative CC, banded-LSH pair
# generation, and the flagship e2e pipeline. The 100x replica makes
# every document a 100-way exact duplicate: the adversarial shape for
# pair generators, held sub-quadratic only by the posting-list /
# hot-bucket caps — which is exactly what the tier-2 row certifies.
# The MinHash member is the CAPPED production path: the uncapped
# complete-candidate baseline's output is Θ(clusters·clone²) by design
# (it must emit every true pair, and this replica grows clone size
# linearly with F), so no algorithm meets a linear wall bound on it —
# measured: >10 min at 100x even after the static-broadcast fix, vs the
# capped twin which routes 200-way clone clusters out of pairwise
# scoring entirely (PERF.md r10). The embedding-ANN member is likewise
# the CAPPED twin (r11): identical clone vectors share every sign bit,
# so the replica's 100-member clone families are indivisible by
# hyperplanes and uncapped in-bucket scoring goes locally quadratic
# (measured 46.9x at 100x, the r10 board's worst ratio); the cap routes
# over-full buckets to representative scoring (|bucket|·cap, exact for
# clones). The uncapped baselines stay at 1x/10x as the completeness
# certificates.
TIER2 = ["q1_pricing_summary", "q9_product_profit", "exact_dedup",
         "dedup_merge", "orders_global_rank", "pack_shards",
         "hll_sketch_rollup", "token_stats", "paragraph_dedup",
         "paragraph_boilerplate", "substring_dedup",
         "substring_dedup_capped", "gopher_repetition", "gopher_quality",
         "c4_line_filter", "c4_span_dedup", "gopher_dup_lines",
         "minhash_recall_capped",
         "enrich_2of3", "dedup_components", "embedding_ann_lsh_capped",
         "embedding_ann_ivf_capped", "semantic_dedup",
         "etld1_quota_sample",
         "incremental_curation_e2e", "crawl_curation_e2e",
         "curation_pipeline_v2_e2e",
         "sessionize", "stream_hourly_counts", "contacts_pipeline_e2e"]

# Uncapped complete-candidate baselines whose REQUIRED OUTPUT grows
# quadratically in clone multiplicity on this replica (each original doc
# gains F-1 exact duplicates, so true-pair count per family is C(F,2)):
# measured for ngram_jaccard at 10x — 590 -> 284,000 output rows (481x)
# against an ~10x wall. Their rows carry output_quadratic=true and the
# wall bound applies with a 1.5x allowance (their walls hover AT the
# ideal-linear bound by construction — r10 drew 8.1x, r11 drew 9.7x
# idle / 11.1x mid-sequence on identical code — while staying ~40x+
# SUB-output-linear). The capped twins carry the strict bound and the
# 100x tier.
OUTPUT_QUADRATIC = {"ngram_jaccard", "minhash_recall"}


# ---------------------------------------------------------------------------
# Production-dial rows (VERDICT r12 ask #2): NON-CERTIFIED probe rows
# that measure the documented scaling dials the certified queries cannot
# use (their DuckDB oracles restate the codebook literally, so they pin
# tiny 8/16-entry codebooks and at 100x only 8/16 tasks run on 32
# cores). The dial rows run the SAME operators with the codebook scaled
# per the documented rule — SemDeDup `n_clusters ~ N / target_cluster`
# (target = the 1x cluster size, so n_clusters = 8·F) with the BLAS
# kernel (`exact_fold=False`, the production path for runs not needing
# oracle bit-parity); IVF `n_centroids ~ sqrt(N)` (n_centroids =
# 16·sqrt(F)) — converting the "the dial restores parallelism" claim
# from argued (docstrings) to measured (a SCALE.md row under the same
# linear bound as everything else).
# ---------------------------------------------------------------------------

_DIAL_COPY_OFFSET = 1 << 40


def _doubled_embeddings(spark, sf_dir: str):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return emb.unionByName(
        emb.select(
            (F.col("vec_id") + F.lit(_DIAL_COPY_OFFSET)).alias("vec_id"),
            "embedding",
        )
    )


def _dial_semantic(factor: int):
    def fn(spark, sf_dir: str):
        from bcg_contacts_data_pipeline_spark.operators.similarity import (
            semantic_dedup,
        )

        return semantic_dedup(
            _doubled_embeddings(spark, sf_dir),
            "vec_id",
            "embedding",
            n_clusters=8 * factor,  # N/target_cluster, target = 1x size
            threshold=0.8,
            max_cluster=1024,
            exact_fold=False,  # production BLAS kernel
        )

    return fn


def _dial_ivf(factor: int):
    def fn(spark, sf_dir: str):
        from bcg_contacts_data_pipeline_spark.operators.similarity import (
            embedding_ann_ivf,
        )

        return embedding_ann_ivf(
            _doubled_embeddings(spark, sf_dir),
            "vec_id",
            "embedding",
            n_centroids=max(16, int(16 * factor**0.5)),  # ~sqrt(N)
            n_probe=4,
            k=5,
            max_cell=512,
        )

    return fn


#: (row name, claim, factory(factor) -> query callable). Factories take
#: the replica factor so the dial tracks the data volume the way a real
#: deployment would set it.
DIAL = [
    (
        "semantic_dedup_dial",
        "SemDeDup, production dial: n_clusters=8·F, BLAS kernel",
        _dial_semantic,
    ),
    (
        "embedding_ann_ivf_dial",
        "IVF ANN, production dial: n_centroids=16·sqrt(F)",
        _dial_ivf,
    ),
]


def build_scaled(factor: int, dest: str) -> None:
    import duckdb

    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, shifts in KEYS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        # One part-file PER REPLICA, in a directory Spark reads as the
        # table — the layout a real Fx corpus has (F ingest files), not
        # one hyper-compressed monolith. This matters for honesty, not
        # convenience: the F-way duplicated payload dictionary-encodes
        # ~F:1 inside a single file (measured: 500k docs -> 4.4 MB at
        # 100x), so byte-based split planning hands 32 cores TWO input
        # partitions and every scan-bound probe row measures parallelism
        # starvation instead of the operator (token_stats drew 44x at
        # 100x with 2 tasks; the same data at 33 splits draws ~6x —
        # PERF.md r12). Per-replica files restore the real corpus's
        # bytes-per-row and file count in one move.
        part_dir = f"{dest}/{t}.parquet"
        os.makedirs(part_dir, exist_ok=True)
        for i in range(factor):
            sel = ", ".join(
                f"({c} + {i} * {shifts[c]}) AS {c}" if c in shifts else c
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet') TO "
                f"'{part_dir}/part-{i:05d}.parquet' (FORMAT PARQUET)"
            )
    con.close()


def time_query(spark, name, sf_dir: str, runs: int = 2) -> float:
    """Time a registered query (by name) or any (spark, sf_dir) callable."""
    from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES

    fn = QUERIES[name] if isinstance(name, str) else name
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        spark.catalog.clearCache()
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--tier2", type=int, default=100)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from bcg_contacts_data_pipeline_spark.session import get_spark

    scale_root = os.path.join(ROOT, ".scale")
    d1 = os.path.join(scale_root, f"x{args.factor}")
    d2 = os.path.join(scale_root, f"x{args.tier2}")
    for factor, dest in ((args.factor, d1), (args.tier2, d2)):
        # the atomic rename below guarantees a dest dir is complete —
        # but dirs left by the pre-rename code could be partial, so also
        # demand the LAST-written table before trusting a reuse. isdir
        # (not exists): replicated tables are per-replica part-file
        # DIRECTORIES since r12 — a single-file embeddings.parquet is a
        # pre-r12 monolith replica and must be rebuilt, or every
        # scan-bound row re-measures the starved layout.
        if os.path.isdir(dest) and os.path.isdir(
            os.path.join(dest, "embeddings.parquet")
        ):
            print(f"# reusing {dest}", file=sys.stderr)
            continue
        shutil.rmtree(dest, ignore_errors=True)
        print(f"# building {factor}x replica ...", file=sys.stderr)
        # build into a temp dir and rename on success so an interrupted
        # build never leaves a partial replica that a rerun would trust
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        build_scaled(factor, tmp)
        os.rename(tmp, dest)

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up, untimed (same rationale as bench.py)
    spark.read.parquet(f"{SRC}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    rows: list[dict] = []
    for name, claim in PROBE:
        t1 = time_query(spark, name, SRC)
        tf = time_query(spark, name, d1)
        entry = {
            "query": name,
            "claim": claim,
            "t_1x": round(t1, 2),
            f"t_{args.factor}x": round(tf, 2),
            "ratio": round(tf / t1, 1),
        }
        if name in OUTPUT_QUADRATIC:
            entry["output_quadratic"] = True
        if name in TIER2:
            t2 = time_query(spark, name, d2)
            entry[f"t_{args.tier2}x"] = round(t2, 2)
            entry["ratio2"] = round(t2 / t1, 1)
        rows.append(entry)
        print(f"# {json.dumps(entry)}", file=sys.stderr)

    # production-dial rows (non-certified; codebook scales with factor)
    for name, claim, factory in DIAL:
        t1 = time_query(spark, factory(1), SRC)
        tf = time_query(spark, factory(args.factor), d1)
        t2 = time_query(spark, factory(args.tier2), d2)
        entry = {
            "query": name,
            "claim": claim,
            "t_1x": round(t1, 2),
            f"t_{args.factor}x": round(tf, 2),
            "ratio": round(tf / t1, 1),
            f"t_{args.tier2}x": round(t2, 2),
            "ratio2": round(t2 / t1, 1),
            "dial": True,
        }
        rows.append(entry)
        print(f"# {json.dumps(entry)}", file=sys.stderr)

    print(json.dumps({"factor": args.factor, "rows": rows}))
    write_scale_md(rows, args.factor, args.tier2)

    if not args.keep:
        shutil.rmtree(scale_root, ignore_errors=True)
    return 0


def write_scale_md(rows: list[dict], factor: int, tier2: int) -> None:
    """Render the measured ratio table to SCALE.md at the repo root.

    A query passes when its measured wall-clock ratio at Fx data is <=
    the ideal-linear bound F (fixed per-query overhead — planning,
    codegen, Python worker spin-up — means well-designed queries land
    well under F). Super-linear rows are flagged and must get a named
    fix in PERF.md.
    """
    fx, f2 = f"t_{factor}x", f"t_{tier2}x"
    lines = [
        "# SCALE — measured scale-up probe",
        "",
        f"`tools/scale_probe.py` run against `{SRC}` on local[32]: each",
        f"query timed (min of 2, noop sink, cache cleared between runs) at",
        f"1x and {factor}x data; the tier-2 set — the strictly-linear ops",
        "plus the families the 100 TB claim rests on most heavily",
        "(iterative CC, capped LSH pair generation, the flagship e2e",
        f"pipeline) — additionally at {tier2}x.",
        "The replica is referentially consistent (keys shifted",
        "per replica; region/nation dimensions stay fixed-shape, which is",
        "why they broadcast). Documents/embeddings replicate with payloads",
        "unchanged, so every document gains exact cross-replica duplicates",
        "— deliberately stressing the dedup/similarity caps.",
        "",
        f"**Pass rule:** ratio <= ideal-linear bound ({factor}x data ->",
        f"<= {factor}x wall; {tier2}x -> <= {tier2}x wall).",
        "",
        f"| query | claimed design | t_1x (s) | t_{factor}x (s) |"
        f" ratio | bound | t_{tier2}x (s) | ratio | bound | verdict |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    worst = []
    for r in rows:
        # output-quadratic baselines get a bounded 1.5x allowance on the
        # wall bound (see OUTPUT_QUADRATIC) — never a blank exemption
        slack = 1.5 if r.get("output_quadratic") else 1.0
        ok1 = r["ratio"] <= factor * slack
        has2 = f2 in r
        ok2 = (not has2) or r["ratio2"] <= tier2 * slack
        if ok1 and ok2:
            verdict = (
                "sub-output-linear"
                if r.get("output_quadratic") and r["ratio"] > factor
                else "linear-ok"
            )
        else:
            verdict = "SUPER-LINEAR"
        if verdict == "SUPER-LINEAR":
            worst.append(r["query"])
        lines.append(
            f"| `{r['query']}` | {r['claim']} | {r['t_1x']} | {r[fx]} |"
            f" {r['ratio']}x | {factor}x |"
            f" {r.get(f2, '—')} | {str(r.get('ratio2', '—')) + 'x' if has2 else '—'} |"
            f" {tier2 if has2 else '—'}{'x' if has2 else ''} | {verdict} |"
        )
    lines += [
        "",
        (
            "**All probed families are at or under the ideal-linear bound.**"
            if not worst
            else "**SUPER-LINEAR rows needing a PERF.md fix:** "
            + ", ".join(f"`{q}`" for q in worst)
        ),
        "",
        "The MinHash family's tier-2 member is the CAPPED production",
        "path (`minhash_recall_capped`): the uncapped complete-candidate",
        "baseline must emit every true pair, and this replica grows clone",
        "size linearly with F, so its OUTPUT is Θ(clusters·clone²) — no",
        "algorithm meets a linear wall bound on it (measured >10 min at",
        "100x). The cap routes oversized clone clusters out of pairwise",
        "scoring, which is the documented 100 TB behavior (PERF.md r10).",
        "The embedding-ANN tier-2 member is likewise the capped twin",
        "(`embedding_ann_lsh_capped`, r11): identical clone vectors share",
        "every sign bit, so the replica's clone families are indivisible",
        "by hyperplanes and uncapped in-bucket scoring goes locally",
        "quadratic (46.9x at 100x on the r10 board); the rep-cap bounds",
        "per-bucket work at |bucket|*cap, exact for clones. Both uncapped",
        "baselines remain in the 1x/" + "10x tier as completeness",
        "certificates.",
        "",
        "Rows named `*_dial` are the NON-CERTIFIED production-dial",
        "measurements (VERDICT r12 ask #2): the same semantic-dedup / IVF",
        "operators with the codebook scaled per the documented rule",
        "(SemDeDup `n_clusters ~ N/target` with the BLAS kernel; IVF",
        "`n_centroids ~ sqrt(N)`) instead of the oracle-pinned 8/16-entry",
        "codebooks the certified rows must keep. The certified rows'",
        "steep-but-linear 100x ratios are 8/16-task parallelism artifacts;",
        "the dial rows measure what a deployment that sets the dial",
        "actually gets.",
        "",
        "An uncapped complete-candidate baseline can breach even the 10x",
        "wall bound WITHOUT being a plan defect, because its required",
        "OUTPUT grows quadratically in clone multiplicity on this",
        "replica: `ngram_jaccard` measured 590 -> 284,000 output rows",
        "(481x) from 1x to 10x data (r11 count probe) — a wall ratio",
        "near 11x against a 481x output factor is ~43x SUB-output-linear.",
        "Adjudication for any such row lives in PERF.md; the capped twin",
        "(`prefix`/`minhash` cap family) is the production path.",
        "",
        "Raw rows (machine-readable, mirrored on stdout):",
        "",
        "```json",
        json.dumps({"factor": factor, "tier2": tier2, "rows": rows}),
        "```",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"# wrote {os.path.join(ROOT, 'SCALE.md')}", file=sys.stderr)


if __name__ == "__main__":
    raise SystemExit(main())
