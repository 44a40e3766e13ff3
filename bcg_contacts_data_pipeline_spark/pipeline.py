"""Pipeline CLI — the runnable replacement for the reference's
orchestrator (/root/reference/cleaning/run.py:74-153):

    python -m bcg_contacts_data_pipeline_spark.pipeline MASTER.tsv OUT_DIR \
        [--sources f1.tsv f2.tsv ...] [--mailchimp mc.tsv] \
        [--merge-empty-keys] [--single-file]

Reference-parity operational behavior, Spark-first mechanics:
- per-step timing lines (run.py:104-111's per-script timing — here the
  steps are lazy plan stages, so the timed boundaries are the ACTIONS:
  one write per output artifact);
- outputs: cleaned master TSV, validation_errors.json (the reference's
  document shape: seqno/name/errors), fill_change_log.json when sources
  were given (fill_missing_contacts.py:124-131);
- validation epilogue: top-5 error histogram + totals
  (run.py:136-146);
- exit code: 1 only for CRITICAL errors — messages matching the
  reference's 'invalid email format' class (validate_fields.py:143-162
  fails only on email problems, not data-quality gaps), else 0.

The whole run is ONE Spark job graph: stages compose lazily and Catalyst
optimizes across them; subprocess-per-step and TSV handoffs between
steps (the reference's design) have no equivalent here by design.
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_cli(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="bcg_contacts_data_pipeline_spark.pipeline",
        description="Contact-unification pipeline (fill -> clean -> dedup -> validate)",
    )
    p.add_argument("master", help="master contacts TSV (88-column family)")
    p.add_argument("out_dir", help="output directory")
    p.add_argument("--sources", nargs="*", default=[], help="enrichment source TSVs")
    p.add_argument("--mailchimp", default=None, help="mailchimp export TSV")
    p.add_argument(
        "--merge-empty-keys",
        action="store_true",
        help="reference bug-compat: merge all keyless rows into one record",
    )
    p.add_argument(
        "--single-file",
        action="store_true",
        help="write one TSV/JSON file per artifact instead of partitioned dirs",
    )
    args = p.parse_args(argv)

    own_spark = spark is None
    if own_spark:
        spark = (
            SparkSession.builder.appName("contacts-pipeline")
            .config("spark.sql.adaptive.enabled", "true")
            .getOrCreate()
        )
    # Release owned resources even when a stage throws: without the
    # finally, an embedded caller (spark=None) would leak the
    # session/JVM, any frame the run body persisted, AND the renumber
    # pins the dedup stage creates (PinScope). Release happens strictly
    # after every sink has materialized (the _run body finishes all its
    # writes/counts before returning), so the load-bearing persists are
    # gone by the time control returns to an embedded caller — pin count
    # back to zero per run, no session-wide clearCache needed.
    from bcg_contacts_data_pipeline_spark.operators.pins import PinScope

    persisted: list = []
    pins = PinScope()
    try:
        return _run(args, spark, persisted, pins)
    finally:
        for df in persisted:
            df.unpersist()
        pins.release()
        if own_spark:
            spark.stop()


def _run(args, spark: SparkSession, persisted: list, pins=None) -> int:
    from bcg_contacts_data_pipeline_spark.io import readers as R
    from bcg_contacts_data_pipeline_spark.io import registries as REG
    from bcg_contacts_data_pipeline_spark.io import writers as W
    from bcg_contacts_data_pipeline_spark.plans import contacts as C

    t0 = time.time()
    _log("=" * 60)
    _log("STARTING CONTACT PIPELINE")
    _log("=" * 60)

    def step(i, n, desc):
        _log(f"STEP {i}/{n}: {desc}")

    n_steps = 3 + (1 if args.sources else 0) + (1 if args.mailchimp else 0)
    i = 1

    step(i, n_steps, f"read master: {args.master}")
    s = time.time()
    master = R.read_tsv(spark, args.master, all_strings=True)
    _log(f"  done in {time.time() - s:.1f}s ({len(master.columns)} columns)")
    i += 1

    mailchimp = None
    if args.mailchimp:
        step(i, n_steps, f"read mailchimp source: {args.mailchimp}")
        s = time.time()
        mailchimp = REG.with_source_order(
            REG.CONTACT_SOURCE_REGISTRY.apply(
                R.read_tsv(spark, args.mailchimp, all_strings=True)
            ),
            "sid",
        )
        _log(f"  done in {time.time() - s:.1f}s")
        i += 1

    sources = None
    if args.sources:
        step(i, n_steps, f"read {len(args.sources)} enrichment sources")
        s = time.time()
        usable = []
        for path in args.sources:
            cols = R._peek_header(spark, path)
            if REG.usable_source(cols):
                usable.append(path)
            else:
                # fill_missing_contacts.py:194-196 skip decision
                _log(f"  skipping {path} - missing required columns")
        if usable:
            sources = REG.with_source_order(
                R.read_sources(spark, usable, REG.CONTACT_SOURCE_REGISTRY).drop(
                    "source_file"
                ),
                "sid",
            )
        _log(f"  done in {time.time() - s:.1f}s ({len(usable)} usable)")
        i += 1

    step(i, n_steps, "fill -> clean -> dedup -> renumber (one lazy plan)")
    s = time.time()
    result = C.run_pipeline(
        master,
        sources=sources,
        mailchimp=mailchimp,
        merge_empty_keys=args.merge_empty_keys,
        pins=pins,
    )
    cleaned_path = f"{args.out_dir}/MergedDatabase.tsv"
    # the row count rides the write job via the Observation API — the
    # old `result.cleaned.count()` after the write re-executed the
    # whole fill->clean->dedup plan a second time just to log a number
    from bcg_contacts_data_pipeline_spark.operators.observe import with_metrics

    to_write, obs = with_metrics(
        result.cleaned.orderBy("seqno"), {"rows": F.count(F.lit(1))}
    )
    if args.single_file:
        W.write_tsv_single(to_write, cleaned_path)
    else:
        W.write_tsv(to_write, cleaned_path)
    n_rows = obs.get["rows"]
    _log(f"  done in {time.time() - s:.1f}s ({n_rows} rows)")
    i += 1

    step(i, n_steps, "validate + reports")
    s = time.time()
    errors = result.errors.persist()
    persisted.append(errors)
    err_path = f"{args.out_dir}/validation_errors.json"
    W.write_json_log(errors, err_path, single=args.single_file)
    if result.fill_log is not None:
        W.write_json_log(
            result.fill_log,
            f"{args.out_dir}/fill_change_log.json",
            single=args.single_file,
        )
    if result.mailchimp_log is not None:
        W.write_json_log(
            result.mailchimp_log,
            f"{args.out_dir}/mailchimp_change_log.json",
            single=args.single_file,
        )

    # Validation epilogue (run.py:136-146): top-5 error histogram. One
    # aggregate over the exploded errors; only the top rows reach the
    # driver.
    hist = (
        errors.select(F.explode("errors").alias("error"))
        .groupBy("error")
        .count()
        .orderBy(F.col("count").desc(), "error")
    )
    top = hist.take(6)
    n_err_rows = errors.count()
    critical = (
        errors.select(F.explode("errors").alias("error"))
        .filter(F.lower(F.col("error")).contains("invalid email format"))
        .count()
    )
    _log(f"  done in {time.time() - s:.1f}s")

    _log("-" * 60)
    if n_err_rows:
        _log("Validation Summary:")
        for row in top[:5]:
            _log(f"  * {row['error']}: {row['count']} records")
        if len(top) > 5:
            _log("  * ... and more error types")
        _log(f"  Total validation issues: {n_err_rows} records")
    else:
        _log("Validation Summary: all records passed validation!")

    _log("=" * 60)
    _log(f"PIPELINE COMPLETED in {time.time() - t0:.1f}s")
    _log("=" * 60)

    # validate_fields.py:143-162: fail only on the critical (email-format)
    # class; plain data-quality gaps exit 0.
    if critical > 0:
        _log(f"FOUND {critical} CRITICAL VALIDATION ERRORS")
        return 1
    if n_err_rows:
        _log(f"Found {n_err_rows} data quality issues (not critical)")
    return 0


if __name__ == "__main__":
    sys.exit(run_cli())
