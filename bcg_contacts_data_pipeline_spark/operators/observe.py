"""In-flight pipeline metrics via the Observation API.

The reference logs row counts and validity tallies between pipeline
stages (clean_contacts.py:105-147 prints stats after each transform) —
as separate pandas passes over the frame. The Spark-native equivalent
is ``DataFrame.observe``: metric expressions ride the SAME job that
materializes the frame, evaluated by the executors as rows stream
through, so the stats cost zero extra scans and zero extra shuffles —
at 100 TB a "count the invalids" side-pass is a full table scan you
simply don't run.

Contract notes (why this is a thin helper and not magic):
- metrics must be AGGREGATE expressions (count/sum/min/max/...);
- results are only available AFTER an action materializes the observed
  frame, and reflect exactly the rows that action processed;
- an observed frame re-used by a second action reports that second
  action's numbers — read the observation between actions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_metrics(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``. Returns the observed
    frame (use it in place of ``df``) and the ``Observation`` handle —
    read ``obs.get`` after the frame has been materialized by an
    action (write, count, collect).

    Example::

        frame, obs = with_metrics(cleaned, {
            "rows": F.count(F.lit(1)),
            "invalid_email": F.sum(F.when(bad_email, 1).otherwise(0)),
        })
        frame.write.parquet(out)      # ONE job computes data + metrics
        stats = obs.get               # {'rows': ..., 'invalid_email': ...}
    """
    if not metrics:
        raise ValueError("with_metrics needs at least one named metric")
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs
