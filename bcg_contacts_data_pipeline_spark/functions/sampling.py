"""Deterministic hash-based sampling / dataset splitting.

The train/val/test split of a training corpus must be (a) deterministic
across runs and engines, (b) stable under corpus growth (adding docs
never moves an existing doc between splits), (c) driver-free. Random
seeds satisfy none of these; hashing the stable id satisfies all three —
the standard practice for large-scale dataset curation.

The bucket hash is md5 (not xxhash64) on purpose: md5 is bit-identical
in every engine (Spark, DuckDB, Python), so split assignment is portable
and oracle-checkable, while xxhash64 exists only in Spark. Cost is
irrelevant — one hash per row in a metadata-sized projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(c: Column | str, buckets: int = 100, seed: str = "") -> Column:
    """Stable bucket in [0, buckets): first 8 md5 hex chars of
    ``seed + ':' + value`` parsed as an integer, mod buckets. Changing
    ``seed`` re-shuffles assignment; same (value, seed) always lands in
    the same bucket."""
    col = F.col(c) if isinstance(c, str) else c
    salted = F.concat(F.lit(seed), F.lit(":"), col.cast("string"))
    hex8 = F.substring(F.md5(salted), 1, 8)
    return F.pmod(F.conv(hex8, 16, 10).cast("long"), F.lit(buckets)).cast("long")


def stratified_keep(
    id_col: Column | str,
    stratum_col: Column | str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "",
    buckets: int = 10_000,
) -> Column:
    """Boolean: keep this row under per-stratum deterministic sampling.

    A row survives when its id's hash bucket (out of ``buckets``) falls
    below ``rate * buckets`` for its stratum — i.e. an exact
    ``floor(rate*buckets)/buckets`` fraction of each stratum, chosen by
    stable hash, not RNG. Corpus rebalancing (downsample the dominant
    language, keep the rare ones whole) becomes a pure filter: no
    shuffle, no state, reproducible in any engine, and adding documents
    never flips the decision on existing ones.
    """
    b = hash_bucket(id_col, buckets, seed)
    s = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    thresh = None
    for label, rate in rates.items():
        lim = F.lit(int(rate * buckets))
        cond = s == F.lit(label)
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    thresh = (
        F.lit(int(default_rate * buckets))
        if thresh is None
        else thresh.otherwise(F.lit(int(default_rate * buckets)))
    )
    return b < thresh


def epoch_repeat(
    df,
    stratum_col: str,
    epochs: dict[str, int],
    default_epochs: int = 1,
    epoch_name: str = "epoch",
):
    """Weighted corpus mixing by epoch upsampling: repeat every row of
    stratum ``s`` ``epochs[s]`` times, tagging each copy with a 1-based
    ``epoch``. This is how training mixtures express "see the rare
    slice 3x per pass": an exploded ``sequence`` (narrow, no shuffle,
    output exactly the mixture size), not a random sampler — the
    resulting corpus is identical on every run and every engine.
    """
    n = None
    for label, reps in epochs.items():
        if reps < 1:
            raise ValueError(f"epochs must be >= 1: {label}={reps}")
        cond = F.col(stratum_col) == F.lit(label)
        n = F.when(cond, F.lit(reps)) if n is None else n.when(cond, F.lit(reps))
    n = F.lit(default_epochs) if n is None else n.otherwise(F.lit(default_epochs))
    return df.withColumn(
        epoch_name, F.explode(F.sequence(F.lit(1), n.cast("int")))
    )


def assign_split(
    c: Column | str,
    weights: dict[str, int] | None = None,
    seed: str = "",
) -> Column:
    """Split label from cumulative bucket ranges over 100 buckets.
    Default 80/10/10 train/val/test. ``weights`` maps label -> percent
    (must sum to 100); label order follows dict insertion order."""
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    b = hash_bucket(c, 100, seed)
    expr = None
    upper = 0
    for label, pct in weights.items():
        upper += pct
        cond = b < F.lit(upper)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr
