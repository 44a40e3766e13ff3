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


def _stratum_case(
    stratum_col: Column | str, mapping: dict[str, int], default: int
) -> Column:
    """CASE chain mapping a stratum label to an integer, falling through
    to ``default`` — shared by the sampler and the mixer so label
    matching and literal typing can never diverge between them."""
    s = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    expr = None
    for label, v in mapping.items():
        cond = s == F.lit(label)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return F.lit(default) if expr is None else expr.otherwise(F.lit(default))


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
    below ``round(rate * buckets)`` for its stratum — i.e. an exact
    ``round(rate*buckets)/buckets`` fraction of each stratum, chosen by
    stable hash, not RNG. (Rounded, not truncated: ``int(0.57*10000)``
    is 5699 because the double product lands just under the integer —
    truncation would silently sample one bucket less than requested.)
    Corpus rebalancing (downsample the dominant language, keep the rare
    ones whole) becomes a pure filter: no shuffle, no state,
    reproducible in any engine, and adding documents never flips the
    decision on existing ones.
    """
    b = hash_bucket(id_col, buckets, seed)
    limits = {label: int(round(rate * buckets)) for label, rate in rates.items()}
    thresh = _stratum_case(
        stratum_col, limits, int(round(default_rate * buckets))
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

    ``0`` epochs (in the mapping or as ``default_epochs``) means DROP
    that stratum — the explicit empty-sequence branch below; without it
    ``sequence(1, 0)`` would DESCEND (Spark defaults the step to -1
    when start > stop) and silently emit every row twice with epochs
    [1, 0]. Negative values are rejected.
    """
    for label, reps in epochs.items():
        if reps < 0 or reps != int(reps):
            # fractional epochs (0.5 "half epoch") would silently fall
            # into the integer-0 drop branch — reject them loudly
            raise ValueError(
                f"epochs must be non-negative integers: {label}={reps}"
            )
    if default_epochs < 0 or default_epochs != int(default_epochs):
        raise ValueError(
            f"default_epochs must be a non-negative integer: {default_epochs}"
        )
    n = _stratum_case(stratum_col, epochs, default_epochs)
    seq = F.when(n >= 1, F.sequence(F.lit(1), n.cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(epoch_name, F.explode(seq))


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
