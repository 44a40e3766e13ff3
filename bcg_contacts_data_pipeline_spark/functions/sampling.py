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
