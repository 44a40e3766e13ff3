"""Data-layout keys for multi-column file skipping.

``sort_within`` on ONE column (io.writers.write_columnar) gives tight
row-group min/max stats on that column alone; a second filter column
gets nothing. Z-ordering fixes that: interleave the bits of several
columns' rank-space positions into one clustering key, sort by it, and
EVERY participating column's values become locality-clustered — its
row-group ranges shrink from "the whole domain" to roughly
domain/2^(bits_used/n_cols) per group, which is what lets a scan skip
row groups on predicates over any of the columns (the same trick Delta
Lake's OPTIMIZE ZORDER BY applies before compaction).

Everything here is pure Catalyst bit arithmetic — shiftleft/or over
integer columns, whole-stage-codegen'd, no Python in the row path, no
shuffle (the key feeds ``sortWithinPartitions``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-curve) key: interleave the low ``bits`` bits of each
    column. Inputs must already be NON-NEGATIVE integers in rank space
    — raw values work when they're uniformly spread (ids, hash buckets,
    epoch minutes); for skewed domains quantile-bucket first so each
    bit level splits the data roughly in half (``F.ntile`` or a
    precomputed bucket map). ``bits`` per column is capped so the key
    fits a signed 64-bit long."""
    ncols = len(cols)
    if ncols < 2:
        raise ValueError("zorder needs >= 2 columns (use a plain sort for 1)")
    if bits * ncols > 63:
        raise ValueError(
            f"{ncols} cols x {bits} bits = {bits * ncols} > 63 key bits"
        )
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * ncols + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Columnar sink clustered on the Morton key of ``zorder_cols`` —
    ``sortWithinPartitions`` on the interleaved key (no global sort, no
    shuffle), so each output file's row groups are Z-curve tiles and
    min/max footer stats are tight on EVERY zorder column, not just the
    first. Verified against real parquet footers in tests/test_io.py."""
    keyed = df.withColumn("__zkey", zorder_key(zorder_cols, bits))
    (
        keyed.sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
