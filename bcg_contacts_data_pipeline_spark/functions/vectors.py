"""Vector math over ``array<float>`` embedding columns — pure Catalyst
higher-order functions (zip_with + aggregate), no UDFs.

Determinism contract: every reduction is a SEQUENTIAL left fold with a
DOUBLE accumulator starting at 0.0, and elements are cast to DOUBLE
before multiplication. The DuckDB oracles mirror this exactly
(list_reduce over list_transform), so cosine scores are bit-identical
across engines — which is what lets similarity queries pass a value-hash
gate despite being float math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = _col(a), _col(b)
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = _col(a), _col(b)
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))
