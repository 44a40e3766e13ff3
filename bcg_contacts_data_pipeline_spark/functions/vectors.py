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


#: SQL-text twin of ``dot`` (same sequential left fold, same casts) for
#: the normalize_sql treatment: WIDE expression trees built per-Column
#: cost one py4j round-trip per node (measured 6371 round-trips / 2.7 s
#: of pure driver wall for the 16x64 projection below), while a SQL
#: string parses JVM-side in one call. Twin equivalence is pinned by
#: tests (bit-identical values, same contract as functions/normalize_sql).
DOT_SQL = (
    "aggregate(zip_with({a}, {b}, "
    "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def dot_sql(a: str, b: str) -> str:
    """SQL-text ``dot`` over two array-typed SQL expressions."""
    return DOT_SQL.format(a=a, b=b)


def random_projection_sql(vec: str, matrix: list[list[float]]) -> str:
    """SQL-text twin of ``random_projection`` — one string, one py4j
    call, bit-identical values (matrix entries embed as double literals
    via ``repr(x) + 'D'``; the scale uses the same repr round-trip the
    DuckDB oracle embeds)."""
    k = len(matrix)
    scale = repr(1.0 / (k**0.5))
    dims = ", ".join(
        "({dot}) * {scale}D".format(
            dot=dot_sql(
                vec,
                "array(" + ", ".join(f"{x!r}D" for x in row) + ")",
            ),
            scale=scale,
        )
        for row in matrix
    )
    return f"array({dims})"


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


def quantize_int8(a: Column | str) -> Column:
    """Symmetric per-vector int8 quantization: codes = floor(x/scale
    + 0.5) with scale = max(|x|)/127 — 4x storage over float32, the
    standard compression for embedding columns at corpus scale (the
    recall cost is evaluated IN-BAND by the quantize round-trip query,
    not assumed). Returns struct(scale double, codes array<int> in
    [-127, 127]).

    floor(x + 0.5) rather than round(): round-half rules differ across
    engines (HALF_UP vs banker's), floor(+0.5) is the same function
    everywhere — the determinism contract of this module. All-zero
    vectors quantize to scale 0 with all-zero codes (the division is
    guarded)."""
    a = _col(a)
    absmax = F.aggregate(
        a,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = absmax / F.lit(127.0)
    codes = F.transform(
        a,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.floor(x.cast("double") / scale + F.lit(0.5)))
        .cast("int"),
    )
    return F.struct(scale.alias("scale"), codes.alias("codes"))


def dequantize_int8(q: Column | str) -> Column:
    """struct(scale, codes) -> array<double>: codes * scale. Max
    reconstruction error is scale/2 by construction (one quantization
    step is scale; rounding is to the nearest step)."""
    q = _col(q)
    return F.transform(
        q["codes"], lambda c: c.cast("double") * q["scale"]
    )


def rademacher_matrix(dim: int, k: int, seed: int = 7) -> list[list[float]]:
    """Seeded +-1.0 projection matrix, one row per OUTPUT dimension.
    Plain ``random.Random`` so the same seed reproduces the same matrix
    in the oracle-SQL builder (which embeds these as literals) and in
    any other engine — no numpy RNG state involved."""
    import random

    rng = random.Random(seed)
    return [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        for _ in range(k)
    ]


def random_projection(
    vec: Column | str, matrix: list[list[float]]
) -> Column:
    """Johnson-Lindenstrauss random projection to ``k = len(matrix)``
    dims: ``y_j = dot(x, R_j) / sqrt(k)`` with a Rademacher (+-1) R.
    JL: pairwise distances and norms are preserved within
    ``1 +- O(sqrt(log n / k))`` with high probability — the standard
    cheap pre-step before ANN indexing or pairwise scoring when the
    input dimension is the cost driver.

    Pure Catalyst: k sequential-fold dot products per row (k*dim
    multiply-adds inside whole-stage codegen), a narrow projection —
    no shuffle, no Python, embarrassingly scalable. Use a k whose
    sqrt is exactly representable (16 -> 0.25) so the scale factor is
    bit-identical across engines."""
    v = _col(vec)
    k = len(matrix)
    scale = 1.0 / (k**0.5)
    return F.array(
        *[
            (dot(v, F.array(*[F.lit(x) for x in row])) * F.lit(scale))
            for row in matrix
        ]
    )
