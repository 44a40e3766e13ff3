"""Document chunking for training-data preparation.

Splitting long documents into fixed-budget, optionally-overlapping
windows is the step between raw corpus and tokenizer: every pretraining
pipeline shards documents into sequence-length-sized pieces. The unit
here is characters (a deterministic, engine-portable proxy for tokens;
``functions.text.token_count`` provides the token-side estimate), but
the operator is unit-agnostic — pass a precomputed length column to
chunk by anything.

Scale notes
-----------
Pure narrow transformation: ``sequence(0, len-1, stride)`` builds the
chunk offsets per row and ``posexplode`` expands them — no shuffle, no
UDF, whole-stage codegen end to end. Output row count grows by
``~len/stride`` per doc, which is the job's actual output size; there is
no intermediate blow-up beyond it. Chunk text is emitted only when
``keep_text=True`` so metadata-only consumers (count, audit, fingerprint
joins) never carry the payload through the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    stride: int | None = None,
    length_col: str | Column | None = None,
    keep_text: bool = False,
) -> DataFrame:
    """Explode each document into windows of ``size`` chars every
    ``stride`` chars (default ``stride=size``: disjoint; ``stride<size``:
    overlapping). Every document yields at least one chunk (an empty text
    yields one empty chunk), and every character lands in at least one
    chunk. Output: id, ``chunk_id`` (0-based), ``chunk_start`` (1-based
    char offset), ``chunk_len``, ``chunk_md5``, and ``chunk_text`` when
    requested.
    """
    if stride is None:
        stride = size
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    length = (
        F.length(F.col(text_col))
        if length_col is None
        else (F.col(length_col) if isinstance(length_col, str) else length_col)
    )
    offsets = F.sequence(
        F.lit(0), F.greatest(length - F.lit(1), F.lit(0)), F.lit(stride)
    )
    exploded = df.select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(offsets).alias("chunk_id", "chunk_start0"),
    )
    chunk = F.substring(
        F.col(text_col), F.col("chunk_start0") + F.lit(1), size
    )
    out = exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_start0") + F.lit(1)).cast("long").alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
        *( [chunk.alias("chunk_text")] if keep_text else [] ),
    )
    return out
