"""operators/chunking.py — document windowing invariants."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_disjoint_chunks_cover_text_exactly(spark):
    text = "abcdefghij" * 5  # 50 chars
    out = chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", size=20, keep_text=True
    ).orderBy("chunk_id").collect()
    assert [r["chunk_start"] for r in out] == [1, 21, 41]
    assert [r["chunk_len"] for r in out] == [20, 20, 10]
    assert "".join(r["chunk_text"] for r in out) == text


def test_overlapping_stride(spark):
    text = "x" * 25
    out = chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", size=10, stride=5
    ).collect()
    # offsets 0,5,10,15,20 -> every char covered at least once
    assert len(out) == 5
    assert [r["chunk_len"] for r in sorted(out, key=lambda r: r["chunk_id"])] == [
        10, 10, 10, 10, 5,
    ]


def test_short_and_empty_text_yield_one_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "hi"), (2, "")]), "doc_id", "text", size=100
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 2
    assert by_id[1]["chunk_len"] == 2
    assert by_id[2]["chunk_len"] == 0
    assert by_id[2]["chunk_md5"] == hashlib.md5(b"").hexdigest()


def test_md5_matches_python(spark):
    text = "The quick brown fox jumps over the lazy dog"
    out = chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", size=16
    ).orderBy("chunk_id").collect()
    for r in out:
        piece = text[r["chunk_start"] - 1 : r["chunk_start"] - 1 + 16]
        assert r["chunk_md5"] == hashlib.md5(piece.encode()).hexdigest()


def test_multibyte_chars_counted_as_chars(spark):
    text = "中文" * 30  # 60 chars, multibyte UTF-8
    out = chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", size=25
    ).collect()
    assert sorted(r["chunk_len"] for r in out) == [10, 25, 25]


def test_invalid_size_raises(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), "doc_id", "text", size=0)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), "doc_id", "text", size=5, stride=-1)


def test_no_shuffle_in_plan(spark):
    """Chunking must stay a narrow transformation — no Exchange."""
    df = chunk_documents(
        _docs(spark, [(1, "abc" * 100)]), "doc_id", "text", size=50
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
