"""Python UDTF (Spark >= 3.5) — the table-function extensibility
surface, demonstrated but deliberately NOT in the certified registry:
the board's contract is zero Python eval nodes on certified queries
(tests/test_plans.py pins it), so the UDTF lives here as the documented
extension path next to pandas UDFs (SURVEY §2.10), proven working for
the day a user actually needs a row->rows expansion no generator
expression covers.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_id int, start long, length long")
class SplitRange:
    """Row -> rows: split [0, total) into fixed-size chunks — the shape
    of a custom work-partitioner (frame extraction, byte-range fetch)."""

    def eval(self, total: int, chunk: int):
        i, start = 0, 0
        while start < total:
            yield i, start, min(chunk, total - start)
            i += 1
            start += chunk


def test_python_udtf_expands_rows(spark):
    rows = SplitRange(lit(10), lit(4)).collect()
    assert [(r.chunk_id, r.start, r.length) for r in rows] == [
        (0, 0, 4),
        (1, 4, 4),
        (2, 8, 2),
    ]


def test_python_udtf_lateral_join_against_table(spark):
    # UDTF in the FROM clause, correlated against a real table — the
    # SQL surface a user ports from a TVF-capable warehouse.
    spark.udtf.register("split_range", SplitRange)
    df = spark.sql(
        """
        SELECT t.doc_id, s.chunk_id, s.start, s.length
        FROM (SELECT doc_id, n_chars FROM parquet.`/root/testdata/sf0.001/documents.parquet`
              ORDER BY doc_id LIMIT 3) t,
        LATERAL split_range(CAST(t.n_chars AS INT), 1000) s
        """
    )
    rows = df.collect()
    assert len(rows) >= 3
    # every doc's chunks tile [0, n_chars) exactly
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).collect()
    }
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        pos = 0
        for ch in chunks:
            assert ch.start == pos
            pos += ch.length
        assert pos == docs[doc_id]
