"""Multimodal binary-column plumbing: schemas, Arrow batch shapes, fan-out,
and the deterministic fake decoders."""

import hashlib

import pyspark.sql.functions as F
import pytest

from bcg_contacts_data_pipeline_spark.operators import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_payload_is_md5_repeat(spark, docs):
    row = M.with_fake_payload(docs, "text").select("text", "payload").first()
    k = 1 + len(row.text) % 8
    want = bytes.fromhex(hashlib.md5(row.text.encode()).hexdigest() * k)
    assert bytes(row.payload) == want
    assert 16 <= len(row.payload) <= 128


def test_image_meta_schema_and_values(spark, docs):
    out = M.decode_image_meta(M.with_fake_payload(docs, "text"), "doc_id")
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:int,width:int,height:int,format:string>"
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert 16 <= r.n_bytes <= 128 and r.n_bytes % 16 == 0
        assert r.format in ("png", "jpeg", "webp")
        # hex chars are 0-9a-f: ascii 48..57 / 97..102
        assert 16 + 48 + 2 * 48 <= r.width <= 16 + 102 + 2 * 102


def test_frame_sample_fanout_and_bytes(spark, docs):
    withp = M.with_fake_payload(docs, "text")
    out = M.sample_frames(withp, "doc_id", stride=3)
    pdf = out.toPandas()
    # per-doc: frame indices are 0,3,6.. < n_frames
    for doc_id, grp in pdf.groupby("doc_id"):
        n = grp.n_frames.iloc[0]
        assert sorted(grp.frame_idx) == list(range(0, n, 3))
    # frame bytes: 4-byte slices with wrap-around
    first = withp.select("doc_id", "payload").first()
    sub = pdf[pdf.doc_id == first.doc_id].sort_values("frame_idx")
    b = bytes(first.payload)
    for _, r in sub.iterrows():
        off = (4 * r.frame_idx) % max(len(b) - 4, 1)
        assert bytes(r.frame) == b[off : off + 4]


def test_audio_features(spark, docs):
    out = M.audio_features(M.with_fake_payload(docs, "text"), "doc_id")
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r.sample_rate in (8000, 16000, 44100)
        assert r.duration_s > 0


def test_payload_pruned_before_shuffle(spark, docs):
    """The audio rollup must not shuffle the payload: mapInPandas projects
    it away, so the exchange above the agg carries only small columns."""
    audio = M.audio_features(M.with_fake_payload(docs, "text"), "doc_id")
    plan = (
        audio.groupBy("sample_rate")
        .count()
        ._sc._jvm.PythonSQLUtils.explainString(
            audio.groupBy("sample_rate").count()._jdf.queryExecution(),
            "formatted",
        )
    )
    exchange = [
        blk for blk in plan.split("\n\n") if blk.lstrip().startswith("(")
        and "Exchange" in blk.splitlines()[0]
    ]
    assert exchange, plan
    assert all("payload" not in blk for blk in exchange), plan
