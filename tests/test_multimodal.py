"""Multimodal binary-column plumbing: schemas, Arrow batch shapes,
fan-out, and the REAL media parsers (PNG/JPEG/WebP headers, WAV chunk
walk, ISO-BMFF demux)."""

import hashlib

import pyspark.sql.functions as F
import pytest

from bcg_contacts_data_pipeline_spark.operators import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_image_roundtrip_real_bytes():
    """Every synthesizer's output parses back to its own dimensions —
    driver-side, no Spark, the core encode->parse contract."""
    for w, h in [(1, 1), (16, 79), (64, 16), (640, 480), (16383, 1)]:
        for fmt, synth in (
            ("png", M.png_bytes),
            ("jpeg", M.jpeg_bytes),
            ("webp", M.webp_bytes),
        ):
            if fmt != "webp" and (w > 65535 or h > 65535):
                continue
            assert M.parse_image_meta(synth(w, h)) == (w, h, fmt)


def test_png_is_spec_valid():
    """The PNG fixture is a COMPLETE image, not just a header: IDAT
    inflates to exactly height filtered scanlines of width zero-pixels,
    and every chunk CRC verifies."""
    import struct
    import zlib

    b = M.png_bytes(23, 7)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, []
    while pos < len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", b[pos + 8 + ln : pos + 12 + ln])
        assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF, tag
        chunks.append((tag, data))
        pos += 12 + ln
    assert [t for t, _ in chunks] == [b"IHDR", b"IDAT", b"IEND"]
    raw = zlib.decompress(chunks[1][1])
    assert raw == (b"\x00" + bytes(23)) * 7


def test_parse_rejects_garbage_and_corruption():
    with pytest.raises(ValueError, match="unrecognized"):
        M.parse_image_meta(b"\x00" * 64)
    # corrupt the IHDR CRC: silent garbage must not pass
    png = bytearray(M.png_bytes(8, 8))
    png[30] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        M.parse_image_meta(bytes(png))
    # JPEG with no SOF segment
    with pytest.raises(ValueError, match="SOF"):
        M.parse_image_meta(b"\xff\xd8\xff\xd9")


def test_image_meta_schema_and_values(spark, docs):
    out = M.decode_image_meta(
        M.synthesize_image_payload(docs, "doc_id", "text"), "doc_id"
    )
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:int,width:int,height:int,format:string>"
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for r in rows[:50]:
        n = len(texts[r.doc_id])
        assert r.width == 16 + n % 64
        assert r.height == 16 + (n * 7) % 64
        assert r.format == ["png", "jpeg", "webp"][n % 3]
        assert r.n_bytes > 0


def test_mp4_mux_demux_roundtrip():
    """mp4_bytes -> parse_video_frames recovers every sample's exact
    bytes; malformed containers are rejected loudly."""
    frames = [b"alpha", b"bb", b"x" * 31, b"", b"tail"]
    b = M.mp4_bytes(frames)
    assert b[4:8] == b"ftyp"
    assert M.parse_video_frames(b) == frames
    with pytest.raises(ValueError, match="ftyp/moov"):
        M.parse_video_frames(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="at least one frame"):
        M.mp4_bytes([])


def test_frame_sample_fanout_and_bytes(spark, docs):
    out = M.sample_frames(
        M.synthesize_video_payload(docs, "doc_id", "text"), "doc_id", stride=3
    )
    pdf = out.toPandas()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    # per-doc: n_frames = 4 + len(text) % 13, indices 0,3,6.. < n, and
    # the emitted bytes are EXACTLY the samples the fixture muxed in
    for doc_id, grp in pdf.groupby("doc_id"):
        t = texts[doc_id]
        n = 4 + len(t) % 13
        assert grp.n_frames.iloc[0] == n
        assert sorted(grp.frame_idx) == list(range(0, n, 3))
        for _, r in grp.iterrows():
            i = int(r.frame_idx)
            want = hashlib.md5(f"{t}:{i}".encode()).digest()[: 6 + i % 5]
            assert bytes(r.frame) == want


def test_wav_roundtrip_real_bytes():
    """The WAV fixture parses back to its own (rate, samples) — and is
    a COMPLETE PCM file: fmt declares mono 16-bit, data holds exactly
    2*n_samples bytes. Garbage and non-PCM streams are rejected."""
    import pytest
    import struct

    for rate, n in [(8000, 100), (16000, 1), (44100, 2099)]:
        assert M.parse_audio_meta(M.wav_bytes(rate, n)) == (rate, n)
    b = M.wav_bytes(16000, 5)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        M.parse_audio_meta(b"\x00" * 40)
    bad = bytearray(M.wav_bytes(8000, 4))
    struct.pack_into("<H", bad, 20, 7)  # fmt code 7 = mu-law, not PCM
    with pytest.raises(ValueError, match="non-PCM"):
        M.parse_audio_meta(bytes(bad))


def test_audio_features(spark, docs):
    out = M.audio_features(
        M.synthesize_audio_payload(docs, "doc_id", "text"), "doc_id"
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for r in rows[:50]:
        n = len(texts[r.doc_id])
        assert r.sample_rate == [8000, 16000, 44100][n % 3]
        assert r.n_samples == 100 + (n * 37) % 2000
        assert r.duration_s == r.n_samples / r.sample_rate


def test_payload_pruned_before_shuffle(spark, docs):
    """The audio rollup must not shuffle the payload: mapInPandas projects
    it away, so the exchange above the agg carries only small columns."""
    audio = M.audio_features(
        M.synthesize_audio_payload(docs, "doc_id", "text"), "doc_id"
    )
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


def test_tolerant_decode_quarantines_corruption(spark, docs):
    """strict=False: corrupt payloads become rows with NULL dims and an
    error message — never an exception, never a dropped row. Clean rows
    are identical to the strict path."""
    payload = M.synthesize_image_payload(docs, "doc_id", "text")
    corrupted = payload.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.overlay(F.col("payload"), F.lit(bytes([0])), F.lit(2), F.lit(1)),
        )
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    out = M.decode_image_meta(corrupted, "doc_id", strict=False)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()  # no row dropped
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for doc_id, r in rows.items():
        if doc_id % 5 == 0:
            assert r.format is None and r.width is None
            assert "unrecognized" in r.error
        else:
            n = len(texts[doc_id])
            assert r.error is None
            assert r.format == ["png", "jpeg", "webp"][n % 3]
            assert (r.width, r.height) == (16 + n % 64, 16 + (n * 7) % 64)

    # strict path on the same corrupted frame fails loudly
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        M.decode_image_meta(corrupted, "doc_id", strict=True).collect()
