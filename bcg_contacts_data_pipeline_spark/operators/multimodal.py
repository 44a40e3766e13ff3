"""Multimodal (image / audio / video) column operators.

Beyond-reference surface (the reference pipeline is text/TSV-only): a
large-scale training-data pipeline carries media as opaque ``binary``
columns plus typed metadata, with decode / feature-extraction / frame
sampling as Arrow-batched Pandas UDFs over ``mapInPandas``.

Design rules (the parts that matter at 100 TB):

- Media bytes stay in executor space end-to-end: ``mapInPandas`` streams
  Arrow record batches through the Python worker; nothing is collected to
  the driver. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the
  per-batch memory for wide binary payloads.
- Metadata extraction yields a SMALL projection (drop the payload as early
  as the plan allows) so downstream joins/aggs never shuffle blobs.
- IMAGE decode is REAL: ``parse_image_meta`` reads PNG IHDR, JPEG SOF,
  and WebP-VP8L headers with stdlib ``struct`` — no imaging library
  needed for metadata, which is what a 100 TB curation pass actually
  extracts (pixel decode belongs to the training loader, not the
  curation engine). The test fixture (``synthesize_image_payload``)
  emits GENUINE minimal image bytes (valid zlib-compressed PNG; JFIF
  JPEG with a real SOF0 segment; RIFF/VP8L WebP) whose dimensions are
  derived from the text column with SQL-expressible arithmetic, so a
  DuckDB oracle can verify the synthesize->encode->parse round trip
  end to end.
- AUDIO decode is REAL too: ``parse_audio_meta`` walks a RIFF/WAVE
  container's fmt/data chunks with stdlib ``struct``; the fixture
  (``synthesize_audio_payload``) emits complete spec-valid PCM WAVs.
- VIDEO frame sampling is REAL too (since r7): ``mp4_bytes`` emits a
  conformant ISO-BMFF container with a genuine sample table, and
  ``parse_video_frames`` demuxes it with a stdlib box walk
  (ftyp/moov/trak/mdia/minf/stbl -> stsz/stco byte ranges resolved
  out of mdat) — no av/ffmpeg needed for sample extraction. Frame
  payloads are derived from the text column with SQL-expressible
  arithmetic so the synthesize->mux->demux round trip stays
  oracle-checkable end to end. Codec-level pixel/waveform DECODE is
  deliberately out of scope for all three modalities (that belongs
  to the training loader, not the curation engine).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Image synthesis (real bytes) + image header parse (real parse)
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, format string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_bytes(width: int, height: int) -> bytes:
    """A COMPLETE, spec-valid grayscale PNG: signature, IHDR, one IDAT
    holding zlib-compressed scanlines (filter byte 0 + `width` zero
    pixels per row), IEND — every chunk CRC'd. Any conformant PNG
    decoder reads this back as a width x height black image."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes(width)) * height
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def jpeg_bytes(width: int, height: int) -> bytes:
    """A JFIF JPEG header stream: SOI, APP0 (JFIF 1.1), a real SOF0
    frame segment carrying (precision=8, height, width, 1 grayscale
    component), EOI. No entropy-coded scan — header-complete is what a
    metadata pass reads; pixel decode is the training loader's job."""
    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def webp_bytes(width: int, height: int) -> bytes:
    """A RIFF/WEBP container with a VP8L chunk header: the lossless
    signature byte 0x2F then 14-bit (width-1), 14-bit (height-1),
    alpha and version bits — little-endian, exactly as libwebp lays
    them out. Dimension-complete; no lossless bitstream follows."""
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("VP8L dimensions are 14-bit")
    bits = (width - 1) | ((height - 1) << 14)
    vp8l = b"\x2f" + struct.pack("<I", bits)
    riff_payload = b"WEBP" + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) % 2:
        riff_payload += b"\x00"  # RIFF chunks are 2-byte aligned
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def parse_image_meta(b: bytes) -> tuple[int, int, str]:
    """Real image-header parse, stdlib only: PNG IHDR (with CRC check),
    JPEG marker walk to the SOF segment, WebP RIFF/VP8L bit unpack.
    Raises ValueError on anything unrecognized — silent garbage is how
    corrupt scrape payloads poison a corpus."""
    if b[:8] == _PNG_SIG:
        if b[12:16] != b"IHDR":
            raise ValueError("PNG missing IHDR")
        (crc,) = struct.unpack(">I", b[29:33])
        if crc != zlib.crc32(b[12:29]) & 0xFFFFFFFF:
            raise ValueError("PNG IHDR CRC mismatch")
        w, h = struct.unpack(">II", b[16:24])
        return w, h, "png"
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                raise ValueError("JPEG marker stream desynced")
            marker = b[i + 1]
            if marker == 0xD9:  # EOI before any SOF
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers carry no length
                continue
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            # SOF0-SOF15 minus the non-frame C-class markers (DHT/JPG/DAC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h, "jpeg"
            i += 2 + seglen
        raise ValueError("no SOF marker in JPEG stream")
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        if b[12:16] == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:
            bits = int.from_bytes(b[21:25], "little")
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp"
        raise ValueError("unsupported WEBP variant")
    raise ValueError("unrecognized image container")


IMAGE_PAYLOAD_SCHEMA = "doc_id bigint, payload binary"


def synthesize_image_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Fixture path: derive (width, height, format) from the text column
    with SQL-expressible arithmetic, then emit GENUINE image bytes for
    those dimensions. The oracle twin recomputes the dimensions from
    ``length(text)`` directly; Spark must round-trip them through real
    encode + real parse to agree:

        width  = 16 + length(text) % 64
        height = 16 + (length(text) * 7) % 64
        format = ['png','jpeg','webp'][length(text) % 3]

    mapInPandas (not a JVM expression) because PNG needs zlib — it's a
    fixture synthesizer; production pipelines read binary columns
    straight from parquet."""

    synth = {0: png_bytes, 1: jpeg_bytes, 2: webp_bytes}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = [len(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [
                        synth[n % 3](16 + n % 64, 16 + (n * 7) % 64)
                        for n in lens
                    ],
                }
            )

    # NULL text -> no fixture row: the kernels call len(text), and a
    # row with no text has no derivable media payload
    return df.select(id_col, text_col).filter(
        F.col(text_col).isNotNull()
    ).mapInPandas(
        batches, IMAGE_PAYLOAD_SCHEMA
    )


IMAGE_META_TOLERANT_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, format string,"
    " error string"
)


def decode_image_meta(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    strict: bool = True,
) -> DataFrame:
    """payload binary -> (doc_id, n_bytes, width, height, format) by
    actually parsing the bytes (``parse_image_meta``). Arrow-batched
    mapInPandas; the payload is pruned from the output so downstream
    plan stages never shuffle blobs.

    ``strict=True`` (default) propagates the first parse error and
    fails the job — right for curated inputs where corruption means a
    pipeline bug upstream. ``strict=False`` is the SCRAPE setting:
    per-row failures become rows with NULL dims/format and the error
    message in an ``error`` column, so one poisoned payload in a
    billion can't kill a 1000-executor job and the corruption RATE
    becomes a queryable signal (media_quarantine)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                metas = [parse_image_meta(b) for b in pdf[payload_col]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col].astype("int64"),
                        "n_bytes": [len(b) for b in pdf[payload_col]],
                        "width": [m[0] for m in metas],
                        "height": [m[1] for m in metas],
                        "format": [m[2] for m in metas],
                    }
                )
                continue
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    # scrape reality: the row exists, the blob never
                    # landed — quarantine, don't kill the worker
                    rows.append((None, None, None, "null payload"))
                    continue
                try:
                    w, h, fmt = parse_image_meta(b)
                    rows.append((w, h, fmt, None))
                except ValueError as e:
                    rows.append((None, None, None, str(e)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [
                        0 if b is None else len(b)
                        for b in pdf[payload_col]
                    ],
                    "width": pd.array(
                        [r[0] for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r[1] for r in rows], dtype="Int32"
                    ),
                    "format": [r[2] for r in rows],
                    "error": [r[3] for r in rows],
                }
            )

    schema = IMAGE_META_SCHEMA if strict else IMAGE_META_TOLERANT_SCHEMA
    return df.select(id_col, payload_col).mapInPandas(batches, schema)


# ---------------------------------------------------------------------------
# Video: real ISO-BMFF (MP4) synthesis + real box-walk demux of the
# sample table — frames come out of mdat via stsz/stco byte ranges.
# ---------------------------------------------------------------------------

FRAME_SCHEMA = "doc_id bigint, frame_idx int, n_frames int, frame binary"


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def mp4_bytes(frames: list[bytes]) -> bytes:
    """A minimal ISO-BMFF container holding ``frames`` as the video
    track's samples: ftyp, mdat (the concatenated sample bytes), and a
    moov whose stbl carries a REAL sample table — stsd (1 entry), stts
    (uniform delta), stsc (one chunk), stsz (per-sample sizes), stco
    (absolute chunk offset into mdat). A conformant demuxer recovers
    every sample's exact byte range from this; so does
    ``parse_video_frames`` below."""
    if not frames:
        raise ValueError("mp4_bytes needs at least one frame")
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = _box(b"mdat", b"".join(frames))
    mdat_payload_off = len(ftyp) + 8

    stsd = _box(
        b"stsd",
        struct.pack(">II", 0, 1)
        + _box(b"raw ", b"\x00" * 6 + struct.pack(">H", 1)),
    )
    stts = _box(b"stts", struct.pack(">IIII", 0, 1, n, 1))
    stsc = _box(b"stsc", struct.pack(">IIIII", 0, 1, 1, n, 1))
    stsz = _box(
        b"stsz",
        struct.pack(">III", 0, 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _box(b"stco", struct.pack(">III", 0, 1, mdat_payload_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdhd = _box(
        b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, 30, n, 0x55C4, 0)
    )
    hdlr = _box(
        b"hdlr", struct.pack(">II", 0, 0) + b"vide" + b"\x00" * 13
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(
        b"tkhd",
        struct.pack(">II", 0x00000007, 0)  # version 0, flags enabled
        + struct.pack(">IIII", 0, 1, 0, n)  # mtime, track id, rsvd, dur
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + b"\x00" * 36  # identity matrix slot (unread by the parser)
        + struct.pack(">II", 0, 0),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, 30, n)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 10
        + b"\x00" * 36
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _child_boxes(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        if ln < 8 or pos + ln > end:
            raise ValueError("malformed ISO-BMFF box length")
        yield b[pos + 4 : pos + 8], pos + 8, pos + ln
        pos += ln


def _find(b: bytes, start: int, end: int, tag: bytes) -> tuple[int, int]:
    for t, s, e in _child_boxes(b, start, end):
        if t == tag:
            return s, e
    raise ValueError(f"ISO-BMFF box {tag!r} not found")


def parse_video_frames(b: bytes) -> list[bytes]:
    """Real demux of the metadata path: walk ftyp/moov boxes to the
    sample table and slice every sample's bytes out of mdat via
    stco + cumulative stsz offsets. Raises ValueError on malformed
    containers. (Codec DECODE of the sample payloads is av/ffmpeg
    territory — a curation pass samples and routes bytes; it does not
    rasterize.)"""
    top = {t: (s, e) for t, s, e in _child_boxes(b, 0, len(b))}
    if b"ftyp" not in top or b"moov" not in top:
        raise ValueError("not an ISO-BMFF stream (ftyp/moov missing)")
    s, e = top[b"moov"]
    s, e = _find(b, s, e, b"trak")
    s, e = _find(b, s, e, b"mdia")
    s, e = _find(b, s, e, b"minf")
    s, e = _find(b, s, e, b"stbl")
    zs, ze = _find(b, s, e, b"stsz")
    _, fixed, count = struct.unpack(">III", b[zs : zs + 12])
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(
            struct.unpack(f">{count}I", b[zs + 12 : zs + 12 + 4 * count])
        )
    cs, ce = _find(b, s, e, b"stco")
    _, n_chunks = struct.unpack(">II", b[cs : cs + 8])
    if n_chunks != 1:
        raise ValueError("parser supports single-chunk tracks")
    (off,) = struct.unpack(">I", b[cs + 8 : cs + 12])
    frames, pos = [], off
    for ln in sizes:
        frames.append(bytes(b[pos : pos + ln]))
        pos += ln
    return frames


VIDEO_PAYLOAD_SCHEMA = "doc_id bigint, payload binary"


def synthesize_video_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Fixture path: ``n = 4 + length(text) % 13`` frames (the count is
    SQL-expressible for the oracle), each frame's bytes a deterministic
    function of (text, index), packed into a GENUINE ISO-BMFF container
    by ``mp4_bytes``."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf[text_col]:
                n = 4 + len(t) % 13
                payloads.append(
                    mp4_bytes(
                        [
                            hashlib.md5(f"{t}:{i}".encode()).digest()[: 6 + i % 5]
                            for i in range(n)
                        ]
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                }
            )

    # NULL text -> no fixture row: the kernels call len(text), and a
    # row with no text has no derivable media payload
    return df.select(id_col, text_col).filter(
        F.col(text_col).isNotNull()
    ).mapInPandas(
        batches, VIDEO_PAYLOAD_SCHEMA
    )


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str = "payload", stride: int = 3
) -> DataFrame:
    """Demux the container (REAL box walk, ``parse_video_frames``) and
    emit every ``stride``-th sample as its own row (doc_id, frame_idx,
    n_frames, frame-bytes). One input row fans out to ceil(N/stride)
    output rows — mapInPandas because a demuxer is imperative Python;
    the payload never reaches any downstream shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, totals, frames = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                all_frames = parse_video_frames(b)
                n = len(all_frames)
                for i in range(0, n, stride):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    totals.append(n)
                    frames.append(all_frames[i])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: real WAV (RIFF) synthesis + real header parse — same upgrade
# as the image family; soundfile/av stay unnecessary because PCM WAV
# metadata is a two-chunk stdlib walk.
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = "doc_id bigint, sample_rate int, n_samples int, duration_s double"

_RATES = [8000, 16000, 44100]


def wav_bytes(sample_rate: int, n_samples: int) -> bytes:
    """A COMPLETE, spec-valid PCM WAV: RIFF/WAVE container, fmt chunk
    (PCM, mono, 16-bit) and a data chunk of ``n_samples`` zero samples.
    Any conformant WAV reader decodes this as silence."""
    data = bytes(2 * n_samples)
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_audio_meta(b: bytes) -> tuple[int, int]:
    """Real WAV parse, stdlib only: verify the RIFF/WAVE container,
    walk chunks to ``fmt`` (sample rate, channels, bit depth) and
    ``data`` (byte length -> sample count). Raises ValueError on
    anything unrecognized, like parse_image_meta."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, n_samples, block = 12, None, None, None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (ln,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if tag == b"fmt ":
            fmt_code, channels, rate, _, block, bits = struct.unpack(
                "<HHIIHH", b[pos + 8 : pos + 24]
            )
            if fmt_code != 1:
                raise ValueError(f"non-PCM WAV (format {fmt_code})")
        elif tag == b"data":
            if block is None:
                raise ValueError("WAV data chunk before fmt")
            n_samples = ln // block
        pos += 8 + ln + (ln % 2)  # chunks are 2-byte aligned
    if rate is None or n_samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, n_samples


AUDIO_PAYLOAD_SCHEMA = "doc_id bigint, payload binary"


def synthesize_audio_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Fixture path, mirroring synthesize_image_payload: rate and
    sample count derive from the text column with SQL-expressible
    arithmetic, then GENUINE WAV bytes are emitted:

        sample_rate = [8000, 16000, 44100][length(text) % 3]
        n_samples   = 100 + (length(text) * 37) % 2000
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = [len(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [
                        wav_bytes(_RATES[n % 3], 100 + (n * 37) % 2000)
                        for n in lens
                    ],
                }
            )

    # NULL text -> no fixture row: the kernels call len(text), and a
    # row with no text has no derivable media payload
    return df.select(id_col, text_col).filter(
        F.col(text_col).isNotNull()
    ).mapInPandas(
        batches, AUDIO_PAYLOAD_SCHEMA
    )


def audio_features(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """payload -> (doc_id, sample_rate, n_samples, duration_s) by REAL
    WAV header parsing (``parse_audio_meta``); duration is ONE IEEE
    division (n_samples / rate), engine-exact for the oracle. Payload
    pruned from the output, as everywhere in this module."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [parse_audio_meta(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sample_rate": pd.Series(
                        [m[0] for m in metas], dtype="int32"
                    ),
                    "n_samples": pd.Series(
                        [m[1] for m in metas], dtype="int32"
                    ),
                    "duration_s": [m[1] / m[0] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_SCHEMA)
