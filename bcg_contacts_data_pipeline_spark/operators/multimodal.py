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
- Decoders are pluggable: the real decoder is gated behind an import-try
  (PIL / soundfile / av are not in this container); the default is a
  deterministic fake derived from the payload bytes, which keeps every
  pipeline stage testable and oracle-checkable. The fake's arithmetic is
  intentionally SQL-expressible (hex-char ascii math) so DuckDB can verify
  the full mapInPandas round trip.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - PIL is not installed in the test container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


# ---------------------------------------------------------------------------
# Payload synthesis (test fixture path — real pipelines read binary columns
# straight from parquet; this derives one deterministically from text)
# ---------------------------------------------------------------------------

def with_fake_payload(df: DataFrame, text_col: str) -> DataFrame:
    """Attach a deterministic binary payload column: ``unhex(repeat(md5(t),
    k))`` with k in 1..8 keyed on text length, i.e. 16..128 bytes per row.
    Pure JVM expressions — no Python in the synthesis path."""
    k = F.lit(1) + F.length(text_col) % 8
    return df.withColumn("payload", F.unhex(F.repeat(F.md5(F.col(text_col)), k)))


# ---------------------------------------------------------------------------
# Image decode
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, format string"
)

_FORMATS = ["png", "jpeg", "webp"]


def _fake_image_meta(b: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a real image header parse. Uses ascii
    codes of the payload's first hex chars so a SQL oracle can reproduce it
    exactly (ascii(substr(hex,1,1)) etc.)."""
    h = b.hex()
    width = 16 + ord(h[0]) + 2 * ord(h[1])
    height = 16 + ord(h[2]) + 2 * ord(h[3])
    fmt = _FORMATS[(ord(h[4]) + ord(h[5])) % 3]
    return width, height, fmt


def decode_image_meta(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """payload binary -> (doc_id, n_bytes, width, height, format).

    Real-decode path (PIL) raises until the dependency is provisioned; the
    Spark-side plumbing (schema, Arrow batching, payload pruning) is
    identical for both paths.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if _HAVE_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real image decode not wired: install path exists but "
                    "this build ships the deterministic fake only"
                )
            metas = [_fake_image_meta(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(b) for b in pdf[payload_col]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_META_SCHEMA)


# ---------------------------------------------------------------------------
# Video frame sampling
# ---------------------------------------------------------------------------

FRAME_SCHEMA = "doc_id bigint, frame_idx int, n_frames int, frame binary"


def _fake_n_frames(b: bytes) -> int:
    return 4 + ord(b.hex()[0]) % 13


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str = "payload", stride: int = 3
) -> DataFrame:
    """Treat the payload as a container with N frames; emit every
    ``stride``-th frame as its own row (doc_id, frame_idx, n_frames,
    frame-bytes). One input row fans out to ceil(N/stride) output rows —
    mapInPandas because a real demuxer is imperative Python; the fake
    slices 4-byte windows out of the payload (wrap-around)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, totals, frames = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                n = _fake_n_frames(b)
                for i in range(0, n, stride):
                    off = (4 * i) % max(len(b) - 4, 1)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    totals.append(n)
                    frames.append(bytes(b[off : off + 4]))
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
# Audio features
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = "doc_id bigint, sample_rate int, duration_s double"

_RATES = [8000, 16000, 44100]


def audio_features(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """payload -> (sample_rate, duration_s). Fake decode: rate keyed on a
    hex char, duration = n_bytes / rate (one IEEE division — exact for the
    oracle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates = [
                _RATES[ord(b.hex()[1]) % 3] for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "duration_s": [
                        len(b) / r for b, r in zip(pdf[payload_col], rates)
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_SCHEMA)
