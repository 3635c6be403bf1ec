"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extension (no reference analog).  The pattern for 100 TB multimodal
corpora on Spark:

- payloads travel as a ``binary`` column next to a typed metadata
  struct (modality, mime, width/height/duration, byte size);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages so each Python worker touches a whole batch of
  payloads at once, and the *schema contract* of every stage is
  explicit — downstream stages keep composing as DataFrames;
- the actual codec work (PIL/ffmpeg/torchaudio) is NOT available in
  this container, so the codec boundary is stubbed: a clearly-marked
  deterministic fake keyed on the payload bytes.  The Spark-side
  plumbing — schema, partitioning, batch iteration, UDF signatures —
  is real and tested; swapping the fake for a real codec changes one
  function body and zero plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

_REAL_CODECS = False  # flips when PIL/ffmpeg are installed


def attach_metadata(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Wrap a raw binary column into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(f"{modality}/unknown").alias("mime"),
            F.length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB: deterministic fake image decode keyed on the payload hash.

    Replace with PIL ``Image.open(io.BytesIO(payload))`` when the codec
    libraries exist.  Raises for None payloads like a real decoder.
    """
    if payload is None:
        raise ValueError("cannot decode empty payload")
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 193,
        "height": 64 + h[1] % 193,
        "channels": 3,
        "mean_luma": h[2] / 255.0,
        "phash": int.from_bytes(h[3:11], "big", signed=True),
    }


def decode_images(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode a media DataFrame into per-image features via mapInPandas.

    Arrow-batched: each Python worker receives pandas batches, not rows.
    Null payloads yield null feature rows (decode failures must never
    kill a 100 TB job — they are data, not errors).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    feats = _fake_decode(payload)
                except Exception:
                    feats = {
                        "width": None,
                        "height": None,
                        "channels": None,
                        "mean_luma": None,
                        "phash": None,
                    }
                feats["media_id"] = mid
                out.append(feats)
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "channels", "mean_luma", "phash"],
            )

    return df.select("media_id", "payload").mapInPandas(
        _batches, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: real implementation needs PIL — the plumbing
    (signature, schema, batch shape) is what this defines."""
    if not _REAL_CODECS:
        raise NotImplementedError(
            "image resize requires PIL/opencv, not present in this "
            "environment; decode_images() demonstrates the mapInPandas "
            "plumbing with a deterministic fake"
        )


def sample_video_frames(df: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Frame-sampling stub (ffmpeg needed); deterministic fake emits one
    synthetic frame reference per payload so pipelines can be tested."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ref", T.StringType(), True),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = 1 if payload is None else 1 + (len(payload) % 3)
                for i in range(n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_ref": f"fake://media/{mid}/frame/{i}",
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ref"])

    return df.select("media_id", "payload").mapInPandas(_batches, schema=out_schema)
