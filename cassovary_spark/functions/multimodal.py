"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself is STUBBED (image/audio codecs are not available in
this environment): ``decode_stub_features`` computes deterministic
fake-features from the bytes so the full Spark-side pipeline — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested, and a
production deployment swaps ONE function body (the marked block) for
PIL/librosa/ffmpeg calls.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, feature array<float>"
)


def with_binary_payload(
    df: DataFrame, id_col: str, payload_source_col: str, media_type: str = "image"
) -> DataFrame:
    """Wrap any column's bytes as an opaque media payload row (used by tests
    to fabricate media tables from text columns)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(payload_source_col).cast("string"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_duration_ms"),
    )


def decode_stub_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    Arrow-batched: each batch arrives as a pandas DataFrame whose `payload`
    column holds bytes; features are computed vectorized with NumPy. THE
    DECODE IS A DETERMINISTIC FAKE — replace the marked block with a real
    decoder (PIL.Image.open / soundfile.read / av) in production.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b)).astype("int64")
            # --- STUB DECODE: deterministic bytes -> feature vector ------
            # Real impl: decode image/audio, resize/resample, model forward.
            feats = np.zeros((len(pdf), feature_dim), dtype="float32")
            for i, b in enumerate(payloads):
                if b:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    # bucket byte histogram into feature_dim bins, L1-normed
                    hist = np.bincount(arr % feature_dim, minlength=feature_dim)
                    feats[i] = hist / max(hist.sum(), 1)
            # --------------------------------------------------------------
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_stub(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling plumbing: explodes each video payload into frame
    rows ``(media_id, frame_idx, frame_ts_ms, frame_payload)``. Frame
    extraction is stubbed as byte-slicing; partitioning/row-explosion shape
    is the real production layout (frames >> videos => repartition after)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = [b or b"" for b in pdf["payload"]]
            mids = pdf["media_id"].to_numpy()
            n = np.minimum(
                max_frames,
                np.maximum(np.array([len(b) // 16 for b in payloads]), 1),
            ).astype(np.int64)
            rep = np.repeat(np.arange(len(pdf), dtype=np.int64), n)
            seg = np.cumsum(n) - n
            fi = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(seg, n)
            yield pd.DataFrame(
                {
                    "media_id": mids[rep],
                    "frame_idx": fi.astype("int32"),
                    "frame_ts_ms": (fi * every_ms).astype("int32"),
                    # STUB payload slice stands in for the av/ffmpeg frame
                    # decode; the batch shape (vectorized fan-out, one output
                    # row per sampled frame) is the real pipeline's
                    "frame_payload": [
                        bytes(payloads[r][i * 16 : (i + 1) * 16])
                        for r, i in zip(rep, fi)
                    ],
                }
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        sample,
        schema="media_id long, frame_idx int, frame_ts_ms int, frame_payload binary",
    )
