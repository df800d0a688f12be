"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages. The decode libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode step is STUBBED: ``decoder="stub"`` produces a
deterministic fake (seeded from the payload digest) with the real batch
shapes, schema, and partitioning; ``decoder="pil"`` is the real path,
gated behind an import-try, same signature.

The Spark-side contract (what 100 TB cares about) is fully real:
  * payloads never hit the driver; batches stream through Arrow,
  * feature vectors come back as array<float> ready for the similarity
    operators (operators/similarity.py),
  * oversized payloads are skipped with an error column, not a crash.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 64

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _stub_features(payload: bytes) -> np.ndarray:
    """Deterministic fake embedding: digest-seeded unit vector. Stands in
    for a real encoder; same dtype/shape contract."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    v = rng.normal(size=FEATURE_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def _pil_features(payload: bytes) -> np.ndarray:  # pragma: no cover
    from io import BytesIO

    from PIL import Image  # gated import; absent in this container

    img = Image.open(BytesIO(payload)).convert("L").resize((8, 8))
    v = np.asarray(img, dtype=np.float32).ravel()
    return v / (np.linalg.norm(v) or 1.0)


def extract_features(
    media: DataFrame,
    decoder: str = "stub",
    max_payload_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """media(doc_id, modality, payload, meta) -> feature vectors.

    mapInPandas keeps decode streaming per Arrow batch (payloads never
    materialize as a whole-partition list)."""
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
            decode = _pil_features
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "PIL not available in this environment; use decoder='stub'"
            ) from e
    elif decoder == "stub":
        decode = _stub_features
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    errs.append("null payload")
                elif len(payload) > max_payload_bytes:
                    feats.append(None)
                    errs.append(f"payload too large: {len(payload)}")
                else:
                    feats.append(decode(bytes(payload)).tolist())
                    errs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(fn, FEATURES_SCHEMA)


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        rows.append(
            (
                f"m{i:04d}",
                ("image", "audio", "video")[i % 3],
                bytearray(payload),
                (64, 64, 16000, 1 + i % 30, "application/octet-stream"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
