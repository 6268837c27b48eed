"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode/feature-extraction libraries (PIL, ffmpeg, torchaudio …) are NOT
in this container, so the decode kernels are stubbed deterministically — but
the Spark-side plumbing is real and tested: schema (binary payload + typed
metadata struct), Arrow batch shape through mapInPandas, and partition-count
preservation. Swap `_decode_stub` for a real decoder on a cluster that has
the codec libraries installed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"

_FEATURE_DIM = 16


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: digest-seeded feature vector. A real
    deployment replaces this with PIL/ffmpeg decode + model features.
    Raises for unknown kinds (mirrors a codec error)."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.rand(_FEATURE_DIM).astype(np.float32)


def extract_media_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """binary payload → fixed-dim feature vector via mapInPandas.

    Arrow moves the binary column in batches to the Python worker; the
    decode runs per batch (vectorizable when a real decoder exists).
    Output schema: FEATURE_SCHEMA.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p) if p is not None else b"", k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (payloads are
    seeded pseudo-random bytes — opaque, as real codecs' output would be)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        digest = hashlib.sha256(f"media:{seed}:{i}".encode()).digest()
        payload = digest * (4 + i % 7)
        kind = kinds[i % 3]
        meta = {
            "width": 640 if kind != "audio" else None,
            "height": 480 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 1 if kind == "image" else 120,
            "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
        }
        rows.append((f"m{i:05d}", kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
