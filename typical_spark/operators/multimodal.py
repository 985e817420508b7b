"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side contract (schemas, batch iteration, partition sizing) is
real and tested; the actual media decode is STUBBED — the container has
no image/audio libraries — behind `decoder=` hooks. A deterministic fake
decoder ships for tests; passing a real one (PIL/librosa/ffmpeg) is the
only change needed on a cluster with the libs installed.

Partitioning note for 100 TB of media: rows carry payloads of wildly
varying size, so the repartition knob here is bytes-based
(`target_partition_mb`) — compute the row-count per partition from the
average payload size, never a fixed row count.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, n_bytes long"
)

FEATURE_SCHEMA = "media_id long, feature array<float>, feat_dim int, decode_ok boolean"


def fake_decode(payload: bytes, feat_dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a media decoder: derives a feature
    vector from a stable digest of the bytes. Replace with a real
    decode+embed on a cluster with media libs."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((feat_dim * 4) // len(h) + 1))[: feat_dim * 4], dtype="<u4")
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def real_decode_stub(payload: bytes, feat_dim: int = 16) -> np.ndarray:
    """The real decoder hook. Media libraries are not available in this
    environment by design."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this "
        "container; pass decoder=fake_decode for plumbing tests or a real "
        "decoder on a properly provisioned cluster"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, int], np.ndarray] = real_decode_stub,
    payload_col: str = "payload",
    id_col: str = "media_id",
    feat_dim: int = 16,
    target_partition_mb: int = 256,
    avg_payload_mb: float = 1.0,
) -> DataFrame:
    """binary payloads -> feature vectors, Arrow batch at a time.

    mapInPandas (not a scalar pandas_udf) so one malformed payload fails
    soft per-row (decode_ok=False) without poisoning its whole batch.
    """
    src = media.select(id_col, payload_col)
    # bytes-aware batch sizing: cap rows per Arrow batch so a batch stays
    # ~target_partition_mb regardless of payload size (a fixed row count
    # would blow memory on large payloads)
    rows_per_batch = max(int(target_partition_mb / max(avg_payload_mb, 0.01)), 1)
    spark = src.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(rows_per_batch)
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats, dims, oks = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                try:
                    v = decoder(bytes(payload), feat_dim)
                    feats.append([float(x) for x in v])
                    dims.append(len(v))
                    oks.append(True)
                except NotImplementedError:
                    raise
                except Exception:
                    feats.append(None)
                    dims.append(0)
                    oks.append(False)
            yield pd.DataFrame(
                {"media_id": ids, "feature": feats, "feat_dim": dims, "decode_ok": oks}
            )

    return src.mapInPandas(batches, FEATURE_SCHEMA)


def media_metadata(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Typed metadata from the binary column without decoding: size plus
    cheap magic-byte sniffing — pure Catalyst (hex prefix compare)."""
    head = F.hex(F.substring(F.col(payload_col), 1, 4))
    mime = (
        F.when(head.startswith("89504E47"), "image/png")
        .when(head.startswith("FFD8FF"), "image/jpeg")
        .when(head.startswith("47494638"), "image/gif")
        .when(head.startswith("52494646"), "audio/wav")
        .otherwise("application/octet-stream")
    )
    return media.select(
        F.col(id_col),
        mime.alias("mime"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )
