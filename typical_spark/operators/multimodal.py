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
    # bytes-aware batch sizing: cap rows per OUTPUT chunk so decoded
    # features + payloads held per step stay ~target_partition_mb
    # regardless of payload size (a fixed row count would blow memory on
    # large payloads). The cap is applied by RE-CHUNKING inside the
    # kernel — NOT by setting spark.sql.execution.arrow.maxRecordsPerBatch
    # on the live session, which would permanently change Arrow batch
    # sizing for every later pandas-UDF operator sharing the session (a
    # conf read at execution time, so save-restore around a lazy plan
    # build cannot scope it either). The INPUT Arrow batch size is the
    # session-level knob: set maxRecordsPerBatch at session build (see
    # session.get_spark extra_conf) when payloads are large enough that
    # even one default-sized input batch overflows executor memory.
    rows_per_batch = max(int(target_partition_mb / max(avg_payload_mb, 0.01)), 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for lo in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[lo:lo + rows_per_batch]
                ids, feats, dims, oks = [], [], [], []
                for mid, payload in zip(chunk[id_col], chunk[payload_col]):
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
                    {"media_id": ids, "feature": feats, "feat_dim": dims,
                     "decode_ok": oks}
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


# ---------------------------------------------------------------------------
# resize / frame-sample plumbing (decode-adjacent transforms)
# ---------------------------------------------------------------------------


def fake_resize(feature: np.ndarray, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for an image resize: average-pool the
    feature vector down to out_dim (the real hook would decode + resize
    pixels; the media libs are absent in this container — see
    real_decode_stub)."""
    v = np.asarray(feature, dtype=np.float64)
    pad = (-len(v)) % out_dim
    if pad:
        v = np.concatenate([v, np.zeros(pad)])
    return v.reshape(out_dim, -1).mean(axis=1)


def resize_features(
    feats: DataFrame,
    out_dim: int,
    feature_col: str = "feature",
    id_col: str = "media_id",
    resizer: Callable[[np.ndarray, int], np.ndarray] = fake_resize,
) -> DataFrame:
    """Batch resize over extracted features: one Arrow exchange, numpy
    per batch, schema (media_id, feature: array<double>). Same
    soft-failure contract as extract_features (bad rows -> NULL)."""
    src = feats.select(id_col, feature_col)
    schema = f"{id_col} long, feature array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for v in pdf[feature_col]:
                try:
                    out.append(
                        None if v is None else [float(x) for x in resizer(v, out_dim)]
                    )
                except Exception:
                    out.append(None)
            yield pd.DataFrame({id_col: pdf[id_col], "feature": out})

    return src.mapInPandas(batches, schema)


def frame_sample(
    media: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling plumbing for video-ish payloads: emit up to
    max_frames (media_id, frame_idx, frame: binary) rows per payload —
    here deterministic byte-stride windows standing in for real keyframe
    extraction (same seam as the decoder stubs), with the Spark-side
    shape a real sampler needs: one input row fans out to N frame rows
    inside the Arrow batch, no driver involvement."""
    src = media.select(id_col, payload_col)
    schema = f"{id_col} long, frame_idx int, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                n = min(max(len(b) // every_n_bytes, 1), max_frames)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return src.mapInPandas(batches, schema)
