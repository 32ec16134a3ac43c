"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with the Spark-side plumbing (schema, batching, partition
sizing) real and the codec layer stubbed.

The image/audio libraries are not in this container, so ``decode`` probes
for them and otherwise uses a clearly-marked deterministic fake (feature
vector = blake2b of the bytes, folded to float32) — the DATAFLOW
(mapInPandas over Arrow binary batches, bounded batch bytes, feature
schema) is exactly what a real decoder drops into; swap ``_fake_features``
for the PIL/torchaudio call and nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),    # opaque encoded bytes
    T.StructField("meta", T.StructType([         # typed metadata
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_DIM = 32


def synthetic_media(spark: SparkSession, n: int,
                    partitions: int | None = None) -> DataFrame:
    """Deterministic opaque-binary corpus for plumbing tests."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                payload = hashlib.blake2b(
                    f"media{i}".encode(), digest_size=64).digest() * (i % 7 + 1)
                rows.append((i, kind, f"application/x-fake-{kind}", payload,
                             (64 + i % 256, 64 + (i * 3) % 256, 1000 + i)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "mime",
                                              "payload", "meta"])

    base = spark.range(0, n, numPartitions=partitions
                       or spark.sparkContext.defaultParallelism)
    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _real_decoder_available() -> bool:
    try:  # pragma: no cover - not in this container
        import PIL.Image  # noqa: F401
        return True
    except Exception:
        return False


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB feature extractor — deterministic stand-in for a real decode.
    Replace with the actual decoder; everything around it is production
    plumbing."""
    need = dim * 4
    chunks = []
    i = 0
    while sum(len(c) for c in chunks) < need:
        chunks.append(hashlib.blake2b(payload, digest_size=64,
                                      salt=str(i).encode()).digest())
        i += 1
    h = b"".join(chunks)[:need]
    v = np.frombuffer(h, dtype=np.uint32).astype(np.float32)
    return v / np.float32(2**32)


def extract_features(media: DataFrame, batch_bytes: int = 64 << 20,
                     strict: bool = False) -> DataFrame:
    """media -> (media_id, kind, n_bytes, features array<float>).

    ``strict=True`` raises NotImplementedError when no real decoder is
    present (production mode); default uses the deterministic fake so the
    pipeline is testable here.
    """
    if strict and not _real_decoder_available():
        raise NotImplementedError(
            "no image/audio codec in this environment; install PIL/"
            "torchaudio or run with strict=False for the fake decoder")

    def gen(batches):
        for pdf in batches:
            # enforce the byte bound by SUB-batching: a run of rows whose
            # payloads sum past batch_bytes is flushed before decoding
            # more (Arrow's maxRecordsPerBatch bounds rows, not bytes —
            # one batch of large videos could otherwise hold GBs)
            start = 0
            acc = 0
            sizes = [len(bytes(p)) for p in pdf["payload"]]
            for i, sz in enumerate(sizes):
                acc += sz
                last = i == len(sizes) - 1
                if acc >= batch_bytes or last:
                    chunk = pdf.iloc[start:i + 1]
                    feats = [_fake_features(bytes(p)).tolist()
                             for p in chunk["payload"]]
                    yield pd.DataFrame({
                        "media_id": chunk["media_id"].to_numpy(),
                        "kind": chunk["kind"],
                        "n_bytes": sizes[start:i + 1],
                        "features": feats,
                    })
                    start, acc = i + 1, 0

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema="media_id long, kind string, n_bytes long, "
                    "features array<float>")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> one row per planned frame sample (timestamps from typed
    metadata — pure DataFrame, no decode needed for the PLAN)."""
    vids = media.filter(F.col("kind") == "video")
    return (vids.select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0), F.col("meta.duration_ms"),
            F.lit(every_ms))).alias("ts_ms")))
