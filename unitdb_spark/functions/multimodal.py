"""Multimodal column handling: opaque binary payloads + typed metadata.

Media decode libraries (PIL/ffmpeg/librosa) are NOT in this container,
so the decode kernels are stubbed: ``decode_stub=True`` (default) runs
a deterministic fake decoder so the Spark-side plumbing — schema,
mapInPandas batch shape, partitioning — is real and tested; wiring a
real decoder is replacing one clearly-marked function body.

Design for 100 TB of media:
- media rows stay (id, media_type, blob BINARY, meta STRUCT); blobs
  never shuffle — extraction projects small typed columns first.
- mapInPandas streams Arrow batches, so peak executor memory is
  one batch of blobs, not one partition of decoded frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id long, media_type string, n_bytes long, width int, height int, "
    "n_frames int, sample_rate int, duration_s double"
)


def _fake_decode(blob: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a real media decoder.

    Derives plausible metadata purely from blob length/bytes so tests
    and oracles are reproducible. Replace with PIL/av/soundfile here.
    """
    n = len(blob)
    if media_type == "image":
        return {"width": n % 640 + 1, "height": (n // 7) % 480 + 1, "n_frames": 1,
                "sample_rate": 0, "duration_s": 0.0}
    if media_type == "audio":
        sr = 16000
        # plain IEEE division (no rounding) -> bit-identical to any SQL
        # oracle computing n/32000.0, regardless of rounding mode
        return {"width": 0, "height": 0, "n_frames": 0, "sample_rate": sr,
                "duration_s": n / 32000.0}
    if media_type == "video":
        return {"width": n % 1280 + 1, "height": (n // 11) % 720 + 1,
                "n_frames": n % 300 + 1, "sample_rate": 0,
                "duration_s": (n % 300 + 1) / 30.0}
    raise NotImplementedError(f"unknown media_type {media_type!r}")


def extract_media_meta(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """(id, media_type, blob) -> typed metadata row per blob.

    Arrow-batched mapInPandas: each batch decodes independently, blobs
    are dropped from the output immediately (never carried through a
    shuffle).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decoding requires PIL/av/soundfile — not in this container"
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_decode(bytes(b), mt)
                for b, mt in zip(pdf["blob"], pdf["media_type"])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "n_bytes", [len(bytes(b)) for b in pdf["blob"]])
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "id", pdf["id"].values)
            yield out

    return df.select("id", "media_type", "blob").mapInPandas(_extract, MEDIA_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (id, frame_idx) — generated JVM-side with sequence/explode, so the
    decode stage can repartition by id and stream frames without ever
    materializing a whole video's frames in one task."""
    meta = df
    return meta.filter(F.col("media_type") == "video").select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def audio_chunk_plan(df: DataFrame, chunk_s: float = 30.0) -> DataFrame:
    """Audio chunking *plan* (the audio analog of frame_sample_plan):
    one output row per fixed-length window to decode/transcribe —
    (id, chunk_idx, start_s, end_s) from the typed metadata, generated
    JVM-side with sequence/explode. The decode/ASR stage repartitions
    by id and streams windows; no task ever materializes a whole
    recording."""
    # NULL duration (a real decoder that failed to extract it) must
    # DROP the row, not fabricate a window: greatest() skips NULLs, so
    # guard explicitly — sequence(0, NULL) is NULL and explode drops it
    # (same behavior as frame_sample_plan on NULL n_frames)
    n_chunks = F.when(
        F.col("duration_s").isNotNull(),
        F.greatest(
            F.ceil(F.col("duration_s") / F.lit(float(chunk_s))).cast("int"),
            F.lit(1),
        ),
    )
    return (
        df.filter(F.col("media_type") == "audio")
        .select(
            "id",
            "duration_s",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "id",
            "chunk_idx",
            (F.col("chunk_idx") * chunk_s).alias("start_s"),
            F.least(
                (F.col("chunk_idx") + 1) * chunk_s, F.col("duration_s")
            ).alias("end_s"),
        )
    )


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224, decode_stub: bool = True
) -> DataFrame:
    """(id, media_type, blob) -> (id, width, height, blob) with image
    blobs resized to (width, height).

    Arrow-batched mapInPandas; output blob size is bounded by the
    target dims so the stage's memory and shuffle footprint is fixed
    regardless of input blob size — the property that matters when the
    input is 100 TB of mixed-size images. The stub "resize" is a
    deterministic byte resample (stride/repeat to width*height bytes);
    a real implementation replaces only ``_resample``.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real image resizing requires PIL — not in this container"
        )
    target = width * height

    def _resample(b: bytes) -> bytes:
        if not b:
            return bytes(target)
        if len(b) >= target:
            stride = len(b) // target
            return bytes(b[i * stride] for i in range(target))
        reps = target // len(b) + 1
        return (b * reps)[:target]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["media_type"] == "image"
            sub = pdf[mask]
            yield pd.DataFrame(
                {
                    "id": sub["id"].values,
                    "width": width,
                    "height": height,
                    "blob": [_resample(bytes(b)) for b in sub["blob"]],
                }
            )

    return df.select("id", "media_type", "blob").mapInPandas(
        _resize, "id long, width int, height int, blob binary"
    )


def extract_features(
    df: DataFrame, dim: int = 64, decode_stub: bool = True
) -> DataFrame:
    """(id, media_type, blob) -> (id, feature array<float>) embedding
    extraction — the bridge from raw media to the similarity-search
    operators (operators.similarity).

    The stub features are a deterministic byte-histogram projection
    (numpy, vectorized per Arrow batch) so downstream ANN plumbing is
    exercised end-to-end; a real model inference replaces only
    ``_featurize`` (same signature: one Arrow batch in, one out — which
    is also exactly the batch shape a GPU inference stage wants).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real feature extraction requires a vision/audio model — not in this container"
        )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf["blob"]:
                a = np.frombuffer(bytes(b), dtype=np.uint8)
                if a.size == 0:
                    feats.append(np.zeros(dim, dtype=np.float32).tolist())
                    continue
                hist = np.bincount(a % dim, minlength=dim).astype(np.float32)
                norm = float(np.linalg.norm(hist))
                feats.append((hist / norm if norm else hist).tolist())
            yield pd.DataFrame({"id": pdf["id"].values, "feature": feats})

    return df.select("id", "blob").mapInPandas(
        _featurize, "id long, feature array<float>"
    )


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter for TESTDATA: treat document text bytes as opaque blobs
    (id, media_type cycling image/audio/video, blob) — exercises the
    multimodal plumbing with driver-provided data only."""
    return df.select(
        F.col("doc_id").alias("id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("blob"),
    )
