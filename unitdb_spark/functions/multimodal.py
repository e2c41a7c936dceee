"""Multimodal column handling: opaque binary payloads + typed metadata.

Metadata extraction is REAL: container headers (PNG IHDR, JPEG SOF,
GIF block walk, WAV fmt/data chunks, MP4 box tree) are parsed from the
raw bytes by ``functions.media_codec`` — stdlib-only, no PIL/ffmpeg.
Only the pixel/sample-level kernels (resize, feature extraction) that
genuinely need a decode library or a model remain behind clearly-marked
deterministic stubs.

Design for 100 TB of media:
- media rows stay (id, media_type, blob BINARY, meta STRUCT); blobs
  never shuffle — extraction projects small typed columns first.
- mapInPandas streams Arrow batches, so peak executor memory is
  one batch of blobs, not one partition of decoded frames.
- a blob the sniffer can't claim yields NULL metadata, not an
  exception: at scale, corrupt files are data to audit, not crashes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unitdb_spark.functions.media_codec import parse_media

MEDIA_META_SCHEMA = (
    "id long, media_type string, container string, n_bytes long, "
    "width int, height int, n_frames int, sample_rate int, duration_s double"
)


def extract_media_meta(df: DataFrame) -> DataFrame:
    """(id, media_type, blob) -> one typed metadata row per blob, with
    the metadata parsed from the blob's REAL container header (see
    functions.media_codec): container sniffed from magic bytes, then
    width/height (PNG/JPEG/GIF/MP4), frame count (GIF descriptors,
    MP4 stsz), sample rate + duration (WAV fmt/data, MP4 mvhd).
    Unparseable blobs keep their row with NULL metadata.

    Arrow-batched mapInPandas: each batch decodes independently, blobs
    are dropped from the output immediately (never carried through a
    shuffle).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_media(b) for b in pdf["blob"]]
            out = pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "media_type": pdf["media_type"].values,
                    # object dtype end-to-end: None must reach Spark as
                    # NULL (a float column would smuggle NaN instead)
                    **{
                        k: pd.Series([m[k] for m in metas], dtype=object)
                        for k in (
                            "container", "width", "height",
                            "n_frames", "sample_rate", "duration_s",
                        )
                    },
                }
            )
            out.insert(
                2, "n_bytes",
                [len(bytes(b)) if b is not None else 0 for b in pdf["blob"]],
            )
            yield out[
                ["id", "media_type", "container", "n_bytes", "width",
                 "height", "n_frames", "sample_rate", "duration_s"]
            ]

    return df.select("id", "media_type", "blob").mapInPandas(_extract, MEDIA_META_SCHEMA)


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Deterministic media fixture over the driver's documents table:
    every doc becomes a REAL container blob (media_codec builders) whose
    parameters are closed-form in doc_id — so an SQL oracle can predict
    the parsed metadata exactly, and a hash-match on
    ``extract_media_meta(synthetic_media(docs))`` proves the header
    parser actually inverts the container layout (if the parser read
    the wrong bytes, nothing would line up).

    Cycle by doc_id % 5: PNG, JPEG, GIF (animated), WAV, MP4.
    """
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, kinds = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                t = d % 5
                if t == 0:
                    blobs.append(mc.build_png(d % 640 + 16, (d // 7) % 480 + 16, d % 64))
                    kinds.append("image")
                elif t == 1:
                    blobs.append(mc.build_jpeg(d % 320 + 16, (d // 5) % 240 + 16, d % 32))
                    kinds.append("image")
                elif t == 2:
                    blobs.append(mc.build_gif(d % 256 + 16, (d // 3) % 128 + 16, d % 4 + 1))
                    kinds.append("image")
                elif t == 3:
                    blobs.append(
                        mc.build_wav([8000, 16000, 44100][d % 3], d % 4000 + 100)
                    )
                    kinds.append("audio")
                else:
                    blobs.append(
                        mc.build_mp4(d % 1280 + 16, (d // 9) % 720 + 16,
                                     d % 60000 + 500, d % 300 + 1)
                    )
                    kinds.append("video")
            yield pd.DataFrame(
                {"id": pdf["doc_id"].values, "media_type": kinds, "blob": blobs}
            )

    return documents.select("doc_id").mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def synthetic_media_ext(documents: DataFrame) -> DataFrame:
    """Second-wave container fixture: BMP, TIFF (both byte orders) and
    MP3 — same closed-form-parameters contract as ``synthetic_media``
    so the oracle predicts every parsed field, exercising the extended
    parsers (BMP info header, TIFF IFD walk in either endianness, MP3
    frame walk over an ID3v2 skip).

    Cycle by doc_id % 5: BMP, TIFF-LE, TIFF-BE, MP3, FLAC.
    """
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, kinds = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                t = d % 5
                if t == 0:
                    blobs.append(mc.build_bmp(d % 512 + 8, (d // 5) % 256 + 8,
                                              d % 200))
                    kinds.append("image")
                elif t == 1:
                    blobs.append(mc.build_tiff(d % 1024 + 8, (d // 3) % 512 + 8,
                                               little_endian=True))
                    kinds.append("image")
                elif t == 2:
                    blobs.append(mc.build_tiff(d % 300 + 8, (d // 7) % 200 + 8,
                                               little_endian=False))
                    kinds.append("image")
                elif t == 3:
                    blobs.append(mc.build_mp3([44100, 48000, 32000][d % 3],
                                              d % 50 + 1, id3_len=d % 100))
                    kinds.append("audio")
                else:
                    blobs.append(mc.build_flac(
                        [8000, 22050, 44100][d % 3],
                        d * 997 % 100000 + 1000, frame_len=d % 300,
                    ))
                    kinds.append("audio")
            yield pd.DataFrame(
                {"id": pdf["doc_id"].values, "media_type": kinds, "blob": blobs}
            )

    return documents.select("doc_id").mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


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
    (id, media_type cycling image/audio/video, blob). These are NOT
    valid containers — extract_media_meta yields NULL metadata for them
    (the honest-failure path); use ``synthetic_media`` for blobs with
    real parseable headers. Still the fixture for the stub resize/
    feature kernels, which operate on raw bytes."""
    return df.select(
        F.col("doc_id").alias("id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("blob"),
    )
