"""Multimodal column handling: opaque binary payloads + typed metadata.

Metadata extraction is REAL: container headers (PNG IHDR, JPEG SOF,
GIF block walk, WAV fmt/data chunks, MP4 box tree) are parsed from the
raw bytes by ``functions.media_codec`` — stdlib-only, no PIL/ffmpeg.
Pixel/sample kernels are REAL for everything stdlib can decode:
24-bit BMP decode → true nearest-neighbor resize → re-encode
(`resize_bmp_images`), WAV PCM16 sample statistics (`pcm_features`),
8-bit truecolor PNG — a genuinely COMPRESSED container — via
stdlib zlib inflate + per-scanline unfilter (`resize_png_images`,
`png_pixel_stats`), GIF via a real LZW codec, and baseline JPEG via
a real entropy decoder (Huffman + dequant + IDCT + pinned integer
YCbCr→RGB: `resize_jpeg_images`, `synthetic_jpeg_media`) — including
4:2:0 subsampling, restart markers, and PROGRESSIVE (SOF2) streams
(`synthetic_jpeg_prog_media`/`resize_jpeg_prog_images`: DC+AC
first/refinement scans, EOB runs, correction bits). Only model
inference (and codecs genuinely outside a from-scratch scope: MP4
video frames) remains behind a clearly-marked deterministic stub.

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


def _media_ids(documents: DataFrame) -> DataFrame:
    """doc_id relation for the fixture builders, repartitioned to the
    session's parallelism BEFORE the expensive per-blob kernel: the
    documents table is small enough to arrive as 1-2 parquet splits
    (5.9 MB even at sf1), and without this every per-blob
    encode/decode stage runs on 1-2 of the 32 cores — the round-9
    sweep found media_flac_pcm spending 18 of its 19.8 s at sf1
    single-threaded. Shuffling a bare id column is ~free; the blob
    work then scales with the cluster, which is the property that
    matters at real media-table sizes."""
    sc = documents.sparkSession.sparkContext
    return documents.select("doc_id").repartition(sc.defaultParallelism)


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

    return _media_ids(documents).mapInPandas(
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

    return _media_ids(documents).mapInPandas(
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
        # the REAL pixel path: magic-byte dispatch to the per-container
        # kernels (BMP24 / PNG inflate+unfilter / GIF LZW / baseline+
        # progressive JPEG / TIFF) in one Arrow-batched pass; output
        # schema additionally carries the sniffed input `container`
        # (NULL container/blob for unclaimed formats — the
        # honest-failure contract). Closed round 9 — was a
        # NotImplementedError stub.
        return resize_mixed_images(df, width, height)
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


def _decode_rgb_any(bb: bytes):
    """Magic-byte dispatch to the repo's REAL per-container pixel
    decoders, normalized to an (h, w, 3) uint8 RGB array (BMP decodes
    BGR and is flipped here); None for unclaimed/undecodable blobs."""
    from unitdb_spark.functions.media_codec import (
        decode_bmp24,
        decode_gif_rgb,
        decode_jpeg_any_rgb,
        decode_png_rgb_any,
        decode_tiff_rgb,
    )

    c = sniff_container(bb)
    if c == "bmp":
        a = decode_bmp24(bb)
        return a[..., ::-1] if a is not None else None
    if c == "png":
        return decode_png_rgb_any(bb)
    if c == "gif":
        return decode_gif_rgb(bb)
    if c == "tiff":
        return decode_tiff_rgb(bb)
    if c == "jpeg":
        return decode_jpeg_any_rgb(bb)
    return None


def image_classical_features(df: DataFrame, gray_bins: int = 16) -> DataFrame:
    """(id, media_type, blob) -> (id, container, n_pixels, gray_hist,
    orient_hist): REAL pixel decode (magic-byte dispatch over the
    per-container kernels), then fully INTEGER classical image
    features, so a SQL oracle can replicate them exactly over
    closed-form fixtures:

    - integer luma  y = (77*R + 150*G + 29*B) >> 8   (BT.601-flavor
      fixed-point, pinned — no float anywhere);
    - ``gray_bins``-bin luma histogram (counts, bin = y div
      (256/gray_bins));
    - HOG-lite 8-octant orientation histogram over central
      differences on INTERIOR pixels: gx = y(x+1,y) - y(x-1,y),
      gy = y(x,y+1) - y(x,y-1), octant = 4*[gy<0] + 2*[gx<0] +
      [|gy|>|gx|] (pure integer comparisons — no atan2), weighted by
      the L1 magnitude |gx| + |gy|.

    Undecodable blobs keep their row with NULL container/histograms
    (the honest-failure contract shared with resize_mixed_images).

    Scale: Arrow-batched mapInPandas, one row out per blob (never
    pixels); the numpy kernel is vectorized over each image.
    """
    if 256 % gray_bins:
        raise ValueError("image_classical_features: gray_bins must divide 256")

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                bb = bytes(b) if b is not None else b""
                rgb = _decode_rgb_any(bb)
                if rgb is None:
                    rows.append((int(i), None, None, None, None))
                    continue
                r = rgb[..., 0].astype(np.int64)
                g = rgb[..., 1].astype(np.int64)
                bl = rgb[..., 2].astype(np.int64)
                y = (77 * r + 150 * g + 29 * bl) >> 8
                gray = np.bincount(
                    y.ravel() // (256 // gray_bins), minlength=gray_bins
                ).astype(np.int64)
                h, w = y.shape
                orient = np.zeros(8, dtype=np.int64)
                if h >= 3 and w >= 3:
                    gx = (y[1:-1, 2:] - y[1:-1, :-2]).ravel()
                    gy = (y[2:, 1:-1] - y[:-2, 1:-1]).ravel()
                    octant = (
                        4 * (gy < 0) + 2 * (gx < 0) + (np.abs(gy) > np.abs(gx))
                    )
                    orient = np.bincount(
                        octant, weights=np.abs(gx) + np.abs(gy), minlength=8
                    ).astype(np.int64)
                rows.append(
                    (
                        int(i),
                        sniff_container(bb),
                        int(y.size),
                        gray.tolist(),
                        orient.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "container", "n_pixels", "gray_hist", "orient_hist"],
            )

    return df.select("id", "blob").mapInPandas(
        _feat,
        "id long, container string, n_pixels long, "
        "gray_hist array<long>, orient_hist array<long>",
    )


def extract_features(
    df: DataFrame, dim: int = 64, decode_stub: bool = True
) -> DataFrame:
    """(id, media_type, blob) -> (id, feature array<float>) embedding
    extraction — the bridge from raw media to the similarity-search
    operators (operators.similarity).

    The stub features are a deterministic byte-histogram projection
    (numpy, vectorized per Arrow batch) so downstream ANN plumbing is
    exercised end-to-end; ``decode_stub=False`` switches to the REAL
    pixel path: magic-byte decode and a ``dim``-bin integer-luma
    histogram, L2-normalized (classical features — no model weights;
    closed round 9, was a NotImplementedError stub). A real model
    inference would replace only ``_featurize`` (same signature: one
    Arrow batch in, one out — which is also exactly the batch shape a
    GPU inference stage wants).
    """
    if not decode_stub:

        def _featurize_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                feats = []
                for b in pdf["blob"]:
                    rgb = _decode_rgb_any(bytes(b) if b is not None else b"")
                    if rgb is None:
                        feats.append(None)
                        continue
                    r = rgb[..., 0].astype(np.int64)
                    g = rgb[..., 1].astype(np.int64)
                    bl = rgb[..., 2].astype(np.int64)
                    luma = (77 * r + 150 * g + 29 * bl) >> 8
                    hist = np.bincount(
                        (luma.ravel() * dim) >> 8, minlength=dim
                    ).astype(np.float32)
                    norm = float(np.linalg.norm(hist))
                    feats.append((hist / norm if norm else hist).tolist())
                yield pd.DataFrame(
                    {"id": pdf["id"].values, "feature": feats}
                )

        return df.select("id", "blob").mapInPandas(
            _featurize_real, "id long, feature array<float>"
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


# ----------------------------------------- real pixel/sample kernels
#
# Uncompressed containers don't need PIL/ffmpeg — these kernels do the
# actual work on the actual bytes: BMP24 pixel arrays (decode, true
# nearest-neighbor resample, re-encode) and WAV PCM16 samples (energy,
# RMS, zero-crossings). The `decode_stub` paths above remain ONLY for
# compressed formats (JPEG/MP4 pixels genuinely need a decode
# library).


def synthetic_bmp_media(
    documents: DataFrame, seed_mod: int | None = None
) -> DataFrame:
    """Real-pixel BMP fixture: every doc becomes a VALID 24-bit BMP
    whose dimensions AND every pixel are closed-form in doc_id —
    pixel (x, y) holds BGR = ((s + 3x + 7y) % 256,
    (2s + 5x + 11y) % 256, (3s + x + 13y) % 256) with s = doc_id % 251
    — so an SQL oracle can predict any derived pixel statistic, and a
    hash-match proves the decode→resample→encode path touches the
    right bytes.

    ``seed_mod`` switches to the DUPLICATE-CLASS variant (fixed 16×16
    dims, s = doc_id % seed_mod): docs sharing a residue class carry
    byte-identical images — the planted ground truth for perceptual
    dedup. This variant uses a NONLINEAR pixel pattern
    (channel = (s+k)·(x+a)·(y+b) mod 256): a linear gradient
    thresholds at its mean into nearly the same bit pattern for every
    seed (the average-hash would then match everything to
    everything), while the products make different seeds genuinely
    different images."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                if seed_mod is not None:
                    sw, sh, s = 16, 16, d % seed_mod
                    X, Y = np.meshgrid(np.arange(sw), np.arange(sh))
                    arr = np.stack(
                        [
                            ((s + 1) * (X + 1) * (Y + 3)) % 256,
                            ((s + 2) * (X + 3) * (Y + 1) + 5 * X) % 256,
                            ((s + 3) * (X + 2) * (Y + 2) + 11 * Y) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    blobs.append(mc.encode_bmp24(arr))
                    continue
                sw, sh, s = d % 24 + 4, (d // 3) % 20 + 4, d % 251
                X, Y = np.meshgrid(np.arange(sw), np.arange(sh))
                arr = np.stack(
                    [
                        (s + 3 * X + 7 * Y) % 256,
                        (2 * s + 5 * X + 11 * Y) % 256,
                        (3 * s + X + 13 * Y) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                blobs.append(mc.encode_bmp24(arr))
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"].values,
                    "media_type": "image",
                    "blob": blobs,
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def resize_bmp_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for 24-bit BMP blobs: decode the
    actual pixel array, resample with integer index math
    (sx = floor(X·sw/W)), re-encode as a valid BMP. Blobs the BMP24
    decoder doesn't claim (compressed formats, other depths) keep
    their row with a NULL blob — the honest-failure contract.

    Output blob size is bounded by the target dims regardless of input
    size — the fixed-footprint property that matters at 100 TB."""
    from unitdb_spark.functions.media_codec import resize_bmp24_nearest

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_bmp24_nearest(bytes(b), width, height)
                if b is not None
                else None
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "width": width,
                    "height": height,
                    "blob": pd.Series(out, dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _resize, "id long, width int, height int, blob binary"
    )


def bmp_pixel_stats(df: DataFrame) -> DataFrame:
    """Integer-exact pixel statistics from REAL BMP24 decode: per
    image, the dimensions, the plain channel-value sum, and a
    position-weighted checksum sum(v · p) over the flattened top-down
    BGR array (p = 1-based position) — order-sensitive, so a flipped,
    transposed, or channel-swapped decode cannot hash-match. NULL
    stats for undecodable blobs."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import decode_bmp24

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                arr = decode_bmp24(bytes(b)) if b is not None else None
                if arr is None:
                    rows.append((int(i), None, None, None, None))
                    continue
                flat = arr.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(i),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        int(flat.sum()),
                        int((flat * (np.arange(flat.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "width": pd.Series([r[1] for r in rows], dtype=object),
                    "height": pd.Series([r[2] for r in rows], dtype=object),
                    "px_sum": pd.Series([r[3] for r in rows], dtype=object),
                    "px_wsum": pd.Series([r[4] for r in rows], dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _stats, "id long, width int, height int, px_sum long, px_wsum long"
    )


def pcm_features(df: DataFrame) -> DataFrame:
    """REAL audio features from WAV PCM16 sample decode: per blob the
    sample rate, sample count, integer energy (sum of squared
    samples), strict zero-crossing count (v[i-1]·v[i] < 0), min/max
    sample, and rms_r = round(sqrt(energy / n), 6) — one pinned float
    expression, everything else exact BIGINT, so an SQL oracle that
    regenerates the samples matches bitwise. NULL features for blobs
    that aren't mono PCM16 WAV — the stub `extract_features` remains
    the path for formats that genuinely need a model/decoder."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        from unitdb_spark.functions.media_codec import decode_wav_pcm16

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                dec = decode_wav_pcm16(bytes(b)) if b is not None else None
                if dec is None or len(dec[1]) == 0:
                    rows.append((int(i),) + (None,) * 6 + (None,))
                    continue
                sr, s = dec
                v = s.astype(np.int64)
                energy = int((v * v).sum())
                zc = int(((v[:-1] * v[1:]) < 0).sum()) if v.size > 1 else 0
                # same pinned expression as the SQL replay:
                # round(sqrt(double(energy) / double(n)), 6) — convert
                # each operand to double BEFORE dividing (int/int true
                # division would round once instead of twice and
                # diverge from SQL past 2^53) — half-up on the
                # shortest repr like Spark's round()
                from decimal import ROUND_HALF_UP, Decimal

                rms = float(
                    Decimal(
                        repr(math.sqrt(float(energy) / float(v.size)))
                    ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                )
                rows.append(
                    (int(i), sr, int(v.size), energy, zc,
                     int(v.min()), int(v.max()), rms)
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "sample_rate": pd.Series([r[1] for r in rows], dtype=object),
                    "n_samples": pd.Series([r[2] for r in rows], dtype=object),
                    "energy": pd.Series([r[3] for r in rows], dtype=object),
                    "zero_crossings": pd.Series([r[4] for r in rows], dtype=object),
                    "v_min": pd.Series([r[5] for r in rows], dtype=object),
                    "v_max": pd.Series([r[6] for r in rows], dtype=object),
                    "rms_r": pd.Series([r[7] for r in rows], dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _feat,
        "id long, sample_rate int, n_samples long, energy long, "
        "zero_crossings long, v_min long, v_max long, rms_r double",
    )


def pcm_frame_features(df: DataFrame, frame: int = 256) -> DataFrame:
    """REAL windowed audio features from WAV PCM16 decode — the
    voice-activity/silence-detection primitive `pcm_features` (whole
    blob) cannot express: the samples are cut into fixed ``frame``-
    sample frames and each frame is reduced to exact integers —
    sample count, energy (Σv²), strict zero crossings (v[j-1]·v[j]<0
    attributed to the frame of j, so boundary crossings count exactly
    once corpus-wide), peak |v| — plus rms_r via the family's pinned
    round(sqrt(double/double), 6) finish. Blobs that aren't mono
    PCM16 WAV produce no rows (frame relation, not a per-doc one).

    Scale: the decode is Arrow-batched mapInPandas, embarrassingly
    partition-parallel; the per-frame reduction happens inside the
    batch (numpy reshape), so the exploded frame relation — the only
    output — is ~n_samples/frame rows per blob, never raw samples.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np

        from unitdb_spark.functions.media_codec import decode_wav_pcm16

        for pdf in batches:
            ids, fidx, ns, en, zcs, pks, rms = [], [], [], [], [], [], []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                dec = decode_wav_pcm16(bytes(b)) if b is not None else None
                if dec is None or len(dec[1]) == 0:
                    continue
                _, s = dec
                v = s.astype(np.int64)
                n = v.size
                nf = (n + frame - 1) // frame
                cross = np.zeros(n, dtype=np.int64)
                if n > 1:
                    cross[1:] = (v[:-1] * v[1:]) < 0
                for f in range(nf):
                    seg = v[f * frame:(f + 1) * frame]
                    e = int((seg * seg).sum())
                    ids.append(int(i))
                    fidx.append(f)
                    ns.append(int(seg.size))
                    en.append(e)
                    zcs.append(int(cross[f * frame:(f + 1) * frame].sum()))
                    pks.append(int(np.abs(seg).max()))
                    rms.append(
                        float(
                            Decimal(
                                repr(math.sqrt(float(e) / float(seg.size)))
                            ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                        )
                    )
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(fidx, dtype="int64"),
                    "n": pd.array(ns, dtype="int64"),
                    "energy": pd.array(en, dtype="int64"),
                    "zero_crossings": pd.array(zcs, dtype="int64"),
                    "peak": pd.array(pks, dtype="int64"),
                    "rms_r": pd.array(rms, dtype="float64"),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _feat,
        "id long, frame_idx long, n long, energy long, "
        "zero_crossings long, peak long, rms_r double",
    )


def bmp_ahash_chunks(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash from REAL BMP pixels: nearest-neighbor
    resample to grid×grid (integer index math), integer grayscale
    (b+g+r)//3, threshold strictly above the floor mean — 64 bits,
    emitted as four 16-bit chunks (the pigeonhole banding unit
    `ahash_pairs` joins on, and small positive ints that never touch
    the signed-64 edge). NULL chunks for undecodable blobs.

    Everything is integer arithmetic on closed-form-checkable pixels,
    so a SQL oracle replays the hash bit for bit — unlike library
    pHashes whose DCT floats are engine-specific."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import decode_bmp24

        weights = 1 << (15 - np.arange(16, dtype=np.int64))
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["id"].values, pdf["blob"]):
                arr = decode_bmp24(bytes(blob)) if blob is not None else None
                if arr is None:
                    rows.append((int(i), None, None, None, None))
                    continue
                sh, sw, _ = arr.shape
                xs = (np.arange(grid) * sw) // grid
                ys = (np.arange(grid) * sh) // grid
                px = arr[np.ix_(ys, xs)].astype(np.int64)
                gray = px.sum(axis=-1) // 3
                mean = int(gray.sum()) // (grid * grid)
                bits = (gray > mean).astype(np.int64).reshape(-1)
                cs = [
                    int((bits[16 * j : 16 * (j + 1)] * weights).sum())
                    for j in range(4)
                ]
                rows.append((int(i), *cs))
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    **{
                        f"c{j}": pd.Series(
                            [r[j + 1] for r in rows], dtype=object
                        )
                        for j in range(4)
                    },
                }
            )

    return df.select("id", "blob").mapInPandas(
        _hash, "id long, c0 long, c1 long, c2 long, c3 long"
    )


def ahash_pairs(
    hashes: DataFrame, max_distance: int = 3, persist: str = "memory"
) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance over the
    average-hash: the Manku '07 pigeonhole — any pair within distance
    ``max_distance`` ≤ 3 agrees EXACTLY on at least one of the four
    16-bit chunks — so candidates meet on (chunk_index, chunk_value)
    buckets, never all-pairs, and bit_count(xor) confirms exactly.
    Same candidate-join shape as `operators.dedup.simhash_pairs`, fed
    by pixels instead of text.

    Output: (id_a, id_b, hamming), hamming ≤ max_distance.

    ``persist="memory"`` (default) caches the hash relation — one
    narrow row per image (id + four 16-bit chunks) — because it
    feeds FOUR consumers here (both candidate self-join sides and
    both confirm-join sides). When ``hashes`` is an expensive
    lineage (the per-blob codec decode in `bmp_ahash_chunks`), an
    uncached plan re-runs the whole decode per consumer (r13:
    media_dup_modularity re-ran the codec subtree 4+ times).
    ``persist="none"`` opts out; the cache is not unpersisted (the
    result is lazy — same accumulation note as
    `graph.triangle_counts`).
    """
    if max_distance > 3:
        raise ValueError(
            "ahash_pairs: 4-chunk pigeonhole only covers distance <= 3"
        )
    h = hashes.filter(F.col("c0").isNotNull())
    if persist == "memory":
        h = h.persist()
    melted = h.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), F.col(f"c{j}").alias("c"))
                for j in range(4)
            ])
        ).alias("kv"),
    ).select("id", "kv.j", "kv.c")
    a = melted.select(F.col("id").alias("id_a"), "j", "c")
    b = melted.select(F.col("id").alias("id_b"), "j", "c")
    cand = (
        a.join(b, ["j", "c"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ha = h.select(*[F.col(c).alias(f"{c}_a") for c in ("id", "c0", "c1", "c2", "c3")])
    hb = h.select(*[F.col(c).alias(f"{c}_b") for c in ("id", "c0", "c1", "c2", "c3")])
    dist = sum(
        F.bit_count(F.expr(f"c{j}_a ^ c{j}_b")) for j in range(4)
    )
    return (
        cand.join(ha, cand["id_a"] == ha["id_a"])
        .join(hb, cand["id_b"] == hb["id_b"])
        .select(cand["id_a"], cand["id_b"], dist.alias("hamming"))
        .filter(F.col("hamming") <= max_distance)
    )


def synthetic_png_media(documents: DataFrame) -> DataFrame:
    """Real-pixel PNG fixture — the COMPRESSED-container counterpart of
    `synthetic_bmp_media`: every doc becomes a VALID 8-bit truecolor
    PNG (zlib-deflated IDAT, real CRCs) whose dimensions AND every
    pixel are closed-form in doc_id — pixel (x, y) holds RGB =
    ((s + 5x + 3y) % 256, (2s + 7x + y) % 256, (3s + 2x + 11y) % 256)
    with s = doc_id % 241, sw = doc_id % 21 + 4, sh = (doc_id//5) % 17
    + 4 — so an SQL oracle can predict any derived pixel statistic.
    Each scanline is filtered with type (s + y) % 5, so a corpus
    exercises ALL five PNG filter reconstructions; a hash-match proves
    inflate + unfilter touch the right bytes."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                sw, sh, s = d % 21 + 4, (d // 5) % 17 + 4, d % 241
                X, Y = np.meshgrid(np.arange(sw), np.arange(sh))
                arr = np.stack(
                    [
                        (s + 5 * X + 3 * Y) % 256,
                        (2 * s + 7 * X + Y) % 256,
                        (3 * s + 2 * X + 11 * Y) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                filters = [(s + y) % 5 for y in range(sh)]
                blobs.append(mc.encode_png_rgb(arr, filters))
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"].values,
                    "media_type": "image",
                    "blob": blobs,
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def resize_png_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for 8-bit truecolor PNG blobs:
    inflate the IDAT, reconstruct every scanline through the five PNG
    filters, resample the actual pixel array with integer index math
    (sx = floor(X·sw/W)), re-encode as a valid PNG. Blobs the decoder
    doesn't claim (palette/alpha/16-bit/interlaced, other containers)
    keep their row with a NULL blob — the honest-failure contract.

    Output blob size is bounded by the target dims regardless of input
    size — the fixed-footprint property that matters at 100 TB."""
    from unitdb_spark.functions.media_codec import resize_png_nearest

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_png_nearest(bytes(b), width, height)
                if b is not None
                else None
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "width": width,
                    "height": height,
                    "blob": pd.Series(out, dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _resize, "id long, width int, height int, blob binary"
    )


def png_pixel_stats(df: DataFrame) -> DataFrame:
    """Integer-exact pixel statistics from REAL PNG decode (inflate +
    unfilter): per image the dimensions, the plain channel-value sum,
    and the position-weighted checksum sum(v · p) over the flattened
    top-down RGB array (p = 1-based) — order-sensitive, so a flipped,
    transposed, or channel-swapped decode cannot hash-match. NULL
    stats for undecodable blobs."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import decode_png_rgb

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                arr = decode_png_rgb(bytes(b)) if b is not None else None
                if arr is None:
                    rows.append((int(i), None, None, None, None))
                    continue
                flat = arr.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(i),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        int(flat.sum()),
                        int((flat * (np.arange(flat.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "width": pd.Series([r[1] for r in rows], dtype=object),
                    "height": pd.Series([r[2] for r in rows], dtype=object),
                    "px_sum": pd.Series([r[3] for r in rows], dtype=object),
                    "px_wsum": pd.Series([r[4] for r in rows], dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _stats, "id long, width int, height int, px_sum long, px_wsum long"
    )


def synthetic_png7_media(documents: DataFrame) -> DataFrame:
    """Adam7-INTERLACED PNG fixture: the SAME closed-form pixels as
    `synthetic_png_media` (dims sw = d%21+4, sh = (d//5)%17+4, seed
    s = d%241, the same RGB formulas) packed through the interlaced
    writer — sequential scanline y (across the seven passes) filtered
    with type (s + y) % 5, so every pass exercises every filter. The
    pixel CONTENT is container-independent, which is the proof trick:
    the non-interlaced oracle matches bitwise iff the Adam7
    reconstruction scatters every pixel to its exact grid position."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                sw, sh, s = d % 21 + 4, (d // 5) % 17 + 4, d % 241
                X, Y = np.meshgrid(np.arange(sw), np.arange(sh))
                arr = np.stack(
                    [
                        (s + 5 * X + 3 * Y) % 256,
                        (2 * s + 7 * X + Y) % 256,
                        (3 * s + 2 * X + 11 * Y) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                n_lines = mc.adam7_scanline_count(sw, sh)
                filters = [(s + y) % 5 for y in range(n_lines)]
                blobs.append(mc.encode_png_rgb_adam7(arr, filters))
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"].values,
                    "media_type": "image",
                    "blob": blobs,
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def resize_png7_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for Adam7-interlaced PNG blobs:
    de-interlace (seven independently-unfiltered passes scattered back
    to the grid), resample with integer index math, RE-ENCODE AS
    ADAM7 — the output blob runs the interlaced writer too. NULL blob
    for anything the decoder doesn't claim."""
    from unitdb_spark.functions.media_codec import resize_png_adam7_nearest

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_png_adam7_nearest(bytes(b), width, height)
                if b is not None
                else None
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "width": width,
                    "height": height,
                    "blob": pd.Series(out, dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _resize, "id long, width int, height int, blob binary"
    )


def png7_pixel_stats(df: DataFrame) -> DataFrame:
    """`png_pixel_stats` for either interlace method: decode through
    `decode_png_rgb_any` and reduce to the same order-sensitive
    integer statistics (channel sum + position-weighted checksum)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import decode_png_rgb_any

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                arr = decode_png_rgb_any(bytes(b)) if b is not None else None
                if arr is None:
                    rows.append((int(i), None, None, None, None))
                    continue
                flat = arr.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(i),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        int(flat.sum()),
                        int((flat * (np.arange(flat.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "width": pd.Series([r[1] for r in rows], dtype=object),
                    "height": pd.Series([r[2] for r in rows], dtype=object),
                    "px_sum": pd.Series([r[3] for r in rows], dtype=object),
                    "px_wsum": pd.Series([r[4] for r in rows], dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _stats, "id long, width int, height int, px_sum long, px_wsum long"
    )


def synthetic_agif_media(documents: DataFrame) -> DataFrame:
    """ANIMATED GIF fixture: every doc becomes a valid multi-frame
    GIF89a (NETSCAPE loop ext, per-frame GCE + REAL LZW data) whose
    frame count, dimensions, palette, and every frame's every index
    are closed-form in doc_id — frame f pixel (x, y) holds index
    (s + 5x + 3y + 11f) % 256 with s = doc_id % 241, sw = d % 13 + 4,
    sh = (d//5) % 11 + 4, nf = d % 7 + 2; palette entry p is RGB
    ((p + s) % 256, (2p + s) % 256, (3p + 2s) % 256). An SQL oracle
    predicts any sampled frame's statistics from doc_id alone."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                sw, sh = d % 13 + 4, (d // 5) % 11 + 4
                s, nf = d % 241, d % 7 + 2
                X, Y = np.meshgrid(np.arange(sw), np.arange(sh))
                frames = [
                    ((s + 5 * X + 3 * Y + 11 * f) % 256).astype(np.uint8)
                    for f in range(nf)
                ]
                pal = [
                    ((p + s) % 256, (2 * p + s) % 256, (3 * p + 2 * s) % 256)
                    for p in range(256)
                ]
                blobs.append(mc.encode_gif_animated(frames, pal))
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"].values,
                    "media_type": "video",
                    "blob": blobs,
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def gif_frame_stats(df: DataFrame, stride: int = 2) -> DataFrame:
    """REAL multi-frame decode + frame sampling — the video-pipeline
    primitive (decode, keep every ``stride``-th frame, reduce): each
    kept frame maps through the global palette to RGB and reduces to
    the family's order-sensitive integer statistics (channel sum +
    position-weighted checksum). Blobs outside `decode_gif_frames`'
    claim produce no rows.

    Scale: Arrow-batched mapInPandas; the emitted relation is
    ceil(frames/stride) rows per blob, never pixels.
    """

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import decode_gif_frames

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                got = decode_gif_frames(bytes(b)) if b is not None else None
                if got is None:
                    continue
                frames, pal = got
                for f in range(0, len(frames), stride):
                    rgb = pal[frames[f]]
                    flat = rgb.reshape(-1).astype(np.int64)
                    rows.append(
                        (
                            int(i), f, len(frames),
                            int(rgb.shape[1]), int(rgb.shape[0]),
                            int(flat.sum()),
                            int((flat * (np.arange(flat.size) + 1)).sum()),
                        )
                    )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "frame_idx": pd.array([r[1] for r in rows], dtype="int64"),
                    "n_frames": pd.array([r[2] for r in rows], dtype="int64"),
                    "width": pd.array([r[3] for r in rows], dtype="int64"),
                    "height": pd.array([r[4] for r in rows], dtype="int64"),
                    "px_sum": pd.array([r[5] for r in rows], dtype="int64"),
                    "px_wsum": pd.array([r[6] for r in rows], dtype="int64"),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _stats,
        "id long, frame_idx long, n_frames long, width long, "
        "height long, px_sum long, px_wsum long",
    )


def synthetic_gif_media(documents: DataFrame) -> DataFrame:
    """Real-pixel GIF fixture — the LZW counterpart of
    `synthetic_png_media`: every doc becomes a VALID single-image
    GIF87a (256-entry global color table, REAL LZW-compressed data)
    whose dimensions, every palette entry, and every index are
    closed-form in doc_id — index (x, y) = (s + 3x + 5y) % 256 with
    palette[i] = ((s + i) % 256, (2s + 3i) % 256, (3s + 7i) % 256),
    s = doc_id % 251, sw = doc_id % 19 + 4, sh = (doc_id // 7) % 15
    + 4 — so an SQL oracle can predict any derived pixel statistic.
    A hash-match proves the LZW decode (code-width growth, KwKwK
    chains), palette mapping, and row order are all byte-correct."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                sw, sh, s = d % 19 + 4, (d // 7) % 15 + 4, d % 251
                X, Y = np.meshgrid(np.arange(sw), np.arange(sh))
                idx = ((s + 3 * X + 5 * Y) % 256).astype(np.uint8)
                pal = [
                    ((s + i) % 256, (2 * s + 3 * i) % 256, (3 * s + 7 * i) % 256)
                    for i in range(256)
                ]
                blobs.append(mc.encode_gif_indexed(idx, pal))
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"].values,
                    "media_type": "image",
                    "blob": blobs,
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def resize_gif_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for single-image GIF blobs: LZW
    decode, resample the index array with integer index math
    (sx = floor(X·sw/W)) — the palette rides along untouched — and
    re-encode through the real LZW encoder. Blobs the decoder doesn't
    claim (local color tables, interlace, non-256 GCT, malformed LZW)
    keep their row with a NULL blob — the honest-failure contract.

    Output blob size is bounded by the target dims regardless of
    input size — the fixed-footprint property that matters at 100 TB."""
    from unitdb_spark.functions.media_codec import resize_gif_nearest

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_gif_nearest(bytes(b), width, height)
                if b is not None
                else None
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "width": width,
                    "height": height,
                    "blob": pd.Series(out, dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _resize, "id long, width int, height int, blob binary"
    )


def gif_pixel_stats(df: DataFrame) -> DataFrame:
    """Integer-exact pixel statistics from REAL GIF decode (LZW +
    palette mapping): per image the dimensions, the plain RGB
    channel-value sum, and the position-weighted checksum sum(v · p)
    over the flattened top-down RGB array (p = 1-based) —
    order-sensitive, so a flipped, transposed, palette-shifted, or
    mis-decoded stream cannot hash-match. NULL stats for undecodable
    blobs."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import decode_gif_rgb

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                arr = decode_gif_rgb(bytes(b)) if b is not None else None
                if arr is None:
                    rows.append((int(i), None, None, None, None))
                    continue
                flat = arr.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(i),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        int(flat.sum()),
                        int((flat * (np.arange(flat.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "width": pd.Series([r[1] for r in rows], dtype=object),
                    "height": pd.Series([r[2] for r in rows], dtype=object),
                    "px_sum": pd.Series([r[3] for r in rows], dtype=object),
                    "px_wsum": pd.Series([r[4] for r in rows], dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _stats, "id long, width int, height int, px_sum long, px_wsum long"
    )


def synthetic_jpeg_media(documents: DataFrame) -> DataFrame:
    """Real-pixel baseline-JPEG fixture — the ENTROPY-CODED
    counterpart of `synthetic_png_media`: every doc becomes a VALID
    baseline JFIF (real FDCT, flat quant 8, Huffman-coded scan with
    byte stuffing) whose dimensions AND every decoded pixel are
    closed-form in doc_id. Pixels are CONSTANT per 8x8 block — a
    constant block carries only its DC coefficient 8·(v−128), which a
    flat quant of 8 stores exactly — so lossy-format decode is still
    bit-exact by construction and an SQL oracle can predict any
    derived statistic. Block (bx, by) holds YCbCr =
    ((s + 3bx + 5by) % 256, (2s + 7bx + by) % 256,
    (3s + bx + 11by) % 256) with s = doc_id % 241,
    sw = 8·(doc_id % 3 + 2), sh = 8·((doc_id//5) % 3 + 2)."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                bw, bh, s = d % 3 + 2, (d // 5) % 3 + 2, d % 241
                BX, BY = np.meshgrid(np.arange(bw), np.arange(bh))
                blocks = np.stack(
                    [
                        (s + 3 * BX + 5 * BY) % 256,
                        (2 * s + 7 * BX + BY) % 256,
                        (3 * s + BX + 11 * BY) % 256,
                    ],
                    axis=-1,
                )
                arr = np.repeat(
                    np.repeat(blocks, 8, axis=0), 8, axis=1
                ).astype(np.uint8)
                blobs.append(mc.encode_jpeg_baseline(arr, quant=8))
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"].values,
                    "media_type": "image",
                    "blob": blobs,
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def resize_jpeg_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for baseline JPEG blobs: full
    entropy decode (Huffman, dequant, de-zigzag, IDCT, level shift,
    pinned integer YCbCr->RGB), integer-index resample, and LOSSLESS
    re-encode as an 8-bit truecolor PNG — a real pipeline never
    re-JPEGs intermediates (every generation loses), so the output
    container is deliberately PNG and composes with
    `png_pixel_stats`. Blobs the decoder doesn't claim (progressive,
    subsampled, 12-bit, truncated) keep their row with a NULL blob —
    the honest-failure contract.

    Output blob size is bounded by the target dims regardless of
    input size — the fixed-footprint property that matters at
    100 TB."""
    from unitdb_spark.functions.media_codec import resize_jpeg_nearest_png

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_jpeg_nearest_png(bytes(b), width, height)
                if b is not None
                else None
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "width": width,
                    "height": height,
                    "blob": pd.Series(out, dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _resize, "id long, width int, height int, blob binary"
    )


def synthetic_jpeg_prog_media(documents: DataFrame) -> DataFrame:
    """PROGRESSIVE-JPEG fixture: the SAME closed-form block-constant
    pixels as `synthetic_jpeg_media` packed through the SOF2 encoder
    (DC first/refine + per-component AC first/refine scans — EOBs,
    ZRL, correction bits all in the stream). Pixel content is
    container-independent, so the baseline fixture's oracle matches
    bitwise iff every progressive scan reconstructs its exact
    coefficients — the Adam7-PNG proof trick, applied to entropy
    coding."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                bw, bh, s = d % 3 + 2, (d // 5) % 3 + 2, d % 241
                BX, BY = np.meshgrid(np.arange(bw), np.arange(bh))
                blocks = np.stack(
                    [
                        (s + 3 * BX + 5 * BY) % 256,
                        (2 * s + 7 * BX + BY) % 256,
                        (3 * s + BX + 11 * BY) % 256,
                    ],
                    axis=-1,
                )
                arr = np.repeat(
                    np.repeat(blocks, 8, axis=0), 8, axis=1
                ).astype(np.uint8)
                blobs.append(mc.encode_jpeg_progressive(arr, quant=8))
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"].values,
                    "media_type": "image",
                    "blob": blobs,
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def resize_jpeg_prog_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """`resize_jpeg_images` for progressive (or baseline) blobs: the
    multi-scan coefficient accumulation runs for real, then the same
    integer-index resample and LOSSLESS PNG re-encode."""
    import numpy as np

    from unitdb_spark.functions.media_codec import (
        decode_jpeg_any_rgb,
        encode_png_rgb,
    )

    def _one(b):
        arr = decode_jpeg_any_rgb(b)
        if arr is None or width <= 0 or height <= 0:
            return None
        sh, sw, _ = arr.shape
        xs = (np.arange(width) * sw) // width
        ys = (np.arange(height) * sh) // height
        return encode_png_rgb(arr[np.ix_(ys, xs)])

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _one(bytes(b)) if b is not None else None
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "width": width,
                    "height": height,
                    "blob": pd.Series(out, dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _resize, "id long, width int, height int, blob binary"
    )


def synthetic_jpeg420_media(documents: DataFrame) -> DataFrame:
    """4:2:0 baseline-JPEG fixture — the SUBSAMPLED counterpart of
    `synthetic_jpeg_media`, exercising the real-world MCU layout
    (four Y blocks + decimated chroma per 16x16 macroblock): pixels
    are CONSTANT per macroblock, so chroma decimation and the
    replication upsample are lossless and the DC-only/flat-quant-8
    exactness argument carries over — every decoded pixel stays
    closed-form in doc_id. Macroblock (mx, my) holds YCbCr =
    ((s + 7mx + 3my) % 256, (2s + mx + 5my) % 256,
    (3s + 4mx + my) % 256) with s = doc_id % 241,
    sw = 16·(doc_id % 2 + 1), sh = 16·((doc_id//7) % 2 + 1)."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                mw, mh, s = d % 2 + 1, (d // 7) % 2 + 1, d % 241
                MX, MY = np.meshgrid(np.arange(mw), np.arange(mh))
                macros = np.stack(
                    [
                        (s + 7 * MX + 3 * MY) % 256,
                        (2 * s + MX + 5 * MY) % 256,
                        (3 * s + 4 * MX + MY) % 256,
                    ],
                    axis=-1,
                )
                arr = np.repeat(
                    np.repeat(macros, 16, axis=0), 16, axis=1
                ).astype(np.uint8)
                blobs.append(
                    mc.encode_jpeg_baseline(arr, quant=8, subsample="420")
                )
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"].values,
                    "media_type": "image",
                    "blob": blobs,
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def sniff_container(b: bytes) -> str | None:
    """Magic-byte container sniff — the dispatch key for mixed media
    columns (a real lake's `blob binary` column is never one format).
    Returns 'bmp' | 'png' | 'gif' | 'jpeg' | 'wav' | None; pure
    function so the mapInPandas kernels share it without a closure."""
    if b[:2] == b"BM":
        return "bmp"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if b[:2] == b"\xff\xd8":
        return "jpeg"
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    return None


def resize_mixed_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """ONE-pass mixed-container resize: sniff each blob's magic bytes
    and dispatch to the matching REAL pixel kernel (BMP24 / PNG
    inflate+unfilter / GIF LZW / baseline-JPEG entropy decode) inside
    a single Arrow-batched mapInPandas — no per-format scan, no
    per-format shuffle; at 100 TB a mixed media table is resized in
    one stage whose output size is bounded by the target dims.

    JPEG inputs re-encode LOSSLESSLY as PNG (the resize_jpeg_images
    contract: a real pipeline never re-JPEGs intermediates), so the
    output blob's container can differ from the input's — the emitted
    `container` column records the INPUT format. Unclaimed blobs keep
    their row with NULL container/blob (the honest-failure contract).
    """
    from unitdb_spark.functions.media_codec import (
        resize_bmp24_nearest,
        resize_gif_nearest,
        resize_jpeg_nearest_png,
        resize_png_nearest,
        resize_tiff_nearest,
    )

    kernels = {
        "bmp": resize_bmp24_nearest,
        "png": resize_png_nearest,
        "gif": resize_gif_nearest,
        "jpeg": resize_jpeg_nearest_png,
        "tiff": resize_tiff_nearest,
    }

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            conts, blobs = [], []
            for b in pdf["blob"]:
                bb = bytes(b) if b is not None else b""
                c = sniff_container(bb)
                k = kernels.get(c)
                out = k(bb, width, height) if k else None
                conts.append(c if out is not None else None)
                blobs.append(out)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "container": pd.Series(conts, dtype=object),
                    "width": width,
                    "height": height,
                    "blob": pd.Series(blobs, dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _resize,
        "id long, container string, width int, height int, blob binary",
    )


def mixed_pixel_stats(df: DataFrame) -> DataFrame:
    """Integer-exact pixel statistics for a MIXED resized column:
    sniff the (resized) blob and decode with the matching kernel
    (BMP24 / PNG / GIF — a resized JPEG is a PNG blob by the
    resize_mixed_images contract), then the same order-sensitive
    channel sum + position-weighted checksum as the per-format stats
    functions. The input's `container` column passes through so the
    report still says what each image WAS. NULL stats for
    undecodable blobs."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import (
            decode_bmp24,
            decode_gif_rgb,
            decode_png_rgb,
            decode_tiff_rgb,
        )

        decoders = {
            "bmp": decode_bmp24,
            "png": decode_png_rgb,
            "gif": decode_gif_rgb,
            "tiff": decode_tiff_rgb,
        }
        for pdf in batches:
            rows = []
            for i, c, b in zip(
                pdf["id"].values, pdf["container"], pdf["blob"]
            ):
                bb = bytes(b) if b is not None else b""
                dec = decoders.get(sniff_container(bb))
                arr = dec(bb) if dec else None
                if arr is None:
                    rows.append((int(i), c, None, None, None, None))
                    continue
                flat = arr.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(i),
                        c,
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        int(flat.sum()),
                        int((flat * (np.arange(flat.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "container": pd.Series([r[1] for r in rows], dtype=object),
                    "width": pd.Series([r[2] for r in rows], dtype=object),
                    "height": pd.Series([r[3] for r in rows], dtype=object),
                    "px_sum": pd.Series([r[4] for r in rows], dtype=object),
                    "px_wsum": pd.Series([r[5] for r in rows], dtype=object),
                }
            )

    return df.select("id", "container", "blob").mapInPandas(
        _stats,
        "id long, container string, width int, height int, "
        "px_sum long, px_wsum long",
    )


def synthetic_tiff_media(documents: DataFrame) -> DataFrame:
    """Real-pixel TIFF fixture: every doc becomes a VALID baseline
    uncompressed RGB8 TIFF whose dimensions AND every pixel are
    closed-form in doc_id — pixel (x, y) holds RGB =
    ((s + 4x + 9y) % 256, (2s + 6x + 5y) % 256, (3s + 2x + 7y) % 256)
    with s = doc_id % 239, dims sw = d % 22 + 4, sh = (d//4) % 18 + 4
    — and the BYTE ORDER alternates by doc parity (even = II, odd =
    MM), so the decoder's endian handling is part of every oracle
    hash, not just a unit test."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                sw, sh, s = d % 22 + 4, (d // 4) % 18 + 4, d % 239
                X, Y = np.meshgrid(np.arange(sw), np.arange(sh))
                arr = np.stack(
                    [
                        (s + 4 * X + 9 * Y) % 256,
                        (2 * s + 6 * X + 5 * Y) % 256,
                        (3 * s + 2 * X + 7 * Y) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                blobs.append(
                    mc.encode_tiff_rgb(arr, little_endian=d % 2 == 0)
                )
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"].values,
                    "media_type": "image",
                    "blob": blobs,
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def resize_tiff_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for baseline RGB8 TIFF blobs —
    the uncompressed-but-endian-rich 6th container kernel (decode the
    strip, integer-index resample, re-encode preserving the input's
    byte order). Unclaimed blobs keep their row with a NULL blob."""
    from unitdb_spark.functions.media_codec import resize_tiff_nearest

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_tiff_nearest(bytes(b), width, height)
                if b is not None
                else None
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "width": width,
                    "height": height,
                    "blob": pd.Series(out, dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _resize, "id long, width int, height int, blob binary"
    )


def tiff_pixel_stats(df: DataFrame) -> DataFrame:
    """Integer-exact pixel statistics from REAL TIFF decode: the
    shared order-sensitive channel sum + position-weighted checksum
    over the flattened top-down RGB array. NULL stats for
    undecodable blobs."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import decode_tiff_rgb

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                arr = decode_tiff_rgb(bytes(b)) if b is not None else None
                if arr is None:
                    rows.append((int(i), None, None, None, None))
                    continue
                flat = arr.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(i),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        int(flat.sum()),
                        int((flat * (np.arange(flat.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "width": pd.Series([r[1] for r in rows], dtype=object),
                    "height": pd.Series([r[2] for r in rows], dtype=object),
                    "px_sum": pd.Series([r[3] for r in rows], dtype=object),
                    "px_wsum": pd.Series([r[4] for r in rows], dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _stats, "id long, width int, height int, px_sum long, px_wsum long"
    )


def decimate_wav(df: DataFrame, factor: int) -> DataFrame:
    """REAL audio decimation over a WAV PCM16 column: every
    ``factor``-th sample kept, rate divided, re-encoded — the audio
    counterpart of the image resize kernels (output size bounded by
    input/factor). Unclaimed blobs keep their row with a NULL blob.
    Arrow-batched mapInPandas, one pass."""
    from unitdb_spark.functions.media_codec import decimate_wav_pcm16

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                decimate_wav_pcm16(bytes(b), factor)
                if b is not None
                else None
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "blob": pd.Series(out, dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(_dec, "id long, blob binary")


def mulaw_roundtrip_features(df: DataFrame) -> DataFrame:
    """REAL telephony-codec pass: WAV PCM16 samples compressed to
    G.711 mu-law (8 bits/sample) and expanded back, reduced to exact
    integer fidelity statistics — decoded-signal energy, worst and
    total absolute roundtrip error, and the distinct code count (a
    full-range signal should touch most of the 256-code book). The
    codec is pure closed-form integer algebra, so an SQL oracle
    replays compress∘expand exactly. NULL-free rows only for blobs
    the WAV decoder claims.

    Scale: Arrow-batched mapInPandas, vectorized numpy codec; output
    is one row per blob.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import (
            decode_wav_pcm16,
            pcm16_to_ulaw,
            ulaw_to_pcm16,
        )

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                dec = decode_wav_pcm16(bytes(b)) if b is not None else None
                if dec is None or len(dec[1]) == 0:
                    continue
                _, s = dec
                v = s.astype(np.int64)
                codes = pcm16_to_ulaw(v)
                back = ulaw_to_pcm16(codes)
                err = np.abs(back - v)
                rows.append(
                    (
                        int(i), int(v.size),
                        int((back * back).sum()),
                        int(err.max()),
                        int(err.sum()),
                        int(np.unique(codes).size),
                    )
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "n_samples": pd.array([r[1] for r in rows], dtype="int64"),
                    "energy_dec": pd.array([r[2] for r in rows], dtype="int64"),
                    "max_abs_err": pd.array([r[3] for r in rows], dtype="int64"),
                    "sum_abs_err": pd.array([r[4] for r in rows], dtype="int64"),
                    "n_codes": pd.array([r[5] for r in rows], dtype="int64"),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _feat,
        "id long, n_samples long, energy_dec long, max_abs_err long, "
        "sum_abs_err long, n_codes long",
    )


def synthetic_flac_media(documents: DataFrame) -> DataFrame:
    """FLAC fixture: the SAME closed-form PCM16 samples as the WAV
    fixture (sample j int16 LE from bytes (6j)%256 / (6j+3)%256,
    rate [8000,16000,44100][d%3], n = d%4000+100, on docs with
    doc_id%5==3) packed through the REAL fixed-prediction FLAC
    encoder. Losslessness is the proof trick: the WAV fixture's
    sample-statistics oracle matches bitwise iff the whole FLAC
    bitstream path (Rice, fixed predictors, CRCs, framing) inverted
    exactly."""
    from unitdb_spark.functions import media_codec as mc

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 5 != 3:
                    continue
                n = d % 4000 + 100
                rate = [8000, 16000, 44100][d % 3]
                j = np.arange(n, dtype=np.int64)
                raw = (6 * j) % 256 + 256 * ((6 * j + 3) % 256)
                v = np.where(raw >= 32768, raw - 65536, raw)
                ids.append(d)
                blobs.append(mc.encode_flac_fixed(v, rate, blocksize=1024))
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "media_type": "audio",
                    "blob": pd.Series(blobs, dtype=object),
                }
            )

    return _media_ids(documents).mapInPandas(
        _build, "id long, media_type string, blob binary"
    )


def flac_pcm_features(df: DataFrame) -> DataFrame:
    """`pcm_features` for FLAC blobs: REAL bitstream decode (Rice,
    fixed predictors, CRC verification), then the family's exact
    integer signal statistics and pinned round-6 RMS."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np

        from unitdb_spark.functions.media_codec import decode_flac_fixed

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                dec = decode_flac_fixed(bytes(b)) if b is not None else None
                if dec is None or len(dec[1]) == 0:
                    rows.append((int(i),) + (None,) * 6 + (None,))
                    continue
                sr, v = dec
                energy = int((v * v).sum())
                zc = int(((v[:-1] * v[1:]) < 0).sum()) if v.size > 1 else 0
                rms = float(
                    Decimal(
                        repr(math.sqrt(float(energy) / float(v.size)))
                    ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                )
                rows.append(
                    (int(i), int(sr), int(v.size), energy, zc,
                     int(v.min()), int(v.max()), rms)
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "sample_rate": pd.Series([r[1] for r in rows], dtype=object),
                    "n_samples": pd.Series([r[2] for r in rows], dtype=object),
                    "energy": pd.Series([r[3] for r in rows], dtype=object),
                    "zero_crossings": pd.Series([r[4] for r in rows], dtype=object),
                    "v_min": pd.Series([r[5] for r in rows], dtype=object),
                    "v_max": pd.Series([r[6] for r in rows], dtype=object),
                    "rms_r": pd.Series([r[7] for r in rows], dtype=object),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _feat,
        "id long, sample_rate int, n_samples long, energy long, "
        "zero_crossings long, v_min long, v_max long, rms_r double",
    )


def alaw_roundtrip_features(df: DataFrame) -> DataFrame:
    """`mulaw_roundtrip_features` for the A-law half of G.711 — the
    European companding curve (13-bit magnitude, even-bit inversion);
    same exact integer fidelity statistics, same arithmetic-only SQL
    replay."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from unitdb_spark.functions.media_codec import (
            alaw_to_pcm16,
            decode_wav_pcm16,
            pcm16_to_alaw,
        )

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"].values, pdf["blob"]):
                dec = decode_wav_pcm16(bytes(b)) if b is not None else None
                if dec is None or len(dec[1]) == 0:
                    continue
                _, s = dec
                v = s.astype(np.int64)
                codes = pcm16_to_alaw(v)
                back = alaw_to_pcm16(codes)
                err = np.abs(back - v)
                rows.append(
                    (
                        int(i), int(v.size),
                        int((back * back).sum()),
                        int(err.max()),
                        int(err.sum()),
                        int(np.unique(codes).size),
                    )
                )
            yield pd.DataFrame(
                {
                    "id": pd.array([r[0] for r in rows], dtype="int64"),
                    "n_samples": pd.array([r[1] for r in rows], dtype="int64"),
                    "energy_dec": pd.array([r[2] for r in rows], dtype="int64"),
                    "max_abs_err": pd.array([r[3] for r in rows], dtype="int64"),
                    "sum_abs_err": pd.array([r[4] for r in rows], dtype="int64"),
                    "n_codes": pd.array([r[5] for r in rows], dtype="int64"),
                }
            )

    return df.select("id", "blob").mapInPandas(
        _feat,
        "id long, n_samples long, energy_dec long, max_abs_err long, "
        "sum_abs_err long, n_codes long",
    )
