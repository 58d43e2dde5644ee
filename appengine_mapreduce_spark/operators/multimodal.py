"""Multimodal (image/audio/video) column operators.

Design: media lives in opaque ``binary`` columns with a typed metadata
struct alongside (media_type, width/height or sample_rate/duration, codec).
All Spark-side plumbing — schemas, Arrow batch shapes, partition widening,
UDF signatures — is real and tested; the actual codec calls are STUBBED
(``DECODERS_AVAILABLE = False``) because image/audio libraries are not in
this container. Swapping a real decoder in changes exactly one function
per operator, marked ``# STUB``.

Scale notes: decode/feature steps run via ``mapInPandas`` so one Arrow
batch of binary blobs crosses into Python at a time;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory (a
4K-frame batch at default 10k records would OOM — callers set it per
media size). Partition widening uses ensure_parallelism, same policy as
the text operators.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from appengine_mapreduce_spark.core.partitioning import ensure_parallelism
from appengine_mapreduce_spark.core.pickling import register_self

register_self(__name__)


DECODERS_AVAILABLE = False  # flip when librosa/pyav exist in the image —
# now covers ONLY perceptual-audio SAMPLE decode (the MP3 polyphase
# filterbank/IMDCT and AAC spectral decode need the ISO codebook/window
# TABLES — data absent from this container, and inventing values would
# be fake correctness; their FRAME/HEADER walks are real,
# functions/media.decode_mp3_meta / decode_aac_adts_meta) and
# MOTION-COMPENSATED video codecs (H.264/VP9 need a codec library;
# run-length temporal video — MS-RLE delta frames — decodes for real,
# decode_mrle_video_stats below). COMPANDED
# lossy audio decodes for real: G.711 µ-law/A-law are pure bit formulas
# (functions/media.mulaw_expand/alaw_expand, involution-tested over all
# 256 byte values) and flow through audio_pcm_features via the WAV
# format-code dispatch. PREDICTIVE lossy audio decodes for real: IMA
# ADPCM (DVI4 / WAV format 0x11, functions/media.ima_adpcm_decode_nibbles)
# — its step/index tables are cross-validated byte-exact against stdlib
# audioop's independent implementation, the bar the ISO perceptual
# tables cannot meet in this container. FLAC lossless-compressed audio
# decodes for real (functions/flac.py: Rice residuals + fixed/LPC predictors +
# stereo decorrelation + CRCs — fully algorithmic,
# decode_flac_audio_features below). GIF pixels decode for real (LZW +
# palette + interlace, decode_gif_pixel_stats below), TIFF strips
# decode for real (uncompressed + PackBits, decode_tiff_pixel_stats
# below), and BMP decodes for real (24-bit/palette/RLE8,
# decode_bmp_pixel_stats below); raw BI_RGB AVI frames decode through
# the same DIB path (decode_video_frame_pixels dispatch). Video frame
# PIXELS decode for real for the MJPEG/AVI profile: the RIFF container
# walk extracts per-frame JPEGs which the in-repo T.81 codec fully
# decodes (decode_video_frame_pixels below). The ENTIRE
# JPEG matrix decodes for real: baseline + progressive, grayscale +
# color. Progressive decodes use the full T.81 Annex G scan script —
# DC/AC first + successive-approximation refinement, interleaved DC MCU
# order with per-component predictors for color
# (functions/jpeg_pixels.decode_progressive_gray/_color). Baseline JPEG pixels decode for real — grayscale AND color at
# 4:4:4/4:2:2/4:2:0 sampling (decode_jpeg_pixel_stats below;
# functions/jpeg_pixels.py implements the full T.81 baseline entropy
# decode + dequant + IDCT + JFIF color transform), PCM audio SAMPLES
# decode for real (audio_pcm_features — WAV needs no codec), and the
# metadata layer of every media family is REAL, stdlib-only:
# - PNG full decode (functions/png.py): chunk parse + inflate + unfilter.
# - JPEG header decode (functions/jpeg.py): T.81 segment scan —
#   dimensions/precision/components/mode.
# - WAV metadata (functions/media.py): RIFF chunk walk —
#   channels/sample_rate/bits/frames/duration.
# - MP4 metadata (functions/media.py): ISO BMFF box walk to moov/mvhd —
#   timescale/duration/track count/brand.
PNG_DECODER_AVAILABLE = True
JPEG_HEADER_DECODER_AVAILABLE = True
WAV_META_DECODER_AVAILABLE = True
MP4_META_DECODER_AVAILABLE = True

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, sample_rate int, "
    "duration_ms bigint, codec string"
)


def _stub_decode_image(blob: bytes) -> tuple[int, int, bytes]:
    """Decode a blob to (width, height, pixel digest).

    PNG blobs take the REAL path: full parse + inflate + unfilter via
    functions/png.py, digest over the decoded pixels. JPEG blobs take the
    REAL header path here: SOFn segment scan via functions/jpeg.py for
    true dimensions with a digest over the raw blob (this stub keeps the
    cheap path; full JPEG pixel decode lives in decode_jpeg_pixel_stats /
    decode_jpeg_color_pixel_stats). Other formats fall back to a
    deterministic fake (# STUB) until their codecs exist.
    """
    from appengine_mapreduce_spark.functions.jpeg import JPEG_SOI, decode_jpeg_meta
    from appengine_mapreduce_spark.functions.png import PNG_SIGNATURE, decode_png

    if blob[:8] == PNG_SIGNATURE:
        img = decode_png(blob)
        return img.width, img.height, hashlib.md5(img.pixels).digest()
    if blob[:2] == JPEG_SOI:
        meta = decode_jpeg_meta(blob)
        return meta.width, meta.height, hashlib.md5(blob).digest()
    if DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire the real decoder here")
    h = hashlib.md5(blob).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    return width, height, h


def embed_media_table(
    df: DataFrame, content_col: str = "content", media_type: str = "image"
) -> DataFrame:
    """Attach the typed metadata struct to a binary-column table —
    the canonical multimodal layout (blob + metadata, queryable without
    touching bytes)."""
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("bigint").alias("duration_ms"),
        F.lit(None).cast("string").alias("codec"),
    )
    return df.withColumn("media_meta", meta)


def decode_image_features(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """Decode blobs → (width, height, feature vector). Pipeline shape for
    any per-item media transform: widen partitions, Arrow-batch the blobs,
    one Python crossing per batch.

    Feature vector: 8 floats from the pixel digest (# STUB — a real
    implementation would pool CNN activations or color histograms)."""
    out_schema = f"{id_col} bigint, width int, height int, features array<float>"
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widths, heights, feats = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, digest = _stub_decode_image(bytes(blob))
                ids.append(int(i))
                widths.append(w)
                heights.append(h)
                feats.append(
                    [x / 255.0 for x in _struct.unpack("8B", digest[:8])]
                )
            yield pd.DataFrame(
                {id_col: ids, "width": widths, "height": heights, "features": feats}
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_png_images(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL PNG decode over a binary column: chunk parse + CRC verify +
    zlib inflate + scanline unfilter (functions/png.py), Arrow-batched via
    mapInPandas. Output per image: dimensions, format fields, and
    pixel_sum/n_pixels over the decoded bytes (decode-sensitive stats a
    header peek cannot fake)."""
    from appengine_mapreduce_spark.functions.png import decode_png

    out_schema = (
        f"{id_col} bigint, width int, height int, bit_depth int, "
        "color_type int, pixel_sum bigint, n_pixels bigint"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                img = decode_png(bytes(blob))
                rows.append(
                    (
                        int(i),
                        img.width,
                        img.height,
                        img.bit_depth,
                        img.color_type,
                        sum(img.pixels),
                        len(img.pixels) // img.channels,
                    )
                )
            yield (
                pd.DataFrame(
                    rows,
                    columns=[
                        id_col, "width", "height", "bit_depth",
                        "color_type", "pixel_sum", "n_pixels",
                    ],
                )
                if rows
                else pd.DataFrame(
                    {
                        id_col: pd.Series(dtype="int64"),
                        "width": pd.Series(dtype="int32"),
                        "height": pd.Series(dtype="int32"),
                        "bit_depth": pd.Series(dtype="int32"),
                        "color_type": pd.Series(dtype="int32"),
                        "pixel_sum": pd.Series(dtype="int64"),
                        "n_pixels": pd.Series(dtype="int64"),
                    }
                )
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_jpeg_headers(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL JPEG header decode over a binary column: marker-segment scan to
    the SOFn frame header (functions/jpeg.py, stdlib-only), Arrow-batched
    via mapInPandas. Output per image: dimensions, sample precision,
    component count, and baseline/progressive mode — the fields a corpus
    dimension-filter reads without entropy-decoding pixels."""
    from appengine_mapreduce_spark.functions.jpeg import decode_jpeg_meta

    out_schema = (
        f"{id_col} bigint, width int, height int, precision int, "
        "n_components int, progressive boolean"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                m = decode_jpeg_meta(bytes(blob))
                rows.append(
                    (int(i), m.width, m.height, m.precision,
                     m.n_components, m.progressive)
                )
            yield (
                pd.DataFrame(
                    rows,
                    columns=[
                        id_col, "width", "height", "precision",
                        "n_components", "progressive",
                    ],
                )
                if rows
                else pd.DataFrame(
                    {
                        id_col: pd.Series(dtype="int64"),
                        "width": pd.Series(dtype="int32"),
                        "height": pd.Series(dtype="int32"),
                        "precision": pd.Series(dtype="int32"),
                        "n_components": pd.Series(dtype="int32"),
                        "progressive": pd.Series(dtype="bool"),
                    }
                )
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_audio_meta(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL WAV metadata decode over a binary column (functions/media.py
    RIFF chunk walk), Arrow-batched. Output: channels, sample rate, bit
    depth, frame count, duration — the routing fields for an audio corpus
    (resample? mono-ize? drop sub-second clips?) read without touching
    samples."""
    from appengine_mapreduce_spark.functions.media import decode_wav_meta

    out_schema = (
        f"{id_col} bigint, n_channels int, sample_rate int, "
        "bits_per_sample int, n_frames bigint, duration_ms bigint"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                m = decode_wav_meta(bytes(blob))
                rows.append((int(i), m.n_channels, m.sample_rate,
                             m.bits_per_sample, m.n_frames, m.duration_ms))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "n_channels", "sample_rate", "bits_per_sample",
                    "n_frames", "duration_ms"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "n_channels": pd.Series(dtype="int32"),
                    "sample_rate": pd.Series(dtype="int32"),
                    "bits_per_sample": pd.Series(dtype="int32"),
                    "n_frames": pd.Series(dtype="int64"),
                    "duration_ms": pd.Series(dtype="int64"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_video_meta(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL MP4/ISO-BMFF metadata decode over a binary column
    (functions/media.py box walk to moov/mvhd), Arrow-batched. Output:
    brand, timescale, duration, track count — what frame-sampling and
    length-filter passes read before any codec work."""
    from appengine_mapreduce_spark.functions.media import decode_mp4_meta

    out_schema = (
        f"{id_col} bigint, major_brand string, timescale bigint, "
        "duration_ms bigint, n_tracks int"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                m = decode_mp4_meta(bytes(blob))
                rows.append((int(i), m.major_brand, m.timescale,
                             m.duration_ms, m.n_tracks))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "major_brand", "timescale", "duration_ms",
                    "n_tracks"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "major_brand": pd.Series(dtype="object"),
                    "timescale": pd.Series(dtype="int64"),
                    "duration_ms": pd.Series(dtype="int64"),
                    "n_tracks": pd.Series(dtype="int32"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Resize blobs to (target_w, target_h). # STUB: emits a deterministic
    re-encoded blob (digest-prefixed) of the right declared size; a real
    implementation swaps only the inner function."""
    out_schema = f"{id_col} bigint, width int, height int, {content_col} binary"
    df = ensure_parallelism(df.select(id_col, content_col))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                digest = hashlib.md5(bytes(blob)).digest()
                fake = digest + bytes([target_w % 256, target_h % 256])
                rows.append((int(i), target_w, target_h, fake))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", content_col]
            )

    return df.mapInPandas(resize, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "id",
    content_col: str = "content",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame sampling: one output row per sampled timestamp (explode shape).
    Frame extraction is # STUB (digest of (blob, ts)); the row-explosion,
    schema, and batch handling are the real pipeline."""
    out_schema = f"{id_col} bigint, frame_ts_ms bigint, frame binary"
    df = ensure_parallelism(df.select(id_col, content_col, duration_col))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob, dur in zip(
                pdf[id_col], pdf[content_col], pdf[duration_col]
            ):
                for ts in range(0, int(dur), every_ms):
                    frame = hashlib.md5(bytes(blob) + ts.to_bytes(8, "big")).digest()
                    rows.append((int(i), ts, frame))
            yield (
                pd.DataFrame(rows, columns=[id_col, "frame_ts_ms", "frame"])
                if rows
                else pd.DataFrame(
                    {
                        id_col: pd.Series(dtype="int64"),
                        "frame_ts_ms": pd.Series(dtype="int64"),
                        "frame": pd.Series(dtype="object"),
                    }
                )
            )

    return df.mapInPandas(sample, schema=out_schema)


def _pcm_feature_row(samples: list) -> tuple:
    """Integer-exact clip features shared by the WAV and AVI audio paths:
    (n_samples, energy sum-of-squares, peak amplitude, zero crossings)."""
    sum_sq = sum(s * s for s in samples)
    peak = max((abs(s) for s in samples), default=0)
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    )
    return len(samples), sum_sq, peak, zc


def audio_pcm_features(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL audio SAMPLE decode + feature extraction over a binary column:
    PCM frames unpacked stdlib-only (functions/media.decode_wav_samples —
    WAV needs no codec), then integer-exact signal features: total energy
    (sum of squares), peak amplitude, zero-crossing count. These are the
    clip-level stats an audio corpus filter runs (silence/clipping/noise
    screens); integer arithmetic keeps them engine-portable for the
    oracle. Compressed formats (MP3/AAC) remain behind DECODERS_AVAILABLE
    — PCM does not."""
    from appengine_mapreduce_spark.functions.media import decode_wav_samples

    out_schema = (
        f"{id_col} bigint, n_samples bigint, sum_sq bigint, "
        "peak int, zero_crossings bigint"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                _meta, samples = decode_wav_samples(bytes(blob))
                rows.append((int(i), *_pcm_feature_row(samples)))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "n_samples", "sum_sq", "peak", "zero_crossings"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "n_samples": pd.Series(dtype="int64"),
                    "sum_sq": pd.Series(dtype="int64"),
                    "peak": pd.Series(dtype="int32"),
                    "zero_crossings": pd.Series(dtype="int64"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def audio_pcm_features_per_channel(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """audio_pcm_features, one row per (clip, channel): the decoded
    frame stream de-interleaves by meta.n_channels and each channel gets
    its own integer-exact feature row — the shape a stereo/multi-track
    corpus screen needs (a silent or clipped channel hides inside
    whole-clip stats). Same Arrow-batched mapInPandas seam; rows fan out
    n_channels x, still clip-bounded."""
    from appengine_mapreduce_spark.functions.media import decode_wav_samples

    out_schema = (
        f"{id_col} bigint, channel int, n_samples bigint, sum_sq bigint, "
        "peak int, zero_crossings bigint"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "channel", "n_samples", "sum_sq", "peak",
                "zero_crossings"]
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                meta, samples = decode_wav_samples(bytes(blob))
                for ch in range(meta.n_channels):
                    rows.append((
                        int(i), ch,
                        *_pcm_feature_row(samples[ch::meta.n_channels]),
                    ))
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "channel": pd.Series(dtype="int32"),
                    "n_samples": pd.Series(dtype="int64"),
                    "sum_sq": pd.Series(dtype="int64"),
                    "peak": pd.Series(dtype="int32"),
                    "zero_crossings": pd.Series(dtype="int64"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_jpeg_pixel_stats(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL JPEG PIXEL decode over a binary column: full baseline-grayscale
    entropy decode + dequant + IDCT (functions/jpeg_pixels.py, stdlib-only
    per the public T.81 spec), reduced to per-image pixel statistics
    (sum/min/max — integer-exact, the shape an image-corpus filter uses
    for exposure/blank-page screens). Handles baseline and progressive
    grayscale; color streams go through decode_jpeg_color_pixel_stats."""
    from appengine_mapreduce_spark.functions.jpeg_pixels import (
        decode_gray_auto,
    )

    out_schema = (
        f"{id_col} bigint, width int, height int, px_sum bigint, "
        "px_min int, px_max int"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, px = decode_gray_auto(bytes(blob))
                rows.append((int(i), w, h, sum(px), min(px), max(px)))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "width", "height", "px_sum", "px_min", "px_max"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "px_sum": pd.Series(dtype="int64"),
                    "px_min": pd.Series(dtype="int32"),
                    "px_max": pd.Series(dtype="int32"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_mp3_frame_meta(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL MP3 frame-header metadata over a binary column
    (functions/media.decode_mp3_meta): walk every Layer III frame —
    sync + bitrate/samplerate tables, per-header frame length — for frame
    count, exact duration and CBR/VBR-ness, skipping a leading ID3v2 tag.
    The compressed-SAMPLE decode (filterbank/MDCT) stays behind
    DECODERS_AVAILABLE; the frame walk is the routing layer an audio
    corpus filters on."""
    from appengine_mapreduce_spark.functions.media import decode_mp3_meta

    out_schema = (
        f"{id_col} bigint, mpeg_version string, sample_rate int, "
        "n_frames bigint, duration_ms bigint, bitrate_kbps int, "
        "is_cbr boolean, channel_mode string"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                m = decode_mp3_meta(bytes(blob))
                rows.append(
                    (int(i), m.mpeg_version, m.sample_rate, m.n_frames,
                     m.duration_ms, m.bitrate_kbps, m.is_cbr, m.channel_mode)
                )
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "mpeg_version", "sample_rate", "n_frames",
                    "duration_ms", "bitrate_kbps", "is_cbr", "channel_mode"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "mpeg_version": pd.Series(dtype="object"),
                    "sample_rate": pd.Series(dtype="int32"),
                    "n_frames": pd.Series(dtype="int64"),
                    "duration_ms": pd.Series(dtype="int64"),
                    "bitrate_kbps": pd.Series(dtype="int32"),
                    "is_cbr": pd.Series(dtype="bool"),
                    "channel_mode": pd.Series(dtype="object"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def avi_audio_pcm_features(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL audio-track SAMPLE decode from VIDEO containers: extract the
    AVI auds stream's PCM16 samples (functions/media.decode_avi_pcm_audio
    — RIFF strl/strf walk + NNwb chunk concatenation, zero-codec) and
    compute the same integer-exact clip features as the WAV path
    (_pcm_feature_row). A video corpus screens soundtracks
    (silence/clipping) without any DSP library."""
    from appengine_mapreduce_spark.functions.media import decode_avi_pcm_audio

    out_schema = (
        f"{id_col} bigint, sample_rate int, n_samples bigint, "
        "sum_sq bigint, peak int, zero_crossings bigint"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                meta, samples = decode_avi_pcm_audio(bytes(blob))
                rows.append(
                    (int(i), meta.sample_rate, *_pcm_feature_row(samples))
                )
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "sample_rate", "n_samples", "sum_sq",
                    "peak", "zero_crossings"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "sample_rate": pd.Series(dtype="int32"),
                    "n_samples": pd.Series(dtype="int64"),
                    "sum_sq": pd.Series(dtype="int64"),
                    "peak": pd.Series(dtype="int32"),
                    "zero_crossings": pd.Series(dtype="int64"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_tiff_pages(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL TIFF metadata over a binary column
    (functions/media.decode_tiff_meta): IFD-chain walk for page count +
    first-page geometry/compression — the routing metadata for scanned-
    document corpora (multi-page TIFF is the document-scan interchange
    format; per-page pixel decode depends on the embedded compression)."""
    from appengine_mapreduce_spark.functions.media import decode_tiff_meta

    out_schema = (
        f"{id_col} bigint, byte_order string, n_pages bigint, width int, "
        "height int, bits_per_sample int, compression int"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                m = decode_tiff_meta(bytes(blob))
                rows.append(
                    (int(i), m.byte_order, m.n_pages, m.width, m.height,
                     m.bits_per_sample, m.compression)
                )
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "byte_order", "n_pages", "width", "height",
                    "bits_per_sample", "compression"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "byte_order": pd.Series(dtype="object"),
                    "n_pages": pd.Series(dtype="int64"),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "bits_per_sample": pd.Series(dtype="int32"),
                    "compression": pd.Series(dtype="int32"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_web_image_meta(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL WebP + GIF metadata over a binary column, dispatched by magic
    bytes (functions/media.decode_webp_meta / decode_gif_meta): dimensions
    from the public VP8/VP8L/VP8X header layouts, GIF frame counts from
    the block-structure walk. With JPEG/PNG this covers the whole web
    image-format triad's routing metadata, zero dependencies."""
    from appengine_mapreduce_spark.functions.media import (
        decode_gif_meta,
        decode_webp_meta,
    )

    out_schema = (
        f"{id_col} bigint, kind string, width int, height int, "
        "n_frames bigint, has_alpha boolean, has_animation boolean"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(blob)
                if blob[:4] == b"GIF8":
                    g = decode_gif_meta(blob)
                    rows.append(
                        (int(i), "gif", g.width, g.height, g.n_frames,
                         False, g.n_frames > 1)
                    )
                else:
                    m = decode_webp_meta(blob)
                    rows.append(
                        (int(i), "webp-" + m.format, m.width, m.height, 0,
                         m.has_alpha, m.has_animation)
                    )
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "kind", "width", "height", "n_frames",
                    "has_alpha", "has_animation"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "kind": pd.Series(dtype="object"),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "n_frames": pd.Series(dtype="int64"),
                    "has_alpha": pd.Series(dtype="bool"),
                    "has_animation": pd.Series(dtype="bool"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_video_frame_pixels(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL VIDEO FRAME PIXEL decode over a binary column with per-blob
    codec dispatch (functions/media.decode_avi_video_frames): MJPEG
    frames fully decode through the in-repo T.81 codec
    (functions/jpeg_pixels) and raw BI_RGB (DIB) frames decode from the
    bottom-up padded BGR layout — the two capture/intermediate formats
    that need no codec library. Inter-frame codecs (H.264/VP9) remain
    behind DECODERS_AVAILABLE."""
    from appengine_mapreduce_spark.functions.jpeg import decode_jpeg_meta
    from appengine_mapreduce_spark.functions.jpeg_pixels import (
        decode_color_auto,
        decode_gray_auto,
    )
    from appengine_mapreduce_spark.functions.media import (
        decode_avi_video_frames,
    )

    out_schema = (
        f"{id_col} bigint, n_frames bigint, width int, height int, "
        "px_sum bigint, px_min int, px_max int"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                meta, codec, frames = decode_avi_video_frames(bytes(blob))
                total = 0
                mn, mx = 255, 0
                for fr in frames:
                    if codec == "DIB":
                        px = [v for p in fr for v in p]
                    elif decode_jpeg_meta(fr).n_components == 3:
                        _w, _h, rgb = decode_color_auto(fr)
                        px = [v for p in rgb for v in p]
                    else:
                        _w, _h, px = decode_gray_auto(fr)
                    total += sum(px)
                    mn = min(mn, min(px))
                    mx = max(mx, max(px))
                rows.append(
                    (int(i), meta.n_frames, meta.width, meta.height,
                     total, mn if frames else 0, mx if frames else 0)
                )
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "n_frames", "width", "height",
                    "px_sum", "px_min", "px_max"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "n_frames": pd.Series(dtype="int64"),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "px_sum": pd.Series(dtype="int64"),
                    "px_min": pd.Series(dtype="int32"),
                    "px_max": pd.Series(dtype="int32"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_aac_frame_meta(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL AAC/ADTS frame-header metadata over a binary column
    (functions/media.decode_aac_adts_meta): walk the ADTS framing — sync,
    profile, sampling-frequency index, channel config, 13-bit frame
    length — for frame count, exact duration (1024 samples/frame) and
    payload bytes. Like MP3, the header walk is the routing layer; AAC
    SAMPLE decode stays behind DECODERS_AVAILABLE."""
    from appengine_mapreduce_spark.functions.media import decode_aac_adts_meta

    out_schema = (
        f"{id_col} bigint, profile string, sample_rate int, "
        "n_channels int, n_frames bigint, duration_ms bigint, "
        "total_bytes bigint"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                m = decode_aac_adts_meta(bytes(blob))
                rows.append(
                    (int(i), m.profile, m.sample_rate, m.n_channels,
                     m.n_frames, m.duration_ms, m.total_bytes)
                )
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "profile", "sample_rate", "n_channels",
                    "n_frames", "duration_ms", "total_bytes"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "profile": pd.Series(dtype="object"),
                    "sample_rate": pd.Series(dtype="int32"),
                    "n_channels": pd.Series(dtype="int32"),
                    "n_frames": pd.Series(dtype="int64"),
                    "duration_ms": pd.Series(dtype="int64"),
                    "total_bytes": pd.Series(dtype="int64"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_jpeg_color_pixel_stats(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL COLOR JPEG pixel decode over a binary column — baseline OR
    progressive streams (dispatched by SOF marker), full entropy decode +
    dequant + IDCT + chroma upsampling + JFIF color transform
    (functions/jpeg_pixels.decode_color_auto) — reduced to integer-exact
    per-image RGB statistics. With this operator the whole JPEG
    profile matrix (baseline/progressive × gray/color) is decoded for
    real; only lossy audio and video pixels remain behind
    DECODERS_AVAILABLE."""
    from appengine_mapreduce_spark.functions.jpeg_pixels import (
        decode_color_auto,
    )

    out_schema = (
        f"{id_col} bigint, width int, height int, px_sum bigint, "
        "px_min int, px_max int"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, rgb = decode_color_auto(bytes(blob))
                flat = [v for px in rgb for v in px]
                rows.append((int(i), w, h, sum(flat), min(flat), max(flat)))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "width", "height", "px_sum", "px_min", "px_max"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "px_sum": pd.Series(dtype="int64"),
                    "px_min": pd.Series(dtype="int32"),
                    "px_max": pd.Series(dtype="int32"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def mp4_frame_stats(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL frame-level video-container metadata over a binary column:
    walk moov→trak→mdia→minf→stbl and decode the stts/stsz sample tables
    (functions/media.decode_mp4_track_samples, stdlib-only) — frame
    count, per-frame byte sizes, track duration. This is the routing
    information a video corpus filters on (drop sub-second clips, cap
    bitrate, budget decode cost) WITHOUT any codec; frame pixels stay
    behind DECODERS_AVAILABLE."""
    from appengine_mapreduce_spark.functions.media import (
        decode_mp4_track_samples,
    )

    out_schema = (
        f"{id_col} bigint, n_samples bigint, total_bytes bigint, "
        "max_sample_bytes bigint, duration_units bigint"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                ts = decode_mp4_track_samples(bytes(blob))
                rows.append(
                    (int(i), ts.n_samples, ts.total_bytes,
                     ts.max_sample_bytes, ts.duration_units)
                )
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "n_samples", "total_bytes",
                    "max_sample_bytes", "duration_units"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "n_samples": pd.Series(dtype="int64"),
                    "total_bytes": pd.Series(dtype="int64"),
                    "max_sample_bytes": pd.Series(dtype="int64"),
                    "duration_units": pd.Series(dtype="int64"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_gif_pixel_stats(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL GIF PIXEL decode over a binary column: full LZW entropy
    decode (variable-width codes, 12-bit dictionary, deferred clear) +
    palette mapping + 4-pass de-interlace
    (functions/media.decode_gif_frames, implemented from the public
    GIF89a spec — LZW needs no codec tables). Emits per-blob frame count,
    first-frame geometry, and integer-exact RGB channel statistics over
    ALL frames. Frames decode standalone (no disposal compositing —
    documented scope; per-frame stats need none)."""
    from appengine_mapreduce_spark.functions.media import decode_gif_frames

    out_schema = (
        f"{id_col} bigint, n_frames int, width int, height int, "
        "rgb_sum bigint, px_min int, px_max int"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                _meta, frames = decode_gif_frames(bytes(blob))
                rgb_sum = 0
                px_min, px_max = 255, 0
                for fr in frames:
                    for idx in fr.pixels:
                        r, g, b = fr.palette[idx]
                        rgb_sum += r + g + b
                        lo, hi = min(r, g, b), max(r, g, b)
                        px_min = lo if lo < px_min else px_min
                        px_max = hi if hi > px_max else px_max
                f0 = frames[0] if frames else None
                rows.append((
                    int(i), len(frames),
                    f0.width if f0 else 0, f0.height if f0 else 0,
                    rgb_sum, px_min if frames else 0,
                    px_max if frames else 0,
                ))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "n_frames", "width", "height",
                    "rgb_sum", "px_min", "px_max"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "n_frames": pd.Series(dtype="int32"),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "rgb_sum": pd.Series(dtype="int64"),
                    "px_min": pd.Series(dtype="int32"),
                    "px_max": pd.Series(dtype="int32"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_tiff_pixel_stats(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL TIFF PIXEL decode over a binary column: strip-based baseline
    layouts — uncompressed and PackBits RLE, 8 bits/sample, gray or RGB
    (functions/media.decode_tiff_strips, public TIFF 6.0 + Apple
    PackBits). The document-scan ingest shape: per-page geometry +
    integer-exact sample statistics for blank-page/exposure screens."""
    from appengine_mapreduce_spark.functions.media import decode_tiff_strips

    out_schema = (
        f"{id_col} bigint, width int, height int, samples_per_pixel int, "
        "compression int, px_sum bigint, px_min int, px_max int"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                tp = decode_tiff_strips(bytes(blob))
                rows.append((
                    int(i), tp.width, tp.height, tp.samples_per_pixel,
                    tp.compression, sum(tp.pixels),
                    min(tp.pixels), max(tp.pixels),
                ))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "width", "height", "samples_per_pixel",
                    "compression", "px_sum", "px_min", "px_max"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "samples_per_pixel": pd.Series(dtype="int32"),
                    "compression": pd.Series(dtype="int32"),
                    "px_sum": pd.Series(dtype="int64"),
                    "px_min": pd.Series(dtype="int32"),
                    "px_max": pd.Series(dtype="int32"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_bmp_pixel_stats(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL BMP pixel decode over a binary column: BITMAPINFOHEADER
    layouts — 24-bit BGR and 8-bit palette, BI_RGB and BI_RLE8 runs
    (functions/media.decode_bmp_pixels, all algorithmic). Emits geometry
    + integer-exact RGB channel statistics."""
    from appengine_mapreduce_spark.functions.media import decode_bmp_pixels

    out_schema = (
        f"{id_col} bigint, width int, height int, bits_per_pixel int, "
        "compression int, rgb_sum bigint, px_min int, px_max int"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                bp = decode_bmp_pixels(bytes(blob))
                flat = [v for p in bp.pixels for v in p]
                rows.append((
                    int(i), bp.width, bp.height, bp.bits_per_pixel,
                    bp.compression, sum(flat), min(flat), max(flat),
                ))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "width", "height", "bits_per_pixel",
                    "compression", "rgb_sum", "px_min", "px_max"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "bits_per_pixel": pd.Series(dtype="int32"),
                    "compression": pd.Series(dtype="int32"),
                    "rgb_sum": pd.Series(dtype="int64"),
                    "px_min": pd.Series(dtype="int32"),
                    "px_max": pd.Series(dtype="int32"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_flac_audio_features(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL LOSSLESS-COMPRESSED audio decode over a binary column: full
    FLAC frame decode — Rice-coded residuals over fixed/LPC predictors,
    stereo decorrelation, CRC-8/CRC-16 verification
    (functions/flac.py, implemented from the public spec; FLAC is
    algorithmic, no codec tables). Emits stream fields + the integer
    clip features over channel 0 — same shape as the PCM path, so a
    corpus filter treats WAV and FLAC uniformly."""
    from appengine_mapreduce_spark.functions.flac import decode_flac

    out_schema = (
        f"{id_col} bigint, n_channels int, sample_rate int, "
        "n_samples bigint, sum_sq bigint, peak int, zero_crossings bigint"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                info, channels = decode_flac(bytes(blob))
                n, sum_sq, peak, zc = _pcm_feature_row(channels[0])
                rows.append((int(i), info.n_channels, info.sample_rate,
                             n, sum_sq, peak, zc))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "n_channels", "sample_rate", "n_samples",
                    "sum_sq", "peak", "zero_crossings"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "n_channels": pd.Series(dtype="int32"),
                    "sample_rate": pd.Series(dtype="int32"),
                    "n_samples": pd.Series(dtype="int64"),
                    "sum_sq": pd.Series(dtype="int64"),
                    "peak": pd.Series(dtype="int32"),
                    "zero_crossings": pd.Series(dtype="int64"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)


def decode_mrle_video_stats(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL INTER-FRAME video decode over a binary column: MS-RLE
    (BI_RLE8 in AVI) — each frame's RLE stream composites onto the
    previous frame's canvas, end-of-line/delta escapes skipping
    unchanged pixels (temporal prediction). The decode proves the
    compositing chain: per-frame statistics are over the RESOLVED
    frames, not the wire diffs (functions/media.decode_avi_mrle_frames).
    Motion-compensated codecs (H.264/VP9) remain behind
    DECODERS_AVAILABLE; run-length temporal video does not."""
    from appengine_mapreduce_spark.functions.media import (
        decode_avi_mrle_frames,
    )

    out_schema = (
        f"{id_col} bigint, n_frames int, width int, height int, "
        "rgb_sum bigint, px_min int, px_max int"
    )
    df = ensure_parallelism(df.select(id_col, content_col))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                meta, palette, frames = decode_avi_mrle_frames(bytes(blob))
                rgb_sum = 0
                mn, mx = 255, 0
                for fr in frames:
                    for idx in fr:
                        r, g, b = palette[idx]
                        rgb_sum += r + g + b
                        lo, hi = min(r, g, b), max(r, g, b)
                        mn = lo if lo < mn else mn
                        mx = hi if hi > mx else mx
                rows.append((
                    int(i), meta.n_frames, meta.width, meta.height,
                    rgb_sum, mn if frames else 0, mx if frames else 0,
                ))
            yield (
                pd.DataFrame(rows, columns=[
                    id_col, "n_frames", "width", "height",
                    "rgb_sum", "px_min", "px_max"])
                if rows
                else pd.DataFrame({
                    id_col: pd.Series(dtype="int64"),
                    "n_frames": pd.Series(dtype="int32"),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "rgb_sum": pd.Series(dtype="int64"),
                    "px_min": pd.Series(dtype="int32"),
                    "px_max": pd.Series(dtype="int32"),
                })
            )

    return df.mapInPandas(decode, schema=out_schema)
