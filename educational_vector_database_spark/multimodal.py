"""Multimodal columns: image / audio / video as opaque binary + typed metadata.

The reference engine is text-only (reference src/vectordb/embeddings.py:7-45
embeds strings); a 100 TB training-data pipeline also carries media. Model:

- one ``media`` table, media payload is an opaque ``BINARY`` column plus a
  TYPED metadata struct (``MEDIA_META``) — never a schemaless blob, so column
  pruning lets a metadata-only query skip the payload bytes entirely
  (parquet reads the tiny meta column, not the terabytes of media).
- decode / resize / feature-extract / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python hop per partition, NumPy math per batch,
  never per-row Python.

Codec policy (this container has no PIL / librosa / ffmpeg):

- ``raw``  — REAL decode path: the payload is a raw uint8 pixel buffer
  (images/video: H×W×C row-major; audio: int16 PCM) fully described by the
  metadata struct. Everything below — decode, nearest-neighbor resize,
  per-channel stats, PCM windowing, frame sampling — is real, deterministic
  math over that buffer.
- ``jpeg/png/mp3/h264/...`` — compressed codecs raise ``NotImplementedError``
  at the decode seam (`_decode_image_array`), which is exactly where
  ``PIL.Image.open`` / ``soundfile.read`` / ``av.open`` would plug in; the
  Spark-side plumbing (schema, batching, partitioning) is identical.

Scale notes: media rows are big (MBs) — keep ``spark.sql.files.maxPartitionBytes``
at the default 128 MB so a partition holds a bounded number of rows, and
repartition by ``media_id`` before wide stages so one straggler video cannot
skew a whole partition. Feature extraction emits small fixed-width vectors;
downstream kNN/dedup (operators/) then run on those exactly as for text
embeddings — same engine, same operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Typed metadata carried next to every payload. One struct for all kinds;
#: fields irrelevant to a kind are null (cheap in parquet, keeps one table).
MEDIA_META_DDL = (
    "struct<width:int, height:int, n_channels:int, "
    "sample_rate:int, n_samples:int, n_frames:int, codec:string>"
)

MEDIA_SCHEMA_DDL = (
    "media_id bigint, kind string, content binary, meta " + MEDIA_META_DDL
)

_RAW = "raw"


# ---------------------------------------------------------------------------
# deterministic synthetic corpus (no media libs in the container; payloads are
# seeded uint8 buffers so every test and bench run sees identical bytes)
# ---------------------------------------------------------------------------

def synth_media(
    spark: SparkSession,
    n_images: int = 64,
    n_audio: int = 16,
    n_videos: int = 8,
    width: int = 32,
    height: int = 24,
    channels: int = 3,
    sample_rate: int = 16000,
    n_samples: int = 16000,
    n_frames: int = 12,
) -> DataFrame:
    """Deterministic raw-codec media table (seeded per media_id).

    Distributed generation: ``spark.range`` partitions the id space, the
    payload is minted executor-side inside one mapInPandas — the driver never
    holds the corpus, so the same code generates a 100 TB fixture."""
    ids = spark.range(n_images + n_audio + n_videos).withColumnRenamed("id", "media_id")

    img_bytes = width * height * channels

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                rng = np.random.RandomState(int(mid) % (2**31))
                if mid < n_images:
                    kind, codec = "image", _RAW
                    content = rng.randint(0, 256, img_bytes, dtype=np.uint8).tobytes()
                    meta = (width, height, channels, None, None, None, codec)
                elif mid < n_images + n_audio:
                    kind, codec = "audio", _RAW
                    pcm = (rng.randn(n_samples) * 3000).astype(np.int16)
                    content = pcm.tobytes()
                    meta = (None, None, 1, sample_rate, n_samples, None, codec)
                else:
                    kind, codec = "video", _RAW
                    content = rng.randint(
                        0, 256, img_bytes * n_frames, dtype=np.uint8
                    ).tobytes()
                    meta = (width, height, channels, None, None, n_frames, codec)
                rows.append((int(mid), kind, content, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    return ids.mapInPandas(gen, MEDIA_SCHEMA_DDL)


# ---------------------------------------------------------------------------
# decode seam — the ONLY place a real codec library would appear
# ---------------------------------------------------------------------------

def _decode_image_array(content: bytes, meta) -> np.ndarray:
    """bytes -> (H, W, C) uint8. Real for the raw codec; compressed codecs
    route through PIL WHEN PRESENT (the optional-dep seam, same
    importorskip contract as embeddings.HFEmbeddings — verified by a
    skipped-by-default parity test, tests/test_multimodal.py) and raise
    the documented NotImplementedError otherwise."""
    codec = meta["codec"]
    if codec == _RAW:
        h, w, c = int(meta["height"]), int(meta["width"]), int(meta["n_channels"])
        return np.frombuffer(content, dtype=np.uint8, count=h * w * c).reshape(h, w, c)
    if codec in ("png", "jpeg"):
        try:
            import io

            from PIL import Image
        except ImportError:
            pass
        else:
            img = Image.open(io.BytesIO(content))
            # Convert conditionally so the decoded shape agrees with the
            # metadata struct: grayscale ("L"/"1") stays 1-channel instead
            # of being silently promoted to RGB.
            img = img.convert("L" if img.mode in ("L", "1", "I", "I;16") else "RGB")
            arr = np.asarray(img)
            if arr.ndim == 2:  # grayscale -> explicit 1-channel axis
                arr = arr[:, :, None]
            return arr
    raise NotImplementedError(
        f"codec {codec!r}: compressed image decode needs PIL/libjpeg "
        "(not in this container); raw-codec plumbing is the tested path"
    )


def _decode_audio_array(content: bytes, meta) -> np.ndarray:
    """bytes -> (n_samples,) int16 PCM. Stub seam for compressed audio."""
    codec = meta["codec"]
    if codec == _RAW:
        return np.frombuffer(content, dtype=np.int16, count=int(meta["n_samples"]))
    raise NotImplementedError(
        f"codec {codec!r}: compressed audio decode needs soundfile/librosa "
        "(not in this container); raw-codec plumbing is the tested path"
    )


# ---------------------------------------------------------------------------
# image operators
# ---------------------------------------------------------------------------

def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, emitted as a new raw payload + updated meta.

    mapInPandas: one Arrow batch in, NumPy integer indexing per image —
    O(out_pixels) per row, no Python-per-pixel loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                img = _decode_image_array(r["content"], r["meta"])
                h, w, c = img.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                small = img[yi][:, xi]
                out.append(
                    (
                        int(r["media_id"]),
                        r["kind"],
                        small.tobytes(),
                        (out_w, out_h, c, None, None, None, _RAW),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "kind", "content", "meta"])

    return df.filter(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA_DDL)


def image_features(df: DataFrame, n_bins: int = 8) -> DataFrame:
    """Per-image feature vector: per-channel mean + std + an ``n_bins``
    luminance histogram (normalized). Output ``array<double>`` of
    ``2*C + n_bins`` — a drop-in embedding column for operators/knn.py and
    operators/dedup.py (similarity search over media = same engine path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for _, r in pdf.iterrows():
                img = _decode_image_array(r["content"], r["meta"]).astype(np.float64)
                lum = img.mean(axis=2)
                hist, _edges = np.histogram(lum, bins=n_bins, range=(0.0, 256.0))
                vec = np.concatenate(
                    [
                        img.mean(axis=(0, 1)),
                        img.std(axis=(0, 1)),
                        hist / max(1, lum.size),
                    ]
                )
                ids.append(int(r["media_id"]))
                feats.append([float(x) for x in vec])
            yield pd.DataFrame({"media_id": ids, "embedding": feats})

    return df.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id bigint, embedding array<double>"
    )


# ---------------------------------------------------------------------------
# video operators
# ---------------------------------------------------------------------------

def sample_frames(df: DataFrame, every_k: int = 4) -> DataFrame:
    """Video -> frame rows (UDTF shape: 1 row in, ceil(n_frames/k) out).

    Each sampled frame becomes an image-kind row with its own raw payload, so
    the whole image operator family composes downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                if meta["codec"] != _RAW:
                    raise NotImplementedError(
                        f"codec {meta['codec']!r}: video demux needs ffmpeg/av"
                    )
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["n_channels"])
                frame_bytes = h * w * c
                n = int(meta["n_frames"])
                buf = r["content"]
                for fi in range(0, n, every_k):
                    out.append(
                        (
                            int(r["media_id"]),
                            fi,
                            "image",
                            bytes(buf[fi * frame_bytes : (fi + 1) * frame_bytes]),
                            (w, h, c, None, None, None, _RAW),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_index", "kind", "content", "meta"]
            )

    return df.filter(F.col("kind") == "video").mapInPandas(
        run, "media_id bigint, frame_index int, kind string, content binary, meta "
        + MEDIA_META_DDL,
    )


# ---------------------------------------------------------------------------
# audio operators
# ---------------------------------------------------------------------------

def audio_features(df: DataFrame, frame_ms: int = 25) -> DataFrame:
    """Per-clip features over fixed PCM windows: RMS energy (mean/std across
    windows), zero-crossing rate, peak amplitude -> ``array<double>`` of 4."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for _, r in pdf.iterrows():
                pcm = _decode_audio_array(r["content"], r["meta"]).astype(np.float64)
                sr = int(r["meta"]["sample_rate"])
                win = max(1, sr * frame_ms // 1000)
                n_win = max(1, len(pcm) // win)
                frames = pcm[: n_win * win].reshape(n_win, win)
                rms = np.sqrt((frames**2).mean(axis=1))
                zc = float((np.diff(np.signbit(pcm)) != 0).mean()) if len(pcm) > 1 else 0.0
                ids.append(int(r["media_id"]))
                feats.append(
                    [
                        float(rms.mean()),
                        float(rms.std()),
                        zc,
                        float(np.abs(pcm).max() if len(pcm) else 0.0),
                    ]
                )
            yield pd.DataFrame({"media_id": ids, "embedding": feats})

    return df.filter(F.col("kind") == "audio").mapInPandas(
        run, "media_id bigint, embedding array<double>"
    )


# ---------------------------------------------------------------------------
# metadata-only analytics (never touches the payload column — parquet column
# pruning makes this scan meta bytes only, the point of typed metadata)
# ---------------------------------------------------------------------------

def scene_changes(df: DataFrame, threshold_milli: int = 85330) -> DataFrame:
    """Video shot-boundary detection on the raw frame stream: per
    consecutive frame pair, the SUM of absolute pixel differences (exact
    integer — no float ratio crosses the wire), flagged as a cut when the
    per-pixel mean exceeds ``threshold_milli`` (milli-units/pixel), i.e.
    ``sum*1000 > threshold*n_pixels`` in pure int64 arithmetic. One
    Arrow-batched pass, frames diffed as a single vectorized (n-1, HWC)
    subtraction; a real pipeline swaps the raw decode for the codec seam
    exactly like every other operator here. Output is UDTF-shaped: one
    video row in, n_frames-1 transition rows out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                if meta["codec"] != _RAW:
                    raise NotImplementedError(
                        f"codec {meta['codec']!r}: video demux needs ffmpeg/av"
                    )
                h, w, c = (
                    int(meta["height"]), int(meta["width"]), int(meta["n_channels"])
                )
                fb = h * w * c
                n = int(meta["n_frames"])
                arr = (
                    np.frombuffer(r["content"], dtype=np.uint8)
                    .reshape(n, fb)
                    .astype(np.int32)
                )
                diffs = np.abs(arr[1:] - arr[:-1]).sum(axis=1)
                for i, sd in enumerate(diffs):
                    out.append(
                        (
                            int(r["media_id"]),
                            i + 1,
                            int(sd),
                            fb,
                            int(int(sd) * 1000 > threshold_milli * fb),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_index", "sum_abs_diff", "n_pixels", "is_cut"
                ],
            )

    return df.filter(F.col("kind") == "video").mapInPandas(
        run,
        "media_id bigint, frame_index int, sum_abs_diff bigint,"
        " n_pixels int, is_cut int",
    )


def media_stats(df: DataFrame) -> DataFrame:
    return df.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.avg(F.coalesce(F.col("meta.width"), F.lit(0))).alias("avg_width"),
        F.avg(F.coalesce(F.col("meta.n_frames"), F.lit(0))).alias("avg_frames"),
    )
