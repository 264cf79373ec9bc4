"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery — schema, Arrow batch shape, partition-friendly
mapInPandas UDF signatures — is real and tested; the actual media decode is
STUBBED (this container has no image/audio libraries): ``decode_media``
raises NotImplementedError unless ``fake=True``, in which case it produces a
deterministic byte-statistics feature vector so downstream plumbing
(similarity, dedup over features) can be exercised end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Magic prefixes for cheap sniffing (metadata extraction is real, not stubbed).
_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/avi
    b"fLaC": "flac",
    b"\x1aE\xdf\xa3": "matroska",
}


def media_metadata(df: DataFrame, bin_col: str = "data", key_cols: list[str] | None = None) -> DataFrame:
    """Typed metadata for opaque binary: size + 8-byte magic (hex).

    Pure JVM expressions; at 100 TB this is a column-pruned scan of just the
    binary column's statistics-friendly prefix.
    """
    key_cols = key_cols or [df.columns[0]]
    b = F.col(bin_col)
    return df.select(
        *key_cols,
        F.octet_length(b).alias("n_bytes"),
        F.lower(F.hex(F.substring(b, 1, 8))).alias("magic_hex"),
    )


def sniff_format(blob: bytes | None) -> str:
    if not blob:
        return "empty"
    for magic, name in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return name
    return "unknown"


def decode_media(blob: bytes, fake: bool = False) -> np.ndarray:
    """STUB: decode image/audio bytes → feature vector.

    Real implementation would use PIL/librosa/ffmpeg (absent here). With
    fake=True returns a deterministic 16-dim byte-histogram feature so the
    distributed plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in this environment"
        )
    arr = np.frombuffer(blob or b"", dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(16, dtype=np.float32)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return hist / hist.sum()


def extract_features(
    df: DataFrame,
    bin_col: str = "data",
    key_cols: list[str] | None = None,
    fake: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary blobs.

    Batch shape note for real media at scale: cap
    spark.sql.execution.arrow.maxRecordsPerBatch so (rows × blob size) fits
    worker memory, and repartition by size tiers so one 4 GB video doesn't
    ride in a batch sized for thumbnails.
    """
    key_cols = key_cols or [df.columns[0]]
    cols = list(key_cols) + [bin_col]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[key_cols].copy()
            out["format"] = [sniff_format(b) for b in pdf[bin_col]]
            out["feature"] = [decode_media(b, fake=fake).tolist() for b in pdf[bin_col]]
            yield out

    key_schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in key_cols)
    return df.select(*cols).mapInPandas(
        feats, schema=f"{key_schema}, format string, feature array<float>"
    )


def resize_image(blob: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """STUB: decode → resize → re-encode an image (PIL absent here).

    With fake=True returns a deterministic byte-decimated surrogate of
    exactly width*height bytes, so partitioning/batching around real
    resizes is testable."""
    if not fake:
        raise NotImplementedError("image resize requires PIL, absent in this environment")
    arr = np.frombuffer(blob or b"\x00", dtype=np.uint8)
    n = width * height
    idx = (np.arange(n, dtype=np.int64) * max(len(arr), 1)) // n
    return arr[np.minimum(idx, len(arr) - 1)].tobytes()


def resize_images(
    df: DataFrame,
    bin_col: str = "data",
    key_cols: list[str] | None = None,
    width: int = 32,
    height: int = 32,
    fake: bool = True,
) -> DataFrame:
    """mapInPandas image-resize plumbing: one row in → one (smaller) row
    out, constant output size so downstream batch memory is predictable."""
    key_cols = key_cols or [df.columns[0]]

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[key_cols].copy()
            out["resized"] = [resize_image(b, width, height, fake=fake) for b in pdf[bin_col]]
            yield out

    key_schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in key_cols)
    return df.select(*key_cols, bin_col).mapInPandas(
        go, schema=f"{key_schema}, resized binary"
    )


def sample_frames(
    df: DataFrame,
    bin_col: str = "data",
    key_cols: list[str] | None = None,
    n_frames: int = 4,
    frame_bytes: int = 256,
    fake: bool = True,
) -> DataFrame:
    """Video frame-sampling plumbing: one row in → n_frames rows out
    (1:N explode inside mapInPandas — the shape real ffmpeg sampling has).

    STUB decode: with fake=True each "frame" is a deterministic contiguous
    byte slice at evenly spaced offsets. At scale, repartition by size tier
    first so one long video doesn't ride in a batch sized for clips."""
    if not fake:
        raise NotImplementedError("frame sampling requires ffmpeg, absent in this environment")
    key_cols = key_cols or [df.columns[0]]

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Vectorized offset arithmetic over the whole batch (no
            # per-row Python): flatten all blobs once, compute every
            # (row, frame) slice start from lengths, then cut strided
            # windows out of the flat buffer.
            blobs = [(b if b else b"\x00") for b in pdf[bin_col]]
            lens = np.fromiter((len(b) for b in blobs), np.int64, len(blobs))
            starts = np.zeros(len(blobs) + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            j = np.tile(np.arange(n_frames, dtype=np.int64), len(blobs))
            span = np.repeat(np.maximum(lens - frame_bytes, 0), n_frames)
            offs = np.repeat(starts[:-1], n_frames) + (j * span) // max(n_frames - 1, 1)
            take = np.minimum(np.repeat(lens, n_frames) + np.repeat(starts[:-1], n_frames) - offs, frame_bytes)
            out = pdf[key_cols].iloc[np.repeat(np.arange(len(blobs)), n_frames)].reset_index(drop=True)
            out["frame_idx"] = j
            out["frame"] = [flat[o : o + t].tobytes() for o, t in zip(offs, take)]
            yield out

    key_schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in key_cols)
    return df.select(*key_cols, bin_col).mapInPandas(
        go, schema=f"{key_schema}, frame_idx int, frame binary"
    )


def feature_scalars(
    df: DataFrame,
    bin_col: str = "data",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Canonicalizable (all-scalar) variant of the fake feature extractor.

    Emits format, n_bytes and the 16 high-nibble byte-histogram COUNTS as
    integer columns h0..h15 (exactly the un-normalized ``decode_media`` fake
    feature) — hashable row sets with an exact DuckDB oracle, unlike the
    array<float> output of :func:`extract_features`.
    """
    key_cols = key_cols or [df.columns[0]]
    cols = list(key_cols) + [bin_col]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[key_cols].copy()
            blobs = [b or b"" for b in pdf[bin_col]]
            lens = np.fromiter((len(b) for b in blobs), np.int64, len(blobs))
            # One flattened segment-bincount for the whole batch: key each
            # byte by row*16 + high nibble — no per-row np.bincount calls.
            flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            row_ix = np.repeat(np.arange(len(blobs), dtype=np.int64), lens)
            hists = np.bincount(
                row_ix * 16 + (flat >> 4), minlength=len(blobs) * 16
            ).reshape(len(blobs), 16)
            out["format"] = [sniff_format(b) for b in blobs]
            out["n_bytes"] = lens
            for j in range(16):
                out[f"h{j}"] = hists[:, j]
            yield out

    key_schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in key_cols)
    h_schema = ", ".join(f"h{j} long" for j in range(16))
    return df.select(*cols).mapInPandas(
        feats, schema=f"{key_schema}, format string, n_bytes long, {h_schema}"
    )
