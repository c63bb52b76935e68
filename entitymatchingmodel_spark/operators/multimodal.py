"""Multimodal (image/audio/video) column operators.

Beyond-reference operators for large-scale training-data pipelines: media
payloads travel as opaque ``binary`` columns with typed metadata, and every
transform is an Arrow-batched ``mapInPandas`` over those bytes — the shape
that scales: no driver collects, batch size governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``, partition-parallel.

The decode kernels themselves (PIL/ffmpeg/soundfile) are NOT available in
this environment.  Each operator therefore:

- keeps the Spark-side plumbing (schema, UDF signature, batch iteration,
  partitioning) fully real and tested;
- uses the real library when importable, else either raises a clearly
  marked ``NotImplementedError`` (``strict=True``) or falls back to a
  DETERMINISTIC byte-level fake (``strict=False``, default) so pipelines
  remain runnable and exactly reproducible end-to-end.

Metadata extraction (format sniffing, sizes) is pure native SQL — no UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder, if present
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


# ---------------------------------------------------------------------------
# metadata — native expressions only
# ---------------------------------------------------------------------------

_MAGIC = [
    ("ffd8ff", "jpeg"),
    ("89504e47", "png"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("494433", "mp3"),
    ("664c6143", "flac"),
    ("000000", "mp4"),  # ftyp boxes start with size; loose sniff
]


def sniff_format(bin_col: Column) -> Column:
    """Container format from magic bytes — pure ``when`` chain, JVM-side."""
    head = F.lower(F.hex(F.substring(bin_col, 1, 4)))
    expr = F.lit("unknown")
    for magic, fmt in reversed(_MAGIC):
        expr = F.when(head.startswith(magic.lower()), fmt).otherwise(expr)
    return expr


def media_metadata(
    df: DataFrame, id_col: str, bin_col: str
) -> DataFrame:
    """(id, n_bytes, format, content_md5) — metadata scan, no Python boundary."""
    b = F.col(bin_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(b).cast("long").alias("n_bytes"),
        sniff_format(b).alias("format"),
        F.md5(b).alias("content_md5"),
    )


# ---------------------------------------------------------------------------
# mapInPandas plumbing shared by all decode-style operators
# ---------------------------------------------------------------------------

def _map_binary_op(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    out_fields: list[StructField],
    batch_fn: Callable[[pd.Series], list],
) -> DataFrame:
    """Run ``batch_fn`` over the binary column via mapInPandas.

    ``batch_fn(series_of_bytes) -> list of tuples matching out_fields``.
    The output schema is (id, *out_fields); batches stream through Arrow —
    constant memory per task regardless of table size.
    """
    schema = StructType(
        [StructField("id", df.schema[id_col].dataType, True)] + out_fields
    )
    names = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = batch_fn(pdf[bin_col])
            out = pd.DataFrame(vals, columns=names)
            out.insert(0, "id", pdf[id_col].values)
            yield out

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def _not_impl(op: str, lib: str) -> NotImplementedError:
    return NotImplementedError(
        f"STUB: {op} requires {lib}, which is not installed in this "
        f"environment. The Spark plumbing (schema/batching/partitioning) is "
        f"real; install {lib} for real decoding or pass strict=False for the "
        f"deterministic byte-level fallback."
    )


# ---------------------------------------------------------------------------
# image decode / feature extraction
# ---------------------------------------------------------------------------

def image_features(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    strict: bool = False,
) -> DataFrame:
    """(id, feat: array<double>[16]) — per-image feature vector.

    Real path (PIL): 16-bin grayscale histogram, L1-normalized.
    Fallback: 16-bin histogram of the md5 hex digest characters of the
    payload — deterministic, engine-portable (exactly reproducible in SQL),
    and shaped identically to the real output.
    """
    if strict and not _HAVE_PIL:
        raise _not_impl("image_features", "PIL")

    use_pil = _HAVE_PIL and strict

    def batch(series: pd.Series) -> list:
        rows = []
        for payload in series:
            if payload is None:
                rows.append((None,))
                continue
            if use_pil:
                import io

                from PIL import Image as _I

                img = np.asarray(_I.open(io.BytesIO(payload)).convert("L"))
                hist, _ = np.histogram(img, bins=16, range=(0, 256))
            else:
                digest = hashlib.md5(bytes(payload)).hexdigest()
                hist = np.array([digest.count(c) for c in "0123456789abcdef"])
            total = max(int(hist.sum()), 1)
            rows.append(((hist / total).tolist(),))
        return rows

    return _map_binary_op(
        df, id_col, bin_col,
        [StructField("feat", ArrayType(DoubleType()), True)],
        batch,
    )


def resize_images(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    width: int,
    height: int,
    strict: bool = False,
) -> DataFrame:
    """(id, resized: binary, width, height) — thumbnail generation.

    Real path (PIL): decode, resize, re-encode PNG.  Fallback: the payload
    deterministically tiled/truncated to exactly width*height bytes — wrong
    pixels, right plumbing (schema, sizes, batching).
    """
    if strict and not _HAVE_PIL:
        raise _not_impl("resize_images", "PIL")

    use_pil = _HAVE_PIL and strict
    n = width * height

    def batch(series: pd.Series) -> list:
        rows = []
        for payload in series:
            if payload is None:
                rows.append((None, width, height))
                continue
            if use_pil:
                import io

                from PIL import Image as _I

                img = _I.open(io.BytesIO(payload)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out = buf.getvalue()
            else:
                out = bytes(np.resize(np.frombuffer(bytes(payload), dtype=np.uint8), n))
            rows.append((bytearray(out), width, height))
        return rows

    return _map_binary_op(
        df, id_col, bin_col,
        [
            StructField("resized", BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ],
        batch,
    )


# ---------------------------------------------------------------------------
# video frame sampling
# ---------------------------------------------------------------------------

def sample_frames(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    frame_bytes: int = 1024,
    every_n: int = 10,
    max_frames: int = 8,
    strict: bool = False,
) -> DataFrame:
    """(id, frame_idx, frame: binary) — one output row per sampled frame.

    Real path would use an ffmpeg/pyav demuxer (not installed).  Fallback
    treats the payload as fixed-size chunks and emits every ``every_n``-th
    chunk — the exploded one-row-per-frame shape downstream training
    pipelines consume.
    """
    if strict:
        raise _not_impl("sample_frames", "pyav/ffmpeg")

    schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType, True),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    continue
                raw = bytes(payload)
                n_chunks = max(1, len(raw) // frame_bytes)
                taken = 0
                for ci in range(0, n_chunks, every_n):
                    if taken >= max_frames:
                        break
                    ids.append(rid)
                    idxs.append(ci)
                    frames.append(bytearray(raw[ci * frame_bytes:(ci + 1) * frame_bytes]))
                    taken += 1
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# audio feature stub
# ---------------------------------------------------------------------------

def audio_stats(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    strict: bool = False,
) -> DataFrame:
    """(id, n_samples, mean_amp, max_amp) — amplitude stats.

    Real path would decode via soundfile (not installed).  Fallback
    interprets the payload as int8 PCM — deterministic and shape-correct.
    """
    if strict:
        raise _not_impl("audio_stats", "soundfile")

    def batch(series: pd.Series) -> list:
        rows = []
        for payload in series:
            if payload is None:
                rows.append((None, None, None))
                continue
            pcm = np.frombuffer(bytes(payload), dtype=np.int8).astype(np.float64)
            if pcm.size == 0:
                rows.append((0, None, None))
                continue
            rows.append((int(pcm.size), float(np.mean(np.abs(pcm))), float(np.max(np.abs(pcm)))))
        return rows

    return _map_binary_op(
        df, id_col, bin_col,
        [
            StructField("n_samples", LongType(), True),
            StructField("mean_amp", DoubleType(), True),
            StructField("max_amp", DoubleType(), True),
        ],
        batch,
    )
