"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Driver north-star (SURVEY §2.4): the engine treats media as
``binary`` columns with a metadata struct, and runs decode / feature
extraction / resize / frame-sampling as Arrow-batched ``mapInPandas``
stages. The media codec libraries (PIL, ffmpeg, torchaudio, ...) are NOT in
this container, so the decode kernels are stubbed exactly as the brief
requires: real Spark plumbing (schema, partitioning, UDF signature, Arrow
batch shape) with a deterministic fake payload, and a clearly marked
``NotImplementedError`` path when a real decode is requested without the
codec dependency installed.

Scale shape: all stages are map-only over binary batches — no shuffle; the
only knob that matters at 100 TB is input split size
(``spark.sql.files.maxPartitionBytes``) so one Arrow batch of blobs fits
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["binary_with_metadata", "decode_media", "extract_features", "MEDIA_META_SCHEMA"]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

_HAVE_PIL = False
try:  # pragma: no cover - codec libs absent in this container by design
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


def binary_with_metadata(
    df: DataFrame, payload_col: str, media_type: str = "application/octet-stream"
) -> DataFrame:
    """Normalize any column into the engine's media shape: an opaque
    ``content: binary`` plus a ``media_meta`` struct (type, size, sha256).
    All JVM-side expressions."""
    content = F.col(payload_col).cast("binary")
    return df.withColumns(
        {
            "content": content,
            "media_meta": F.struct(
                F.lit(media_type).alias("media_type"),
                F.length(content).cast("long").alias("n_bytes"),
                F.sha2(content, 256).alias("checksum"),
            ),
        }
    )


def decode_media(
    df: DataFrame,
    content_col: str = "content",
    decoder: str = "fake",
    target_size: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Decode binary media to a fixed-size float array (e.g. a thumbnail).

    ``decoder="fake"`` (default here): a deterministic stand-in — bytes are
    hashed into a ``target_size``-length feature block so the full Spark
    pipeline (schema, Arrow batches, partition shape) runs and is testable
    without codec libraries. ``decoder="pil"`` requires PIL and raises
    ``NotImplementedError`` in this container.
    """
    n_out = int(np.prod(target_size))
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("decoded", T.ArrayType(T.FloatType()))]
    )

    if decoder == "pil" and not _HAVE_PIL:
        raise NotImplementedError(
            "decoder='pil' needs the PIL/Pillow codec stack, which is not "
            "installed in this environment; use decoder='fake' for plumbing "
            "tests or install Pillow on the cluster image."
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = []
            for blob in pdf[content_col]:
                if blob is None:
                    decoded.append(None)
                    continue
                raw = np.frombuffer(bytes(blob), dtype=np.uint8)
                if raw.size == 0:
                    decoded.append(np.zeros(n_out, dtype=np.float32))
                    continue
                # deterministic fake decode: tile bytes into the target
                # shape and scale to [0, 1] — stable across runs/executors
                tiled = np.resize(raw.astype(np.float32) / 255.0, n_out)
                decoded.append(tiled)
            out = pdf.copy()
            out["decoded"] = decoded
            yield out

    return df.mapInPandas(decode_batches, schema=out_schema)


def extract_features(
    df: DataFrame, decoded_col: str = "decoded", n_features: int = 4
) -> DataFrame:
    """Summary features over the decoded block (mean/std/min/max) — the
    stand-in for a real embedding model, with the exact Spark shape a model
    UDF would have (Arrow in, fixed-width array out)."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for arr in pdf[decoded_col]:
                if arr is None or len(arr) == 0:
                    feats.append(None)
                    continue
                a = np.asarray(arr, dtype=np.float64)
                feats.append([float(a.mean()), float(a.std()), float(a.min()), float(a.max())][:n_features])
            out = pdf.copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(feat, schema=out_schema)
