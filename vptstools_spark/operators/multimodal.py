"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with metadata
structs; decode / feature-extraction run as Arrow-batched pandas functions
over ``mapInPandas``. The decode itself is STUBBED (no image/audio libs in
this container — a deterministic fake stands in), but the Spark-side
contract — schema, batch shape, partition behavior — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata schema attached to every blob
BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("magic", T.StringType(), True),
    ]
)


def with_blob_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Attach typed metadata to a binary column — pure expressions, narrow."""
    blob = F.col(blob_col)
    magic = F.hex(F.substring(blob, 1, 4))
    modality = (
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("52494646"), "audio/wav")
        .otherwise("application/octet-stream")
    )
    return df.withColumn(
        "blob_meta",
        F.struct(
            F.octet_length(blob).cast("long").alias("n_bytes"),
            modality.alias("modality"),
            magic.alias("magic"),
        ),
    )


#: output schema of the (stubbed) feature extractor
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "id", blob_col: str = "blob", dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pipeline shape: ``mapInPandas`` so each task decodes a batch of blobs
    with a vectorized library. Here the decoder is a deterministic fake
    (byte-histogram moments); swap `_fake_decode` for a real decoder
    (PIL/librosa/ffmpeg) in production.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(b, dim) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[blob_col]],
                    "feature": feats,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def _fake_decode(blob: bytes | None, dim: int) -> list[float] | None:
    """Deterministic stand-in for image/audio decode: bucketed byte means.

    A real decoder raises NotImplementedError paths here; the fake keeps the
    pipeline end-to-end testable without media libraries.
    """
    if blob is None:
        return None
    if len(blob) == 0:
        return [0.0] * dim
    step = max(len(blob) // dim, 1)
    out = []
    for d in range(dim):
        chunk = blob[d * step : (d + 1) * step] or blob[-step:]
        out.append(sum(chunk) / len(chunk))
    return out


#: output schema of frame sampling: one row per sampled frame
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "id", blob_col: str = "blob"
) -> DataFrame:
    """Evenly-spaced frame sampling over video-style payloads: 1 blob row →
    `n_frames` frame rows (the explode shape of real frame extraction).

    Arrow-batched ``mapInPandas`` so a real implementation can hand the whole
    batch to a vectorized demuxer (pyav/ffmpeg); the stub slices the blob
    into byte windows at evenly-spaced offsets — deterministic, so the
    downstream contract (schema, row multiplicity, ordering) is testable.
    Frames inherit the input's partitioning; no shuffle is introduced.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                span = max(len(blob) // n_frames, 1)
                for f in range(n_frames):
                    off = min(f * span, max(len(blob) - span, 0))
                    ids.append(int(i))
                    idxs.append(f)
                    frames.append(bytes(blob[off : off + span]))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(run, schema=FRAME_SCHEMA)


#: output schema of the real PCM analyzer
PCM_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_id", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def pcm_frame_energy(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "blob",
    frame_samples: int = 256,
) -> DataFrame:
    """REAL audio feature extraction — no media libraries needed: the blob
    is interpreted as raw little-endian int16 PCM (numpy ``frombuffer``),
    framed into `frame_samples` windows, and reduced to per-frame RMS and
    peak. This is the one multimodal path that runs genuine signal math in
    this container; codec decode (mp3/jpeg/mp4) stays behind the
    `_fake_decode` stub.

    Arrow-batched ``mapInPandas``: each executor batch decodes its blobs
    with vectorized numpy — per-row Python never touches samples. The 1→N
    frame explode happens inside the batch, so output partitioning follows
    input splits (narrow, no shuffle).
    """
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("id", "frame_id", "n_samples", "rms", "peak")}
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None or len(blob) < 2:
                    continue
                # truncate a trailing odd byte (torn sample)
                samples = np.frombuffer(blob[: len(blob) - (len(blob) % 2)], dtype="<i2")
                for f in range(0, len(samples), frame_samples):
                    frame = samples[f : f + frame_samples].astype(np.float64)
                    out["id"].append(rid)
                    out["frame_id"].append(f // frame_samples)
                    out["n_samples"].append(len(frame))
                    out["rms"].append(float(np.sqrt(np.mean(frame * frame))))
                    out["peak"].append(int(np.max(np.abs(frame))))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(gen, PCM_FRAME_SCHEMA)
