"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` kernels. The actual media decoding is STUBBED (no
image/audio libraries in this container — see ``decode_image``), but the
Spark-side plumbing — schema, batching, partition-size discipline — is
real and tested: swapping the stub for PIL/ffmpeg changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8. STUB — no codec libs in
    this container; a real deployment plugs PIL/turbojpeg in here."""
    raise NotImplementedError(
        "image decoding requires PIL/libjpeg, not available in this "
        "container; use fake_features for deterministic pipeline tests"
    )


def fake_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature vector: sha256-seeded floats.

    Keeps the full pipeline (batching, schema, joins downstream)
    exercisable without media codecs."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def with_media_meta(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Attach a typed metadata struct derived from the payload header."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit("text/html").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.length(F.col(payload_col)).alias("n_bytes"),
        ),
    )


def extract_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    dim: int = 16,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Batch shape discipline: payloads stay in Arrow buffers until the
    kernel touches them; output is (id, features array<float>). At scale,
    oversized payloads should be size-capped upstream (engine chunker).
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                fake_features(p, dim).tolist() if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_ddl}, features array<float>"
    )


def sample_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing: emits (id, frame_idx, frame binary).

    Real video decode is stubbed — frames are deterministic slices of the
    payload so downstream schema/partitioning logic is testable."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for pid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                n_frames = max(len(p) // 64, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(pid)
                    idxs.append(fi)
                    frames.append(bytes(p[fi * 64 : (fi + 1) * 64]))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, frame_idx int, frame binary"
    )


def resize_image(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """Resize plumbing: (id, resized binary, width, height).

    Real pixel resampling is stubbed like ``decode_image`` (no codec libs
    here): the kernel emits a deterministic byte-downsample of the
    payload with the target geometry attached, so batch shapes, schema,
    and downstream joins are real."""

    target = width * height

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf[payload_col]:
                if p is None:
                    out.append(None)
                    continue
                if len(p) <= target:
                    out.append(bytes(p))
                else:
                    step = len(p) / target
                    pos = (np.arange(target) * step).astype(np.int64)
                    out.append(np.frombuffer(p, dtype=np.uint8)[pos].tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, resized binary, width int, height int"
    )
