"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
typed metadata struct — the exact pattern the reference uses for feature
payloads (`_hi` is an opaque byte[] column read columnar,
ref: BinaryDocValuesField.java:45-72, LireRequestHandler.java:471-477).

The Spark-side plumbing (schema, partition-sized Arrow batches, UDF
signatures) is real and tested; the actual media DECODE is stubbed behind
import guards because no image/audio libraries exist in this container —
`decode_image` raises NotImplementedError unless PIL is importable, and the
tested path uses a deterministic fake extractor (byte histogram) with the
same batch shape a real decoder would have.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = "struct<kind:string,width:int,height:int,sample_rate:int,n_frames:int>"


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata —
    the ingestion shape for media rows (payload bytes are whatever the
    upstream store holds; here utf-8 of the text for determinism)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("blob").alias("kind"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real decode — STUB: requires an image library not present here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow; not available in this "
            "environment — use fake_feature_extract for the tested path"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def fake_feature_extract(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for decode+feature-extract: a 16-bin byte
    histogram per payload, vectorized over Arrow batches via mapInPandas —
    the same signature/batch shape a real image featurizer would have.

    Returns (media_id, n_bytes, hist array<bigint> raw counts,
    feat array<double> normalized, feat_norm double). The raw integer
    counts ride alongside the normalized feature so downstream consumers
    (and cross-engine oracles) can compare exactly, float-format-free."""

    def extract(batches):
        for pdf in batches:
            counts, feats, norms, sizes = [], [], [], []
            for buf in pdf["payload"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16)
                total = hist.sum()
                norm_hist = hist / total if total > 0 else hist.astype(np.float64)
                counts.append(hist.astype(np.int64).tolist())
                feats.append(norm_hist.tolist())
                norms.append(float(np.sqrt((norm_hist * norm_hist).sum())))
                sizes.append(int(arr.size))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "hist": counts,
                "feat": feats,
                "feat_norm": pd.Series(norms, dtype="float64"),
            })

    return df.mapInPandas(
        extract,
        schema=("media_id long, n_bytes long, hist array<bigint>, "
                "feat array<double>, feat_norm double"),
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing — STUB for the decode, real for the
    plan shape: one output row per sampled frame index, metadata threaded
    through. With no video decoder present, frame count falls back to
    payload-length-derived synthetic frames."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.length("payload") / every_n).cast("int") - 1, F.lit(0)),
        F.lit(every_n),
    )
    return df.select(
        "media_id", F.explode(frames).alias("frame_idx"),
        F.length("payload").cast("long").alias("n_bytes"),
    ).withColumn("frame_idx", F.col("frame_idx").cast("long"))
