"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes,
mapInPandas partitioning — while the actual media decode is stubbed
(this container has no image/audio libraries): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (shape + checksum derived from the bytes) exercises the
full pipeline shape for tests and benchmarks.

Schema conventions:
    media struct: (media_id string, kind string, content binary,
                   meta map<string,string>)
    feature output: (media_id, kind, width int, height int,
                     n_bytes int, checksum string, feature array<float>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: binary payloads derived from ids
    (sha256-stretched), sized 256..4096 bytes — no external data.

    Size and kind derive from plain id arithmetic (not a hash) so the
    DuckDB oracle can regenerate the identical table from range(n)."""
    df = spark.range(n)
    payload = F.sha2(F.concat(F.lit(f"media-{seed}-"), F.col("id").cast("string")), 256)
    size = (F.pmod(F.col("id"), F.lit(15)) + 1) * 256
    content = F.substring(
        F.repeat(payload, 64), 1, size.cast("int")
    )  # pseudo-random-ish bytes as string -> binary
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.concat(F.lit("m-"), F.col("id").cast("string")).alias("media_id"),
        kind.alias("kind"),
        F.encode(content, "utf-8").alias("content"),
        F.map_from_arrays(
            F.array(F.lit("source")), F.array(F.lit("synthetic"))
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder: derives a (w, h)
    shape and checksum from the bytes. Replace with PIL/libvips decode
    in a real deployment."""
    h = hashlib.sha256(content).hexdigest()
    width = 16 + (int(h[:4], 16) % 1024)
    height = 16 + (int(h[4:8], 16) % 1024)
    return width, height, h[:16]


def extract_features(
    df: DataFrame, fake: bool = True, feature_dim: int = 8
) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas.

    Arrow streams binary batches to Python; each batch is processed as
    a whole (vectorized numpy checksum/feature math); output follows
    FEATURE_SCHEMA. With fake=False this raises NotImplementedError —
    the decode libraries are not in this container.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/torchaudio/ffmpeg — not in this container; "
            "pass fake=True for the deterministic stub"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payloads = [
                bytes(c) if c is not None else b"" for c in pdf["content"]
            ]
            # the sha256 itself is per-row by nature (hashlib has no
            # batch API); everything derived from it is whole-array:
            # digests concatenated once -> (n x 32) uint8 matrix, shape
            # and checksum computed by vectorized slices instead of the
            # round-1 per-row int(hex) parsing
            digests = b"".join(hashlib.sha256(b).digest() for b in payloads)
            dm = (
                np.frombuffer(digests, dtype=np.uint8).reshape(n, 32).astype(np.int64)
                if n
                else np.empty((0, 32), dtype=np.int64)
            )
            widths = (16 + ((dm[:, 0] << 8 | dm[:, 1]) % 1024)).astype(np.int32)
            heights = (16 + ((dm[:, 2] << 8 | dm[:, 3]) % 1024)).astype(np.int32)
            sums = [d.tobytes().hex() for d in dm[:, :8].astype(np.uint8)]
            # deterministic feature: first feature_dim bytes scaled —
            # one frombuffer over the fixed-size padded slices
            fbytes = b"".join(b[:feature_dim].ljust(feature_dim, b"\0") for b in payloads)
            fmat = (
                np.frombuffer(fbytes, dtype=np.uint8)
                .reshape(n, feature_dim)
                .astype(np.float32)
                / 255.0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": widths,
                    "height": heights,
                    "n_bytes": np.fromiter(
                        (len(b) for b in payloads), dtype=np.int32, count=n
                    ),
                    "checksum": sums,
                    "feature": list(fmat),
                }
            )

    return df.mapInPandas(op, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plumbing for video rows: emits one row per
    sampled offset with a slice of the payload — JVM-side explode of a
    computed offset sequence (shape-real; decode stays stubbed)."""
    n = F.least(
        (F.length("content") / every_n_bytes).cast("int") + 1, F.lit(max_frames)
    )
    offs = F.sequence(F.lit(0), n - 1)
    return (
        df.where(F.col("kind") == "video")
        .select("media_id", F.explode(offs).alias("frame_idx"), "content")
        .select(
            "media_id",
            "frame_idx",
            F.substring(
                F.col("content"), F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        )
    )
