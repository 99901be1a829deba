"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes,
mapInPandas partitioning. The decode boundary is explicit and split:

- REAL pure-numpy decoders for two public container-free formats:
  binary PPM (P6) images and RIFF/PCM WAV audio — header parse +
  numpy frombuffer, no external libraries. `extract_features(
  fake=False)` decodes these for real (dims/sample counts from the
  actual headers, checksum/features over the DECODED pixel/sample
  arrays), and `resize_nearest` is a real nearest-neighbor image
  resample over PPM payloads.
- CODEC formats (JPEG/PNG/MP3/H.264...) require PIL/ffmpeg, which are
  not in this container: payloads whose magic is not PPM/WAV raise
  NotImplementedError under fake=False — the documented public-API
  contract of this deployment, not an accident.
- `fake=True` (the default, used by the oracled queries) keeps the
  deterministic stand-in decoder so the full pipeline shape is
  exercised against DuckDB regardless of payload format.

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


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 array as a binary PPM (P6) payload
    — the Netpbm format: ASCII header 'P6\\n<w> <h>\\n255\\n' followed
    by raw interleaved RGB bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """REAL image decode for binary PPM (P6): parse the Netpbm header
    (whitespace/comment-tolerant), then one numpy frombuffer over the
    raw RGB plane. Returns (h, w, 3) uint8. Raises ValueError on a
    malformed payload."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval tokens; '#' comments legal
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        tokens.append(data[i:j])
        i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    i += 1  # single whitespace byte after maxval
    plane = data[i : i + w * h * 3]
    if len(plane) != w * h * 3:
        raise ValueError("truncated PPM pixel plane")
    return np.frombuffer(plane, dtype=np.uint8).reshape(h, w, 3)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Serialize (n,) or (n, channels) int16 samples as a minimal
    RIFF/PCM WAV payload (fmt + data chunks)."""
    import struct

    if samples.ndim == 1:
        samples = samples[:, None]
    assert samples.dtype == np.int16
    n, ch = samples.shape
    data = samples.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(fmt) + len(data_hdr) + len(data), b"WAVE"
    )
    return riff + fmt + data_hdr + data


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """REAL audio decode for RIFF/PCM WAV: walk the chunk list, parse
    the fmt chunk (PCM 16-bit only), frombuffer the data chunk.
    Returns (sample_rate, (n, channels) int16). Raises ValueError on
    malformed/non-PCM payloads."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, ch, bits, pcm = 12, None, None, None, None
    while i + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[i : i + 8])
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
            if ch < 1:
                raise ValueError("fmt chunk declares zero channels")
        elif cid == b"data":
            pcm = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(pcm[: len(pcm) - len(pcm) % (2 * ch)], dtype=np.int16)
    return rate, samples.reshape(-1, ch)


def _real_decode(
    content: bytes, feature_dim: int
) -> tuple[int, int, str, np.ndarray]:
    """Dispatch on magic bytes: PPM/WAV decode for real; anything else
    is the declared codec boundary. Returns (width, height, checksum,
    feature) where checksum/feature are over the DECODED arrays."""
    if content.startswith(b"P6"):
        px = decode_ppm(content)
        h, w, _ = px.shape
        flat = px.astype(np.float32).ravel()
    elif content.startswith(b"RIFF"):
        rate, samples = decode_wav(content)
        w, h = samples.shape[0], samples.shape[1]  # n_samples x channels
        flat = samples.astype(np.float32).ravel() / 32768.0 * 255.0
    else:
        raise NotImplementedError(
            "real decode supports binary PPM (P6) images and 16-bit PCM "
            "WAV audio (pure-numpy, no codec libraries in this "
            "container); JPEG/PNG/MP3/video payloads need PIL/ffmpeg — "
            "use fake=True for the deterministic pipeline-shape stub"
        )
    checksum = hashlib.sha256(flat.tobytes()).hexdigest()[:16]
    # feature: block means over the decoded plane, feature_dim blocks
    pad = (-len(flat)) % feature_dim
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.float32)])
    feature = flat.reshape(feature_dim, -1).mean(axis=1) / 255.0
    return w, h, checksum, feature.astype(np.float32)


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
    FEATURE_SCHEMA.

    fake=False is the REAL path for PPM/WAV payloads (pure-numpy
    header parse + frombuffer; dims, checksum and block-mean features
    computed over the DECODED pixel/sample arrays). Payloads in codec
    formats raise NotImplementedError per the module contract. The
    decode itself is per-payload (as any real decode is) but batches
    amortize the Arrow transfer and the feature math is numpy."""
    # only what the function reads crosses the JVM↔Python boundary —
    # Spark cannot prune columns through an opaque mapInPandas, and
    # `meta` (a map column) was being serialized into every batch unused
    df = df.select("media_id", "kind", "content")
    if not fake:

        def op_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mid, kind, c in zip(
                    pdf["media_id"], pdf["kind"], pdf["content"]
                ):
                    b = bytes(c) if c is not None else b""
                    w, h, cs, feat = _real_decode(b, feature_dim)
                    rows.append((mid, kind, w, h, len(b), cs, feat))
                yield pd.DataFrame(
                    rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
                )

        return df.mapInPandas(op_real, FEATURE_SCHEMA)

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


def synthetic_real_media(
    spark: SparkSession, n: int, seed: int = 42
) -> DataFrame:
    """Deterministic table of REAL decodable payloads — even ids get a
    gradient PPM image (w, h derived from the id), odd ids a sine-tone
    PCM WAV — built executor-side in mapInPandas (no driver-side byte
    buffers, partitions scale with `n`)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 2 == 0:
                    w, h = 8 + (i * 7 + seed) % 56, 8 + (i * 13 + seed) % 40
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [
                            (xx * 255 // max(w - 1, 1)),
                            (yy * 255 // max(h - 1, 1)),
                            ((xx + yy + i) % 256),
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    rows.append((f"m-{i}", "image", encode_ppm(px)))
                else:
                    n_s = 256 + (i * 31 + seed) % 1024
                    t = np.arange(n_s, dtype=np.float64)
                    freq = 110.0 + (i % 80) * 10.0
                    wave = (
                        np.sin(2 * np.pi * freq * t / 16000.0) * 12000.0
                    ).astype(np.int16)
                    rows.append((f"m-{i}", "audio", encode_wav(wave)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    # partition count scales with n (≈32 media rows per Python task)
    # instead of always fanning to defaultParallelism: at small n the
    # per-task JVM↔Python round trips dominate the decode itself
    # (guide §4 — two chained mapInPandas stages × 32 near-empty
    # batches), while at corpus scale this still widens to every core
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 32))
    return (
        spark.range(n, numPartitions=n_parts)
        .mapInPandas(gen, out_schema)
        .withColumn(
            "meta",
            F.map_from_arrays(
                F.array(F.lit("source")), F.array(F.lit("synthetic-real"))
            ),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def resize_nearest(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize (nearest-neighbor) over PPM payloads: decode,
    index-map resample with numpy fancy indexing, re-encode as PPM.
    Non-PPM rows are dropped (filter on the magic is pushed into the
    scan JVM-side before any Python runs)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                px = decode_ppm(bytes(c))
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out = px[yi[:, None], xi[None, :]]
                rows.append((mid, out_w, out_h, encode_ppm(out)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "content"]
            )

    magic = F.substring(F.col("content").cast("string"), 1, 2) == "P6"
    return (
        df.where(magic)
        .select("media_id", "content")
        .mapInPandas(op, RESIZED_SCHEMA)
    )
