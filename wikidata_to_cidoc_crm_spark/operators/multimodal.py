"""Multimodal column plumbing: opaque binary media + typed metadata.

Media spans in the interleaved documents reference binary payloads
(image/audio/video). The engine treats payloads as opaque ``binary``
columns with a typed metadata struct, and runs decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

Codec status: WAV (RIFF/PCM 8- and 16-bit) payloads are decoded for REAL
(pure-Python/numpy parser, ``_decode_wav``) — per-segment RMS features over
the PCM samples. Other formats (image/video codecs are not in this
container) fall back to a deterministic sha256-derived pseudo-feature so
the Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is exercised end-to-end; swap the fallback for PIL/ffmpeg etc. in
production.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("kind", T.StringType(), True),     # image|audio|video
            T.StructField("mime", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = (
    "media_ref string, kind string, n_bytes int, feature array<float>, ok boolean"
)


def synthesize_media_table(docs: DataFrame) -> DataFrame:
    """Build a media table from interleaved docs' media spans, with
    deterministic fake payloads (sha1-derived bytes) — test fixture only."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    # md5-conv selection (not xxhash64) so the DuckDB oracle twin can
    # re-derive the kind column bit-for-bit
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.conv(F.substring(F.md5("media_ref"), 1, 6), 16, 10).cast("long")
         % 3 + 1).cast("int"),
    )
    return refs.select(
        "media_ref",
        F.sha2("media_ref", 256).cast("binary").alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_wav(payload: bytes, feature_dim: int) -> list[float]:
    """REAL codec path: minimal RIFF/PCM WAV parser (pure Python + numpy).

    Supports uncompressed PCM (format 1), 8-bit unsigned / 16-bit signed,
    any channel count (downmixed by mean). Features are per-segment RMS
    over ``feature_dim`` equal time slices of the normalized waveform —
    deterministic, order-stable, rounded to 6 decimals.
    """
    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = max(1, int.from_bytes(fmt[2:4], "little"))
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV encoding: format={audio_format} bits={bits}")
    if bits == 16:
        samples = np.frombuffer(
            data[: len(data) // 2 * 2], dtype="<i2").astype(np.float64) / 32768.0
    else:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    usable = len(samples) // n_channels * n_channels
    if usable == 0:
        return [0.0] * feature_dim
    frames = samples[:usable].reshape(-1, n_channels).mean(axis=1)
    segments = np.array_split(frames, feature_dim)
    return [round(float(np.sqrt(np.mean(s * s))), 6) if len(s) else 0.0
            for s in segments]


def _decode_payload(payload: bytes, kind: str, feature_dim: int) -> list[float]:
    """Decode/feature-extract one payload.

    RIFF/PCM WAV payloads take the real decoder (``_decode_wav``); other
    formats fall back to deterministic sha256-derived pseudo-features (the
    documented codec-substitution point — swap for PIL/ffmpeg in
    production). ``None`` payloads (media_ref present, bytes not fetched)
    raise so the caller records ok=False instead of fabricating features.
    """
    if payload is None:
        raise NotImplementedError("payload bytes absent — fetch before decode")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload, feature_dim)
    h = hashlib.sha256(payload).digest()
    return [((h[i % len(h)] / 255.0) * 2 - 1) for i in range(feature_dim)]


def synth_wav(seed: str, n_samples: int = 800, sample_rate: int = 8000,
              bits: int = 16, channels: int = 1) -> bytes:
    """Deterministic RIFF/PCM WAV payload for fixtures/tests: a sine whose
    frequency and amplitude derive from the md5 of ``seed`` — no RNG state,
    identical bytes on every call/executor."""
    import math
    import struct

    h = hashlib.md5(seed.encode()).digest()
    freq = 100 + (h[0] | (h[1] << 8)) % 1900            # 100..1999 Hz
    amp = 0.25 + (h[2] / 255.0) * 0.7                   # 0.25..0.95
    frames = bytearray()
    for i in range(n_samples):
        v = amp * math.sin(2 * math.pi * freq * i / sample_rate)
        for _ in range(channels):
            if bits == 16:
                frames += struct.pack("<h", int(v * 32767))
            else:
                frames += struct.pack("<B", int((v + 1.0) * 127.5))
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    data = bytes(frames)
    riff_body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                 + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def extract_media_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Arrow-batched decode + feature extraction over the media table.

    One `mapInPandas` stage: batches arrive as pandas frames, the stubbed
    decode runs per payload (vectorizable when a real codec supports batch
    decode), output schema is stable for downstream joins.
    """
    def run(batches):
        import pandas as pd

        for pdf in batches:
            feats, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    feats.append(_decode_payload(payload, kind, feature_dim))
                    oks.append(True)
                except (NotImplementedError, ValueError):
                    # absent bytes or malformed container: keep the row,
                    # flag it — a bad payload must not kill the task
                    feats.append([0.0] * feature_dim)
                    oks.append(False)
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "feature": feats,
                "ok": oks,
            })

    flat = media.select(
        "media_ref", "payload", F.col("meta.kind").alias("kind"))
    return flat.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled timestamp
    (decode itself stubbed). Pure column math — scales as a projection."""
    vids = media.filter(F.col("meta.kind") == "video")
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )
