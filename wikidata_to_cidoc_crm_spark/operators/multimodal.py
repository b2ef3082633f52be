"""Multimodal column plumbing: opaque binary media + typed metadata.

Media spans in the interleaved documents reference binary payloads
(image/audio/video). The engine treats payloads as opaque ``binary``
columns with a typed metadata struct, and runs decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

The actual codec work is STUBBED (image/audio libraries are not in this
container): ``decode_stub`` produces a deterministic fake decode so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures — is
real and tested end-to-end. Swap ``_decode_payload`` for PIL/librosa etc.
in production.
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


def _decode_payload(payload: bytes, kind: str, feature_dim: int) -> list[float]:
    """STUB decode/feature-extract: deterministic pseudo-features from the
    payload hash. Replace with a real codec in production; raise to make the
    substitution point explicit when payloads are real media."""
    if payload is None:
        raise NotImplementedError("real media decode requires codec libraries")
    h = hashlib.sha256(payload).digest()
    return [((h[i % len(h)] / 255.0) * 2 - 1) for i in range(feature_dim)]


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
                except NotImplementedError:
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
