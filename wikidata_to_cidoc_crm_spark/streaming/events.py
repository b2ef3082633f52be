"""Structured Streaming ingest variant (engine-added; the reference is
strictly batch — SURVEY.md §2.8).

Tumbling-window mention/event aggregation with a watermark for late data.
The same transformation works on a batch DataFrame (tests/bench run it in
batch; a readStream source swaps in transparently — the logical plan is
identical, which is the point of Structured Streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """(window_start, event_type, n, total_value) tumbling-window counts."""
    src = events
    if streaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def stream_from_parquet(spark, path: str, schema) -> DataFrame:
    """readStream wrapper for file-based micro-batch ingest.

    Event-time columns must be TIMESTAMP (with local tz) for watermarks —
    parquet NTZ timestamps are cast through."""
    df = spark.readStream.schema(schema).parquet(path)
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df
