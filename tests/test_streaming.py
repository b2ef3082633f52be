"""Structured Streaming smoke: the same windowed-aggregation plan runs as a
real stream (file source, watermark, complete-mode memory sink) and agrees
with the batch result."""

from __future__ import annotations

from wikidata_to_cidoc_crm_spark.streaming.events import (
    stream_from_parquet,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = {
        (str(r["window_start"]), r["event_type"], r["n"], r["total_value"])
        for r in windowed_event_counts(batch).collect()
    }

    # file streams need a directory source
    src_dir = str(tmp_path / "events_dir")
    batch.write.mode("overwrite").parquet(src_dir)
    stream = stream_from_parquet(spark, src_dir, batch.schema)
    assert stream.isStreaming
    out = windowed_event_counts(stream, streaming=True)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (str(r["window_start"]), r["event_type"], r["n"], r["total_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got == expected


def test_stateful_streaming_dedup_matches_batch_twin(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): streaming
    first-seen dedup emits exactly one row per fingerprint and matches the
    batch window twin (single micro-batch => first-arrival == min doc_id)."""
    from wikidata_to_cidoc_crm_spark.streaming.dedup_stream import (
        batch_first_seen, streaming_first_seen)

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    src_dir = str(tmp_path / "docs_dir")
    docs.coalesce(1).write.mode("overwrite").parquet(src_dir)

    expected = {(r["fingerprint"], r["doc_id"])
                for r in batch_first_seen(spark.read.parquet(src_dir)).collect()}

    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema).parquet(src_dir)
    out = streaming_first_seen(stream)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("first_seen")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = {(r["fingerprint"], r["doc_id"])
           for r in spark.sql("select * from first_seen").collect()}
    assert got == expected and len(got) > 0
