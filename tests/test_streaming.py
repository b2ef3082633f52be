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


def test_stateful_dedup_min_across_arrow_chunks(spark, tmp_path):
    """A fingerprint whose duplicates span multiple Arrow chunks within one
    micro-batch must still emit the GLOBAL min doc_id (not the first
    chunk's local min) and count every duplicate seen at emission time."""
    from pyspark.sql import functions as F

    from wikidata_to_cidoc_crm_spark.streaming.dedup_stream import (
        batch_first_seen, streaming_first_seen)

    # 30 duplicates of one text, doc_ids DESCENDING in file order so the
    # first Arrow chunk's local min (d25) differs from the global min (d00)
    docs = spark.createDataFrame(
        [(f"d{29 - i:02d}", "same text every time") for i in range(30)],
        "doc_id string, text string")
    src_dir = str(tmp_path / "dups_dir")
    docs.coalesce(1).write.mode("overwrite").parquet(src_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema).parquet(src_dir)
        q = (streaming_first_seen(stream)
             .writeStream.format("memory").queryName("chunked_first_seen")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck3"))
             .trigger(availableNow=True).start())
        q.awaitTermination(240)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = [(r["doc_id"], r["n_dups_seen"]) for r in
           spark.sql("select * from chunked_first_seen").collect()]
    assert got == [("d00", 29)]
    expected = [(r["doc_id"], r["n_dups_seen"]) for r in
                batch_first_seen(spark.read.parquet(src_dir)).collect()]
    assert got == expected
