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
