"""Structured Streaming: incremental encode + watermarked window agg."""

import shutil

import pytest
from pyspark.sql import functions as F

from parzig_spark.operators import decode_table, verify_roundtrip
from parzig_spark.streaming import encode_stream, windowed_event_counts

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def doc_stream_dir(spark, tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(f"{SF}/documents.parquet", d / "part-0.parquet")
    return str(d)


def test_streaming_encode(spark, doc_stream_dir, tmp_path):
    batch = spark.read.parquet(doc_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(doc_stream_dir)
    root = str(tmp_path / "store")
    q = encode_stream(
        stream,
        root,
        group_cols=["lang", "source"],
        salt_cols=["doc_id"],
        checkpoint_dir=str(tmp_path / "cp"),
        size_col="text",
        target_bytes=1 << 20,
    )
    q.awaitTermination(120)
    decoded = decode_table(spark, root)
    report = verify_roundtrip(batch, decoded, ["doc_id"], ["text", "lang"])
    assert report["ok"], report

    # Replaying the same input (fresh checkpoint) must be a no-op thanks to
    # manifest-level idempotence — the partition-level exactly-once story.
    q2 = encode_stream(
        stream,
        root,
        group_cols=["lang", "source"],
        salt_cols=["doc_id"],
        checkpoint_dir=str(tmp_path / "cp2"),
        size_col="text",
        target_bytes=1 << 20,
    )
    q2.awaitTermination(120)
    report2 = verify_roundtrip(batch, decode_table(spark, root), ["doc_id"], ["text"])
    assert report2["ok"] and report2["rows"] == report["rows"]


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    batch = spark.read.parquet(str(d))
    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["wstart"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in spark.sql("select * from win_counts").collect()
    }
    expected = {
        (r["wstart"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
            )
            .select(F.col("w.start").alias("wstart"), "event_type", "n_events", "sum_value_cents")
            .collect()
        )
    }
    # The final windows may be withheld by the watermark in append mode;
    # every emitted window must match the batch computation exactly.
    assert got, "streaming produced no windows"
    for k, v in got.items():
        assert expected[k] == v, k
