"""Streaming sessionization (streaming/sessions.py): the closed-session
stream equals the batch lag-split twin on the same input."""

import shutil
import time

from pyspark.sql import Window as W
from pyspark.sql import functions as F

TMP = "/tmp/pfs_sessions_test"


def _batch_sessions(ev, gap_s=1800):
    """Exact batch twin: lag split on epoch-microseconds."""
    w = W.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    marked = ev.withColumn(
        "sid",
        F.sum(
            F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1).otherwise(0)
        ).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return marked.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


def test_stream_equals_batch(spark):
    # a stale checkpoint would make the stream skip "processed" files
    shutil.rmtree(TMP, ignore_errors=True)
    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        # parquet reads ts as TIMESTAMP_NTZ; unix_micros/watermarks
        # want TIMESTAMP (session TZ is pinned UTC, so the cast is safe)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .where(F.col("user_id") < 40)  # keep the state/session count modest
    )
    src = f"{TMP}/src"
    # batch 1: the real events; batch 2: a far-future sentinel that
    # advances the watermark past every real session's end + gap, so
    # EVERY real session closes through the event-time timeout
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)  # file-stream orders by mtime; keep the sentinel second
    far = ev.agg(
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts")
    ).select(F.lit(999_999).alias("user_id"), "ts")
    far.coalesce(1).write.mode("append").parquet(src)

    from prefix_filter_spark.streaming.sessions import streaming_sessions

    stream = spark.readStream.schema("user_id long, ts timestamp").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = streaming_sessions(stream, gap_seconds=1800, watermark="1 minute")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{TMP}/ckpt")
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(
            "SELECT * FROM sessions_stream WHERE user_id != 999999"
        ).collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in _batch_sessions(ev).collect()
    }
    assert len(want) > 50, "fixture should produce a real session count"
    assert got == want
