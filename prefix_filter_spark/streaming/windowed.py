"""Watermarked windowed streaming aggregations over event streams.

Late-data handling via watermark + tumbling/sliding windows (the
standard Structured Streaming shape, pyspark_guide.md 'Structured
Streaming'), with the sketch surface on top: per-window approximate
distinct users (built-in HLL++, our oracle family) next to exact
counts. Append mode: a window only emits once the watermark passes it,
so downstream sinks see each window exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    *,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """stream(ts, user_id, event_type, value) -> per-window stats.

    Returns (window_start, window_end, event_type, n, n_users_approx,
    sum_value). Works on batch DataFrames too (same plan minus state).
    """
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "n_users_approx",
            "sum_value",
        )
    )
