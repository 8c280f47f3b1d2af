"""Streaming throughput metrics: tumbling-window aggregation with a
watermark over the event tail (SURVEY.md §2.9 T5).

The ingest pipeline already emits per-epoch throughput to the metrics
table (lineage.py). This module adds the continuous view: a windowed
events/sec series computed BY Structured Streaming itself, with
late-data handling via watermark — the operator shape a monitoring
dashboard would subscribe to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str,
    window_duration: str = "10 seconds",
    watermark: str = "30 seconds",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts with late-data watermark.

    Works on any streaming DataFrame with an event-time column; grouping
    keys beyond the window (e.g. event_type) are optional. The watermark
    bounds state: windows older than max(event_time) - watermark are
    finalized and dropped from the store.
    """
    keys = [F.window(F.col(ts_col), window_duration).alias("win")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(k) for k in (extra_keys or [])],
            "n_events",
        )
    )


def run_metrics_stream(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    ts_col: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "10 seconds",
    watermark: str = "30 seconds",
    extra_keys: list[str] | None = None,
):
    """Tail ``events_dir`` and append finalized windows to ``out_dir``
    (parquet). Drains currently-visible files and returns (availableNow)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    windows = windowed_event_counts(stream, ts_col, window_duration, watermark, extra_keys)
    q = (
        windows.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
