"""Structured Streaming surface.

Two streaming behaviors exist in the reference's world (SURVEY.md §2.10):

- **ST1 async jobs** — here: streaming extraction with
  ``Trigger.AvailableNow`` + checkpointLocation, the streaming variant of
  the manifest pipeline (exactly-once per micro-batch via the sink
  checkpoint).
- **W1 rate limiting** (reference api/rate_limit.py:46-52, fixed
  60/min window) — here: watermarked tumbling-window counts per key with
  an over-limit flag.

Both operate on the same transcripts/events schemas as the batch path;
``mapInArrow`` extraction works unchanged on a streaming DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_api_spark.schema import TRANSCRIPTS_SCHEMA

DEFAULT_RATE_LIMIT_PER_MIN = 60  # reference api/config.py:100-107


def transcripts_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def extract_stream(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str):
    """Streaming extraction job: new transcript files -> extracted parquet,
    exactly-once via the streaming checkpoint. Returns the query; callers
    use Trigger.AvailableNow semantics (processAllAvailable in tests)."""
    from docling_api_spark.operators.extract import extract_text_column

    stream = transcripts_stream(spark, input_dir)
    extracted = extract_text_column(stream)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def rate_limit_counts(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts",
                      limit_per_min: int = DEFAULT_RATE_LIMIT_PER_MIN) -> DataFrame:
    """Watermarked per-minute fixed-window request counts + over-limit
    flag — W1 as a streaming aggregation (late data beyond 10 minutes is
    dropped at the watermark)."""
    return (
        events.withWatermark(ts_col, "10 minutes")
        .groupBy(F.window(F.col(ts_col), "1 minute").alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_requests"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_requests",
            (F.col("n_requests") > limit_per_min).alias("over_limit"),
        )
    )
