"""The production extraction pipeline: read -> salt -> sort -> extract ->
write + lineage, resumable from a committed manifest.

Spark restatement of the reference's flagship request path (SURVEY.md
§3.1): the async-job lifecycle (reference api/routes/documents.py:255-339)
becomes batch-with-checkpoints — every run commits completed work units
to a manifest (the sandbox stand-in for Iceberg snapshot commits; the
substitution is documented in checkpoint.py), and a re-run processes only
uncommitted units (resume, north rule).

Scale design:
- **Work unit / partition key**: ``bucket = pmod(xxhash64(conv_id), B)``
  conversation-level buckets make resume tracking O(B), not O(rows).
- **Skew salting**: the shuffle key is ``(conv_id, turn_idx // SALT_BLOCK)``
  — a single 10^6-turn conversation splits into ~4k-turn blocks spread
  over the cluster instead of landing on one task. Extraction is
  per-turn independent, so block splitting cannot change results
  (batch-invariance is tested); only the within-partition sort keeps
  (conv_id, turn_idx) runs contiguous for downstream consumers.
- **No wide shuffle**: one repartition of the raw input; extraction,
  write, and lineage aggregation all happen without another exchange
  (lineage aggregates the written output's footer-level columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_api_spark.operators.extract import extract_text_column
from docling_api_spark.operators.metering import credits_col
from docling_api_spark.plans.checkpoint import Manifest

DEFAULT_BUCKETS = 64
SALT_BLOCK = 4096  # turns per salt block; >max Arrow batch, < skew threshold


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def salted_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Shuffle on (conv_id, turn-block): heavy conversations split across
    partitions; short ones stay whole."""
    salted = df.withColumn(
        "_salt", (F.col("turn_idx") / F.lit(SALT_BLOCK)).cast("int")
    )
    return (
        salted.repartition(num_partitions, "conv_id", "_salt")
        .sortWithinPartitions("conv_id", "turn_idx")
        .drop("_salt")
    )


def run_extraction(
    spark: SparkSession,
    transcripts: DataFrame,
    output_dir: str,
    snapshot_id: str = "snap-0",
    n_buckets: int = DEFAULT_BUCKETS,
    num_partitions: int | None = None,
    limit_buckets: int | None = None,
) -> dict:
    """One (resumable) run. Returns a summary dict.

    ``limit_buckets`` processes at most that many pending buckets — used
    by tests to simulate a killed run, and in production to bound a
    single run's blast radius.
    """
    manifest = Manifest(output_dir)
    done = manifest.committed_buckets()
    df = with_bucket(transcripts, n_buckets)
    pending_df = df.filter(~F.col("bucket").isin(sorted(done))) if done else df

    # which buckets are pending this run? (cheap distinct over the bucket col)
    pending = sorted(
        r["bucket"] for r in pending_df.select("bucket").distinct().collect()
    )
    if limit_buckets is not None:
        pending = pending[:limit_buckets]
        pending_df = pending_df.filter(F.col("bucket").isin(pending))
    if not pending:
        return {"run_id": manifest.next_run_id(), "buckets": [], "rows": 0,
                "resumed": True}

    parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    salted = salted_repartition(pending_df, parts)
    extracted = extract_text_column(salted, text_col="text")

    run_id = manifest.next_run_id()
    data_dir = f"{output_dir}/data"
    # data is laid out run_id/bucket so that files from a killed,
    # never-committed run are invisible to committed_view (Iceberg
    # orphan-file semantics) and a resume can never double-count
    (
        extracted.withColumn("run_id", F.lit(run_id))
        .write.mode("append")
        .partitionBy("run_id", "bucket")
        .parquet(data_dir)
    )

    # lineage from the data actually written (verify-what-committed):
    written = spark.read.parquet(data_dir).filter(
        (F.col("run_id") == run_id) & F.col("bucket").isin(pending)
    )
    lineage = (
        written.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("rows_out"),
            F.count(F.lit(1)).alias("rows_in"),  # extraction is 1:1
            F.sum((F.col("status") == "success").cast("long")).alias("n_success"),
            F.sum((F.col("status") == "error").cast("long")).alias("n_error"),
            F.sum((F.col("status") == "skipped_ocr").cast("long")).alias("n_skipped_ocr"),
            F.sum("pages").alias("pages"),
            F.sum(credits_col(F.col("pages"))).alias("credits"),
        )
        .withColumn("snapshot_id", F.lit(snapshot_id))
        .withColumnRenamed("bucket", "partition_id")
        .withColumn("run_id", F.lit(run_id))
    )
    lineage.coalesce(1).write.mode("append").parquet(f"{output_dir}/lineage")

    rows = written.count()
    manifest.commit(run_id, snapshot_id, pending)
    return {"run_id": run_id, "buckets": pending, "rows": rows, "resumed": bool(done)}


def job_status(spark: SparkSession, output_dir: str) -> DataFrame:
    """The reference's GET /v1/status analog (documents.py:302-339): job
    state derived from committed lineage, not from mutable driver state."""
    manifest = Manifest(output_dir)
    lineage = spark.read.parquet(f"{output_dir}/lineage")
    done = manifest.committed_buckets()
    return lineage.filter(F.col("partition_id").isin(sorted(done))).orderBy(
        "run_id", "partition_id"
    )
