"""Streaming extraction façade (SURVEY.md §2.11).

The reference is pure batch and the 10^12-row rebuild is batch with
resumable chunks — but because the extraction kernel is stateless per
row, it lifts unchanged into Structured Streaming: a parquet-directory
stream of pages -> the same ``extract_pages`` kernel -> append sink
with checkpointing. This module is that lift, plus a watermarked
windowed quality aggregate as the stateful example.

Use case at scale: continuous extraction of newly-landed crawl
segments (file-arrival stream on the pages table location).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import EXTRACT_SCHEMA, extract_pages
from ..sources.readers import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def extract_stream(pages_stream: DataFrame) -> DataFrame:
    """The batch kernel applied to a stream — identical code path
    (mapInPandas is stream-capable for stateless kernels)."""
    return extract_pages(pages_stream)


def start_extraction_stream(
    pages_stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Append-mode parquet sink with checkpointing: the streaming twin
    of the batch chunk/manifest resume (exactly-once via checkpoint +
    idempotent file sink)."""
    extracted = extract_stream(pages_stream)
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_status_counts(pages_stream: DataFrame, watermark: str = "1 hour"):
    """Stateful streaming aggregate: per 10-minute crawl-time window,
    extraction status counts with late-data watermarking."""
    extracted = extract_stream(pages_stream)
    return (
        extracted.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "10 minutes"), "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


__all__ = [
    "EXTRACT_SCHEMA",
    "read_pages_stream",
    "extract_stream",
    "start_extraction_stream",
    "windowed_status_counts",
]
