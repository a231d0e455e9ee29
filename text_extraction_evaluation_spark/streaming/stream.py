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


SESSION_STATE_SCHEMA = "n_events long, t_first timestamp, t_last timestamp"
SESSION_OUT_SCHEMA = (
    "user_id long, session_events long, t_first timestamp, t_last timestamp, "
    "closed boolean"
)


def sessionize_events_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
):
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the build-brief surface for operators Spark's built-in windowed
    aggregates can't express): per-user session tracking with a
    session-gap timeout.

    State per user_id: (event count, first ts, last ts). A micro-batch
    folds its events into the state; the state times out ``gap`` after
    the watermark passes the last event, at which point the CLOSED
    session row is emitted (plus a live progress row each batch).
    Batch twin for correctness intuition: ``q_event_sessions`` in
    plans/queries.py (gap sessionization via lag + cumulative sum).

    Arrival-order contract (standard for watermarked stateful ops):
    input must be (near-)time-ordered across micro-batches — rows
    older than ``watermark`` behind the stream's max event time are
    dropped by Spark before reaching the state function. Replaying an
    unordered historical dump through this operator loses events; use
    the batch twin for backfills, this operator for live tails.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = {"30 minutes": 30 * 60 * 1000, "1 hour": 60 * 60 * 1000}.get(
        gap, 30 * 60 * 1000
    )

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            n, t_first, t_last = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, n, t_first, t_last, True)],
                columns=["user_id", "session_events", "t_first", "t_last", "closed"],
            )
            return
        n, t_first, t_last = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            lo, hi = pdf["ts"].min(), pdf["ts"].max()
            t_first = lo if t_first is None else min(t_first, lo)
            t_last = hi if t_last is None else max(t_last, hi)
        state.update((n, t_first, t_last))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap_ms)
        yield pd.DataFrame(
            [(user_id, n, t_first, t_last, False)],
            columns=["user_id", "session_events", "t_first", "t_last", "closed"],
        )

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


__all__ = [
    "EXTRACT_SCHEMA",
    "read_pages_stream",
    "extract_stream",
    "start_extraction_stream",
    "windowed_status_counts",
    "sessionize_events_stream",
]
