"""Job orchestration: the resumable extraction run (SURVEY.md §3.2/§4.3).

The 100 TB design: pages are bucketed by url-hash; buckets are grouped
into CHUNKS; each chunk is extracted and committed atomically through
the catalog together with its per-partition lineage rows
(``run_metrics``). A re-run after any failure:

* skips chunks whose commit is already in the manifest (fast path);
* anti-joins the committed url set inside a recovering chunk (safety
  net — no url is ever extracted twice even if bucket assignment
  changed between runs, BASELINE.json:6 resumable runs).

At cluster scale, chunking bounds the blast radius of a lost job to
one chunk and gives natural checkpoint granularity; within a chunk the
extraction kernel is a map-only stage.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import EXTRACTED_COLS, extract_pages
from ..sources.catalog import LocalCatalog

RUN_METRICS_COLS = [
    "run_id", "chunk_id", "partition_id", "url_bucket",
    "n_docs", "n_ok", "n_err", "bytes_in", "t_start", "t_end",
]


class ChunkFailure(RuntimeError):
    """Injected failure for resume tests."""


def with_bucket(pages: DataFrame, n_buckets: int) -> DataFrame:
    return pages.withColumn(
        "url_bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


def run_metrics_from_extracted(extracted_chunk: DataFrame, run_id: str, chunk_id: str) -> DataFrame:
    """Lineage rows aggregated from the lineage ride-along columns the
    kernel emits (pid/bytes_in/t_unix) — no Python accumulators."""
    ok = F.col("status") == "ok"
    return (
        extracted_chunk.groupBy("pid", "url_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(ok, 1)).alias("n_ok"),
            F.count(F.when(F.col("status") == "parse_error", 1)).alias("n_err"),
            F.sum("bytes_in").alias("bytes_in"),
            F.min("t_unix").alias("t_start"),
            F.max("t_unix").alias("t_end"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(chunk_id).alias("chunk_id"),
            F.col("pid").alias("partition_id"),
            "url_bucket", "n_docs", "n_ok", "n_err", "bytes_in",
            "t_start", "t_end",
        )
    )


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    n_buckets: int = 16,
    buckets_per_chunk: int = 4,
    fail_after_chunks: int | None = None,
    run_id: str | None = None,
    max_concurrent_chunks: int = 1,
) -> LocalCatalog:
    """Extract ``pages`` chunk by chunk with atomic commits + lineage.

    ``max_concurrent_chunks > 1`` runs that many chunk jobs in flight
    at once (a driver-side thread pool submitting independent Spark
    jobs — the scheduler interleaves their stages). At 100 TB one
    chunk's tail stages rarely saturate the cluster; overlapping
    chunks keeps executors busy through commit barriers. Manifest
    commits stay atomic under concurrency (LocalCatalog serializes the
    read-modify-write).

    ``fail_after_chunks=k`` raises ChunkFailure after k successful chunk
    commits (resume-test hook). Re-invoking with the same ``out_root``
    resumes: committed chunks are skipped, the committed url set is
    anti-joined inside recovering chunks.
    """
    import threading

    cat = LocalCatalog(out_root)
    run_id = run_id or uuid.uuid4().hex[:12]
    bucketed = with_bucket(pages, n_buckets)

    done = cat.read(spark, "extracted")
    done_urls = done.select("url").distinct() if done is not None else None

    state = {"committed": 0}
    lock = threading.Lock()
    # fail-fast barrier: Future.cancel() only stops futures that never
    # started, and a worker can legally pick up a queued chunk in the
    # window between the first failure and the cancel sweep — the abort
    # flag makes late pickups no-ops, so a failure bounds commits at
    # (counted commits + in-flight workers), never the whole queue
    abort = threading.Event()

    def do_chunk(chunk_buckets: list[int], chunk_id: str) -> None:
        if abort.is_set():
            return
        try:
            _do_chunk(chunk_buckets, chunk_id)
        except BaseException:
            abort.set()
            raise

    def _do_chunk(chunk_buckets: list[int], chunk_id: str) -> None:
        chunk = bucketed.filter(F.col("url_bucket").isin(chunk_buckets))
        if done_urls is not None:
            chunk = chunk.join(done_urls, "url", "left_anti")  # J2 resume
        extracted = extract_pages(chunk.select("url", "warc_ts", "html", "lang")).join(
            chunk.select("url", "url_bucket"), "url"
        )
        # one write materializes the kernel once; metrics are derived
        # from the committed files (consistent by construction)
        cat.commit_append(extracted, "extracted", chunk_id,
                          meta={"run_id": run_id, "buckets": chunk_buckets})
        chunk_back = spark.read.parquet(cat.chunk_path("extracted", chunk_id))
        cat.commit_append(
            run_metrics_from_extracted(chunk_back, run_id, chunk_id),
            "run_metrics", chunk_id, meta={"run_id": run_id},
        )
        with lock:
            state["committed"] += 1
            if fail_after_chunks is not None and state["committed"] >= fail_after_chunks:
                raise ChunkFailure(f"injected failure after {state['committed']} chunks")

    pending: list[tuple[list[int], str]] = []
    for lo in range(0, n_buckets, buckets_per_chunk):
        chunk_buckets = list(range(lo, min(lo + buckets_per_chunk, n_buckets)))
        chunk_id = f"b{chunk_buckets[0]:04d}-{chunk_buckets[-1]:04d}"
        if not cat.is_committed("extracted", chunk_id):
            pending.append((chunk_buckets, chunk_id))

    if max_concurrent_chunks <= 1:
        for chunk_buckets, chunk_id in pending:
            do_chunk(chunk_buckets, chunk_id)
    else:
        from concurrent.futures import FIRST_EXCEPTION, ThreadPoolExecutor, wait

        with ThreadPoolExecutor(max_workers=max_concurrent_chunks) as pool:
            futures = [pool.submit(do_chunk, b, cid) for b, cid in pending]
            done, not_done = wait(futures, return_when=FIRST_EXCEPTION)
            # fail fast: on the first chunk error, cancel everything
            # still queued (in-flight chunks finish their commit — the
            # manifest stays consistent; a 1000-chunk run must not burn
            # hours completing a doomed job)
            first_err = next(
                (f.exception() for f in done if f.exception() is not None), None
            )
            if first_err is not None:
                for f in not_done:
                    f.cancel()
        if first_err is not None:
            raise first_err
    return cat


def read_extracted(spark: SparkSession, out_root: str) -> DataFrame | None:
    """User-facing view of the committed extraction output."""
    df = LocalCatalog(out_root).read(spark, "extracted")
    return None if df is None else df.select(*EXTRACTED_COLS)


def run_score_job(
    spark: SparkSession,
    out_root: str,
    gold: DataFrame,
    extractor: str = "justext_spark",
) -> LocalCatalog:
    """Score the committed extraction output against gold and commit
    ``scores`` + ``report`` tables (S4) — idempotent like extraction."""
    from ..operators.report import ranked_report
    from ..operators.score import score_extracted

    cat = LocalCatalog(out_root)
    extracted = read_extracted(spark, out_root)
    if extracted is None:
        raise RuntimeError(f"no committed extraction output under {out_root}")
    scores = score_extracted(extracted, gold, extractor=extractor)
    cat.commit_append(scores, "scores", "full")
    scores_back = spark.read.parquet(cat.chunk_path("scores", "full"))
    cat.commit_append(ranked_report(scores_back), "report", "full")
    return cat
