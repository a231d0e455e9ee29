"""The curation pipeline as a RESUMABLE JOB (the production shape of
`plans.q_lm.curation_funnel`): corpus-level stage artifacts are
committed once, the corpus is cleaned chunk-by-chunk with atomic
commits + per-chunk funnel lineage, and the packing index is the final
committed step. Mirrors `plans.jobs.run_extraction_job`'s contract:
re-running after any failure skips committed work and converges to the
same curated corpus a single-shot run produces (tests/test_mix_jobs).

Why artifacts-then-chunks: the three funnel stages that need
corpus-wide state (exact-dup min-id groups, the near-dup component
graph, the perplexity tercile cut) are each TINY outputs of one
corpus-wide job — committing them first makes every later chunk a
pure map-side filter (two broadcast anti-joins + JVM expressions), so
chunk cost is bounded by chunk size regardless of corpus size, and a
re-run never re-pays the expensive graph/LM passes.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import LocalCatalog
from .common import _t
from .q_lm import (
    c4_quality_keep,
    gopher_repetition_pass,
    lm_perplexity_score,
    pack_coordinates,
)
from ..functions.text import tokens_col

CURATION_METRICS_COLS = [
    "run_id", "chunk_id", "n_in", "n_exact", "n_quality",
    "n_repetition", "n_near_dup", "n_kept",
]


def exact_dup_drops(docs: DataFrame) -> DataFrame:
    """Corpus-wide exact-dedup drop list: every doc that is not the
    min-id of its exact-text group. Output is only the dup tail —
    empty when the corpus has no exact dups."""
    groups = (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return (
        docs.join(groups, "text")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )


def near_dup_drops(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Corpus-wide near-dup drop list via the component machinery."""
    from ..operators.dedup import connected_components, verified_near_dup_pairs

    comp = connected_components(verified_near_dup_pairs(docs, threshold))
    return comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")


def ppl_tail_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide perplexity tail (per-lang tercile 3) drop list."""
    scored = lm_perplexity_score(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    return (
        scored.withColumn("tercile", F.ntile(3).over(w))
        .filter(F.col("tercile") == 3)
        .select("doc_id")
    )


def _artifact(cat: LocalCatalog, spark: SparkSession, name: str, build) -> DataFrame:
    """Commit a corpus-level artifact once; later runs read it back."""
    if not cat.is_committed(name, "full"):
        cat.commit_append(build(), name, "full")
    return cat.read(spark, name)


def run_curation_job(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    n_buckets: int = 8,
    buckets_per_chunk: int = 2,
    fail_after_chunks: int | None = None,
    run_id: str | None = None,
) -> LocalCatalog:
    """Run the 5-stage curation funnel as chunked atomic commits.

    Tables committed: ``exact_drops`` / ``near_dup_drops`` /
    ``ppl_drops`` (corpus-level artifacts, once), ``curated`` (the
    surviving documents, one chunk per doc_id bucket group),
    ``curation_metrics`` (per-chunk funnel lineage), ``pack_index``
    (the final loader coordinates over the full curated corpus).

    ``fail_after_chunks=k`` raises after k chunk commits (resume-test
    hook, same contract as run_extraction_job)."""
    cat = LocalCatalog(out_root)
    run_id = run_id or uuid.uuid4().hex[:12]
    docs = _t(spark, sf_dir, "documents")

    exact = _artifact(cat, spark, "exact_drops", lambda: exact_dup_drops(docs))
    near = _artifact(
        cat, spark, "near_dup_drops", lambda: near_dup_drops(docs)
    )
    ppl = _artifact(
        cat, spark, "ppl_drops", lambda: ppl_tail_drops(spark, sf_dir)
    )
    drop_flag = lambda df, name: F.broadcast(  # noqa: E731
        df.select("doc_id", F.lit(True).alias(name))
    )

    committed = 0
    for lo in range(0, n_buckets, buckets_per_chunk):
        buckets = list(range(lo, min(lo + buckets_per_chunk, n_buckets)))
        chunk_id = f"b{buckets[0]:04d}-{buckets[-1]:04d}"
        if cat.is_committed("curated", chunk_id):
            continue
        w = tokens_col("text")
        chunk = (
            docs.filter(
                F.pmod(F.col("doc_id"), F.lit(n_buckets)).isin(buckets)
            )
            .join(drop_flag(exact, "x_drop"), "doc_id", "left")
            .join(drop_flag(near, "n_drop"), "doc_id", "left")
            .join(drop_flag(ppl, "p_drop"), "doc_id", "left")
            .withColumn("f1", F.coalesce(~F.col("x_drop"), F.lit(True)))
            .withColumn("f2", c4_quality_keep(w))
            .withColumn("f3", gopher_repetition_pass(w))
            .withColumn("f4", F.coalesce(~F.col("n_drop"), F.lit(True)))
            .withColumn("f5", F.coalesce(~F.col("p_drop"), F.lit(True)))
        )
        kept = chunk.filter(
            F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4") & F.col("f5")
        ).select(docs.columns)
        cat.commit_append(
            kept, "curated", chunk_id, meta={"run_id": run_id, "buckets": buckets}
        )
        b = lambda c: c.cast("bigint")  # noqa: E731
        metrics = chunk.agg(
            F.count(F.lit(1)).alias("n_in"),
            F.sum(b(F.col("f1"))).alias("n_exact"),
            F.sum(b(F.col("f1") & F.col("f2"))).alias("n_quality"),
            F.sum(b(F.col("f1") & F.col("f2") & F.col("f3"))).alias(
                "n_repetition"
            ),
            F.sum(
                b(F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4"))
            ).alias("n_near_dup"),
            F.sum(
                b(
                    F.col("f1")
                    & F.col("f2")
                    & F.col("f3")
                    & F.col("f4")
                    & F.col("f5")
                )
            ).alias("n_kept"),
        ).select(
            F.lit(run_id).alias("run_id"),
            F.lit(chunk_id).alias("chunk_id"),
            "n_in", "n_exact", "n_quality", "n_repetition",
            "n_near_dup", "n_kept",
        )
        cat.commit_append(metrics, "curation_metrics", chunk_id,
                          meta={"run_id": run_id})
        committed += 1
        if fail_after_chunks is not None and committed >= fail_after_chunks:
            from .jobs import ChunkFailure

            raise ChunkFailure(
                f"injected failure after {committed} curation chunks"
            )

    if not cat.is_committed("pack_index", "full"):
        curated = cat.read(spark, "curated")
        cat.commit_append(
            pack_coordinates(curated), "pack_index", "full",
            meta={"run_id": run_id},
        )
    return cat
