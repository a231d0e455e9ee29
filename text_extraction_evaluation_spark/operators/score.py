"""M1/M2 + J1 — scoring operators (SURVEY.md §2.4, §2.9, Appendix B).

J1: extracted ⋈ gold on url — gold is orders of magnitude smaller than
the page corpus (an annotated eval set), so it is broadcast: zero
shuffle of the extracted side.

M1 (LCS) / M2 (bag-of-words): per-document token alignment inside one
``mapInArrow`` kernel (same channel-cost rationale as the extraction
kernel in operators/extract.py — the kernel reads plain Python strings
per row, so the pandas leg's DataFrame build on both sides of every
batch is pure overhead), emitting both metric families side by side
plus raw token counters so dataset-level micro aggregates can be
recomputed relationally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..algo.metrics import score_texts

SCORES_SCHEMA = (
    "url string, extractor string, dataset string, "
    "precision double, recall double, f1 double, "
    "precision_bow double, recall_bow double, f1_bow double, "
    "matched long, matched_bow long, retrieved long, relevant long, "
    "status string"
)


def score_extracted(
    extracted: DataFrame,
    gold: DataFrame,
    extractor: str = "justext_spark",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """scores(url, extractor, dataset, P/R/F1 x {lcs,bow}, counters, status).

    ``keep_cols`` passes named columns of ``extracted`` through the
    kernel untouched (typed from the input schema) — the streaming
    scorer uses it to keep ``warc_ts`` alive for event-time windowed
    micro aggregates, which the url-keyed score row otherwise drops."""
    passthrough = [
        f"{c} {extracted.schema[c].dataType.simpleString()}" for c in keep_cols
    ]
    schema = ", ".join([SCORES_SCHEMA, *passthrough])
    joined = extracted.select("url", "text", *keep_cols).join(
        F.broadcast(gold.select("url", "gold_text", "dataset")), "url", "inner"
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            urls = batch.column(names.index("url"))
            texts = batch.column(names.index("text")).to_pylist()
            gtexts = batch.column(names.index("gold_text")).to_pylist()
            ds_arr = batch.column(names.index("dataset"))
            scored = [
                score_texts(t or "", g or "")
                for t, g in zip(texts, gtexts, strict=True)
            ]
            k = batch.num_rows
            arrays = [
                urls,
                pa.array([extractor] * k, pa.string()),
                ds_arr,
                pa.array([s.precision for s in scored], pa.float64()),
                pa.array([s.recall for s in scored], pa.float64()),
                pa.array([s.f1 for s in scored], pa.float64()),
                pa.array([s.precision_bow for s in scored], pa.float64()),
                pa.array([s.recall_bow for s in scored], pa.float64()),
                pa.array([s.f1_bow for s in scored], pa.float64()),
                pa.array([s.matched for s in scored], pa.int64()),
                pa.array([s.matched_bow for s in scored], pa.int64()),
                pa.array([s.retrieved for s in scored], pa.int64()),
                pa.array([s.relevant for s in scored], pa.int64()),
                pa.array([s.status for s in scored], pa.string()),
            ]
            out_names = ["url", "extractor", "dataset",
                         "precision", "recall", "f1",
                         "precision_bow", "recall_bow", "f1_bow",
                         "matched", "matched_bow", "retrieved", "relevant",
                         "status"]
            for c in keep_cols:
                arrays.append(batch.column(names.index(c)))
                out_names.append(c)
            yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    return joined.mapInArrow(kernel, schema)
