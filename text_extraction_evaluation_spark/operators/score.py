"""M1/M2 + J1 — scoring operators (SURVEY.md §2.4, §2.9, Appendix B).

J1: extracted ⋈ gold on url — gold is orders of magnitude smaller than
the page corpus (an annotated eval set), so it is broadcast: zero
shuffle of the extracted side.

M1 (LCS) / M2 (bag-of-words): per-document token alignment inside one
``mapInPandas`` Arrow kernel, emitting both metric families side by
side plus raw token counters so dataset-level micro aggregates can be
recomputed relationally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
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

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, text, gtext, ds in zip(
                pdf["url"], pdf["text"], pdf["gold_text"], pdf["dataset"], strict=True
            ):
                s = score_texts(text or "", gtext or "")
                rows.append(
                    (url, extractor, ds,
                     s.precision, s.recall, s.f1,
                     s.precision_bow, s.recall_bow, s.f1_bow,
                     s.matched, s.matched_bow, s.retrieved, s.relevant,
                     s.status)
                )
            out = pd.DataFrame(
                rows,
                columns=["url", "extractor", "dataset",
                         "precision", "recall", "f1",
                         "precision_bow", "recall_bow", "f1_bow",
                         "matched", "matched_bow", "retrieved", "relevant",
                         "status"],
            )
            for c in keep_cols:
                out[c] = pdf[c].reset_index(drop=True)
            yield out

    return joined.mapInPandas(kernel, schema)
