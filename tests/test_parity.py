"""THE correctness gate (BASELINE.json:6,14,15): the distributed Spark
pipeline must reproduce the pinned single-process oracle doc-by-doc —
byte-identical extracted text per url, exact span classes, exact P/R/F1.

Because the Arrow kernels and the oracle share one algorithm module,
this test exercises everything the distribution adds: binary columns
through Arrow, partitioning/salting, the latest-crawl window, the
broadcast scoring join, and aggregation.
"""

from __future__ import annotations

import math

import pytest

from oracle.run_oracle import (
    oracle_extract,
    oracle_gold,
    oracle_latest_crawl,
    oracle_pages,
    oracle_report,
    oracle_scores,
    oracle_spans,
)
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def oracle_out(docs_pdf):
    pages = oracle_pages(docs_pdf)
    gold = oracle_gold(docs_pdf)
    latest = oracle_latest_crawl(pages)
    extracted = oracle_extract(latest)
    return {
        "pages": pages,
        "gold": gold,
        "latest": latest,
        "extracted": extracted,
        "spans": oracle_spans(latest),
        "scores": oracle_scores(extracted, gold),
    }


@pytest.fixture(scope="module")
def spark_out(spark):
    from text_extraction_evaluation_spark.operators.extract import (
        extract_pages,
        extract_spans,
        extracted_clean,
        latest_crawl,
        salted_repartition,
    )
    from text_extraction_evaluation_spark.operators.score import score_extracted
    from text_extraction_evaluation_spark.sources.readers import gold_df, pages_df

    pages = pages_df(spark, SF0001, n_partitions=8)
    latest = latest_crawl(pages)
    latest = salted_repartition(latest, 8)
    extracted = extracted_clean(extract_pages(latest)).cache()
    gold = gold_df(spark, SF0001)
    scores = score_extracted(extracted, gold)
    spans = extract_spans(latest)
    return {
        "extracted": extracted.toPandas(),
        "scores": scores.toPandas(),
        "spans": spans.toPandas(),
    }


def test_extracted_text_byte_identical(oracle_out, spark_out):
    o = oracle_out["extracted"].sort_values("url").reset_index(drop=True)
    s = spark_out["extracted"].sort_values("url").reset_index(drop=True)
    assert list(o["url"]) == list(s["url"])
    mism = [
        (u, ot, st)
        for u, ot, st in zip(o["url"], o["text"], s["text"], strict=True)
        if ot.encode("utf-8") != st.encode("utf-8")
    ]
    assert not mism, f"{len(mism)} urls differ; first: {mism[0][0]!r}"
    assert list(o["status"]) == list(s["status"])
    assert list(o["n_paragraphs"]) == list(s["n_paragraphs"])
    assert list(o["n_good"]) == list(s["n_good"])


def test_no_url_extracted_twice(spark_out):
    s = spark_out["extracted"]
    assert s["url"].is_unique


def test_spans_parity(oracle_out, spark_out):
    key = ["url", "idx"]
    o = oracle_out["spans"].sort_values(key).reset_index(drop=True)
    s = spark_out["spans"].sort_values(key).reset_index(drop=True)
    assert len(o) == len(s)
    for col in ["url", "idx", "text", "class_cf", "class_final", "word_count", "heading"]:
        assert list(o[col]) == list(s[col]), f"span column {col} differs"
    for col in ["link_density", "stopword_density"]:
        assert all(
            math.isclose(a, b, rel_tol=0, abs_tol=0)
            for a, b in zip(o[col], s[col], strict=True)
        ), f"span column {col} differs"


def test_scores_exact_parity(oracle_out, spark_out):
    key = ["url", "extractor"]
    o = oracle_out["scores"].sort_values(key).reset_index(drop=True)
    s = spark_out["scores"].sort_values(key).reset_index(drop=True)
    assert len(o) == len(s)
    for col in ["url", "dataset", "matched", "matched_bow", "retrieved", "relevant", "status"]:
        assert list(o[col]) == list(s[col]), f"score column {col} differs"
    for col in ["precision", "recall", "f1", "precision_bow", "recall_bow", "f1_bow"]:
        # same float arithmetic on both sides -> bitwise equal
        assert list(o[col]) == list(s[col]), f"score column {col} differs"


def test_report_macro_f1_matches_oracle(spark, oracle_out, spark_out):
    from text_extraction_evaluation_spark.operators.report import report

    sdf = spark.createDataFrame(spark_out["scores"])
    rep = {
        (r["extractor"], r["dataset"]): r
        for r in report(sdf).collect()
    }
    orep = oracle_report(oracle_out["scores"])
    assert len(rep) == len(orep)
    for _, row in orep.iterrows():
        got = rep[(row["extractor"], row["dataset"])]
        assert got["n_ok"] == row["n_ok"]
        assert got["n_empty"] == row["n_empty"]
        assert math.isclose(got["avg_f1"], row["avg_f1"], rel_tol=1e-12)
        assert math.isclose(got["std_f1"], row["std_f1"], rel_tol=1e-9)


def test_density_extractor_parity(spark, oracle_out):
    """Second extractor (densometric rules): Spark kernel output is
    byte-identical to the pandas oracle twin, same gate as jusText."""
    from oracle.run_oracle import oracle_extract_density
    from text_extraction_evaluation_spark.operators.extract import (
        extract_pages_density,
        extracted_clean,
        latest_crawl,
    )
    from text_extraction_evaluation_spark.sources.readers import pages_df

    pages = pages_df(spark, SF0001, n_partitions=8)
    got = (
        extracted_clean(extract_pages_density(latest_crawl(pages)))
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        oracle_extract_density(oracle_out["latest"])
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(got["url"]) == list(want["url"])
    mism = [
        u
        for u, a, b in zip(got["url"], got["text"], want["text"], strict=True)
        if a.encode() != b.encode()
    ]
    assert not mism, f"{len(mism)} urls differ; first: {mism[0]!r}"
    for col in ("status", "n_paragraphs", "n_good"):
        assert list(got[col]) == list(want[col]), col
    # the two extractors genuinely differ (different operating points)
    jus = oracle_out["extracted"].sort_values("url").reset_index(drop=True)
    assert any(a != b for a, b in zip(want["text"], jus["text"], strict=True))


def test_extractor_sign_test_internal_consistency(spark):
    """Sign-test rows must be self-consistent (paired = wins + losses +
    ties) and agree in direction with the per-dataset extractor
    ranking: the rank-1 extractor by macro-F1 should hold the positive
    side of the z statistic on this fixture."""
    import math

    from text_extraction_evaluation_spark.plans.queries import (
        extractor_sign_test,
    )

    rows = {r["dataset"]: r for r in extractor_sign_test(spark, SF0001).collect()}
    assert set(rows) == {"cleaneval", "googlenews"}
    for r in rows.values():
        assert r["n_paired"] == (
            r["n_justext_wins"] + r["n_density_wins"] + r["n_ties"]
        )
        nd = r["n_justext_wins"] + r["n_density_wins"]
        want_z = round(
            (r["n_justext_wins"] - r["n_density_wins"]) / math.sqrt(nd) * 1e6
        ) if nd else 0
        assert r["sign_z_q6"] == want_z
        # justext ranks 1 on both datasets (see _EXTRACTOR_RANKING_CONST)
        assert r["sign_z_q6"] > 0
