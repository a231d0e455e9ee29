"""Synthesis determinism + fixture-contract tests (FIXTURES.md §1-2)."""

import pandas as pd

from text_extraction_evaluation_spark.sources.synth import (
    synth_gold_pdf,
    synth_pages_pdf,
)


def test_deterministic(docs_pdf):
    a = synth_pages_pdf(docs_pdf)
    b = synth_pages_pdf(docs_pdf)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["url", "warc_ts", "html", "text", "lang"]


def test_second_crawl_rows(docs_pdf):
    pages = synth_pages_pdf(docs_pdf)
    dup_ids = [int(d) for d in docs_pdf["doc_id"] if d % 20 == 7]
    counts = pages.groupby("url").size()
    assert (counts > 1).sum() == len(dup_ids)
    # the later crawl is strictly newer
    for url, grp in pages.groupby("url"):
        if len(grp) == 2:
            ts = sorted(grp["warc_ts"])
            assert ts[1] > ts[0]


def test_hot_host_for_src0(docs_pdf):
    pages = synth_pages_pdf(docs_pdf)
    gold = synth_gold_pdf(docs_pdf)
    src0_ids = set(int(d) for d, s in zip(docs_pdf.doc_id, docs_pdf.source) if s == "src0")
    hot = pages[pages.url.str.contains("skew.example")]
    got_ids = set(int(u.rsplit("/", 1)[1]) for u in hot.url)
    assert got_ids == src0_ids
    assert len(gold) == len(docs_pdf)


def test_gold_text_is_document_text(docs_pdf):
    gold = synth_gold_pdf(docs_pdf)
    assert list(gold["gold_text"]) == list(docs_pdf["text"])
    assert set(gold["dataset"]) == {"cleaneval", "googlenews"}


def test_html_is_bytes_and_contains_boilerplate(docs_pdf):
    pages = synth_pages_pdf(docs_pdf)
    assert all(isinstance(h, (bytes, bytearray)) for h in pages["html"].head(50))
    sample = pages["html"].iloc[3]
    assert b"nav" in sample and b"footer" in sample


def test_latin1_variant_decodable(docs_pdf):
    pages = synth_pages_pdf(docs_pdf)
    v12 = pages[pages.url.str.rsplit("/", n=1).str[-1].astype(int) % 16 == 12]
    raw = v12["html"].iloc[0]
    assert b"iso-8859-1" in raw
    raw.decode("latin-1")  # must not raise
