"""Report sink tests: tables + SVG chart emitted from a report DF."""

from __future__ import annotations


def test_report_sinks(spark, tmp_path):
    from text_extraction_evaluation_spark.plans.report_sinks import write_all

    rows = [
        ("justext_spark", "cleaneval", 0.96, 0.94, 0.948, 0.095, 138, 112, 0),
        ("justext_spark", "googlenews", 0.97, 0.94, 0.953, 0.094, 143, 107, 0),
    ]
    rep = spark.createDataFrame(
        rows,
        "extractor string, dataset string, avg_precision double, avg_recall double, "
        "avg_f1 double, std_f1 double, n_ok long, n_empty long, n_fail long",
    )
    paths = write_all(rep, tmp_path)
    md = open(paths["markdown"]).read()
    assert "cleaneval" in md and "0.9480" in md
    tex = open(paths["latex"]).read()
    assert r"\begin{tabular}" in tex and "googlenews" in tex
    svg = open(paths["chart"]).read()
    assert svg.startswith("<svg") and "0.948" in svg and svg.count("<rect") == 2
