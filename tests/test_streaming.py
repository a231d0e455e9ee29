"""Streaming façade test: availableNow file-stream extraction produces
byte-identical output to the batch kernel, exactly once, resumable via
checkpoint."""

from __future__ import annotations

from tests.conftest import SF0001


def test_stream_extraction_matches_batch(spark, tmp_path_factory):
    from text_extraction_evaluation_spark.operators.extract import (
        extract_pages,
        extracted_clean,
    )
    from text_extraction_evaluation_spark.sources.readers import pages_df
    from text_extraction_evaluation_spark.streaming.stream import (
        read_pages_stream,
        start_extraction_stream,
    )

    base = tmp_path_factory.mktemp("stream")
    pages_dir = str(base / "pages")
    out_dir = str(base / "extracted")
    ckpt = str(base / "ckpt")

    pages = pages_df(spark, SF0001, n_partitions=6)
    pages.write.parquet(pages_dir)

    q = start_extraction_stream(read_pages_stream(spark, pages_dir), out_dir, ckpt)
    q.awaitTermination(300)

    got = {
        (r["url"], r["warc_ts"]): r["text"]
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["url"], r["warc_ts"]): r["text"]
        for r in extracted_clean(extract_pages(spark.read.parquet(pages_dir))).collect()
    }
    assert got == want

    # restart with same checkpoint: no new data -> no duplicates
    q2 = start_extraction_stream(read_pages_stream(spark, pages_dir), out_dir, ckpt)
    q2.awaitTermination(300)
    n_after = spark.read.parquet(out_dir).count()
    assert n_after == len(want)
