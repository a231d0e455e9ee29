"""mapInArrow byte-stats kernel: must equal the JVM column-expression
twin row for row (the Arrow fast path can never drift from relational
semantics), and the hex window must match Python's own slicing."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001
from text_extraction_evaluation_spark.operators.arrowops import page_byte_stats


def test_arrow_kernel_equals_jvm_twin(spark):
    from text_extraction_evaluation_spark.sources.readers import pages_df

    pages = pages_df(spark, SF0001, n_partitions=4)
    got = sorted(tuple(r) for r in page_byte_stats(pages).collect())
    # JVM twin: length/regexp_count on a latin-1 decode (bijective
    # bytes<->chars, so byte counts == char counts), hex(substring)
    s = F.decode("html", "ISO-8859-1")
    twin = pages.select(
        "url",
        F.length("html").cast("long").alias("n_bytes"),
        F.regexp_count(s, F.lit("<")).cast("long").alias("n_lt"),
        F.regexp_count(s, F.lit(">")).cast("long").alias("n_gt"),
        F.lower(F.hex(F.substring("html", 1, 16))).alias("head16"),
    )
    want = sorted(tuple(r) for r in twin.collect())
    assert got == want


def test_head16_matches_python_bytes(spark):
    from text_extraction_evaluation_spark.sources.readers import pages_df

    pages = pages_df(spark, SF0001, n_partitions=2).limit(20)
    rows = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    got = {
        r["url"]: r["head16"]
        for r in page_byte_stats(pages).collect()
    }
    for url, raw in rows.items():
        assert got[url] == raw[:16].hex()
