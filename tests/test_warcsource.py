"""WARC-style custom Python DataSource: round-trip fidelity, partition
planning (one task per shard), header-level filter pushdown, atomic
manifest commit, overwrite guard, and pipeline-through-source parity
(extraction over the archive equals extraction over the in-memory
pages — the source cannot perturb bytes)."""

from __future__ import annotations

import json
import os

import pytest

from tests.conftest import SF0001
from text_extraction_evaluation_spark.sources.warcsource import (
    MANIFEST,
    WarcReader,
    register,
)


@pytest.fixture(scope="module")
def warc_dir(spark, tmp_path_factory):
    from text_extraction_evaluation_spark.sources.readers import pages_df

    register(spark)
    path = str(tmp_path_factory.mktemp("warc") / "pages")
    pages = pages_df(spark, SF0001, n_partitions=4).select(
        "url", "warc_ts", "lang", "html"
    )
    pages.write.format("warcpages").mode("append").save(path)
    return path


def _key(rows):
    return sorted((r.url, r.warc_ts, r.lang, bytes(r.html)) for r in rows)


def test_round_trip_exact(spark, warc_dir):
    from text_extraction_evaluation_spark.sources.readers import pages_df

    got = spark.read.format("warcpages").load(warc_dir).collect()
    want = pages_df(spark, SF0001, n_partitions=4).select(
        "url", "warc_ts", "lang", "html"
    ).collect()
    assert _key(got) == _key(want)


def test_one_task_per_shard_and_manifest(spark, warc_dir):
    shards = [f for f in os.listdir(warc_dir) if f.endswith(".warc")]
    with open(os.path.join(warc_dir, MANIFEST)) as f:
        manifest = json.load(f)
    assert sorted(manifest["shards"]) == sorted(shards)
    assert 1 < len(shards) <= 4  # distributed write: one shard per task
    df = spark.read.format("warcpages").load(warc_dir)
    assert df.rdd.getNumPartitions() == len(shards)
    assert manifest["n_records"] == df.count()


def test_lang_filter_pushdown(spark, warc_dir):
    df = spark.read.format("warcpages").load(warc_dir)
    pushed = df.filter(df.lang == "en")
    want = [r for r in df.collect() if r.lang == "en"]
    assert _key(pushed.collect()) == _key(want)
    # the header-level predicate must reach the byte scanner: after
    # pushdown the optimized plan holds only the residual isnotnull —
    # the lang equality itself was absorbed by the source
    plan = pushed._jdf.queryExecution().optimizedPlan().toString()
    assert "isnotnull(lang" in plan
    assert "= en" not in plan and "EqualTo" not in plan


def test_pushfilters_contract():
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    r = WarcReader({"path": "/nonexistent"})
    unsupported = list(
        r.pushFilters(
            [
                EqualTo(("lang",), "en"),
                In(("lang",), ("fr", "es")),
                GreaterThan(("warc_ts",), 0),
            ]
        )
    )
    # only the timestamp range comes back; lang predicates are absorbed
    assert len(unsupported) == 1
    assert isinstance(unsupported[0], GreaterThan)
    assert r.want_lang == {"fr", "es"}  # last assignment wins


def test_append_merges_and_overwrite_replaces(spark, warc_dir):
    df = spark.read.format("warcpages").load(warc_dir)
    n = df.count()
    # append = incremental crawl: new shards join the committed set
    # (materialize first — reading and rewriting the same dir races)
    small = df.limit(5).collect()
    inc = spark.createDataFrame(small, df.schema).coalesce(1)
    inc.write.format("warcpages").mode("append").save(warc_dir)
    assert spark.read.format("warcpages").load(warc_dir).count() == n + 5
    with open(os.path.join(warc_dir, MANIFEST)) as f:
        assert json.load(f)["n_records"] == n + 5
    # overwrite replaces the committed set atomically
    spark.createDataFrame(small, df.schema).coalesce(1).write.format(
        "warcpages"
    ).mode("overwrite").save(warc_dir)
    assert spark.read.format("warcpages").load(warc_dir).count() == 5
    # restore for other tests (module fixture order independence)
    from text_extraction_evaluation_spark.sources.readers import pages_df

    pages_df(spark, SF0001, n_partitions=4).select(
        "url", "warc_ts", "lang", "html"
    ).write.format("warcpages").mode("overwrite").save(warc_dir)
    assert spark.read.format("warcpages").load(warc_dir).count() == n


def test_extraction_through_source_is_byte_identical(spark, warc_dir):
    """The archive is a transparent medium: running the extraction
    kernel over WARC-read pages yields byte-identical text to running
    it over the synthesized pages directly."""
    from pyspark.sql import functions as F

    from text_extraction_evaluation_spark.operators.extract import (
        extract_pages,
        extracted_clean,
        latest_crawl,
    )
    from text_extraction_evaluation_spark.sources.readers import pages_df

    src = spark.read.format("warcpages").load(warc_dir)
    via_warc = extracted_clean(extract_pages(latest_crawl(src)))
    direct = extracted_clean(
        extract_pages(latest_crawl(pages_df(spark, SF0001, n_partitions=4)))
    )
    key = lambda df: sorted(  # noqa: E731
        (r.url, r.status, r.text) for r in df.select("url", "status", "text").collect()
    )
    assert key(via_warc) == key(direct)


def test_stream_reads_each_crawl_increment_exactly_once(spark, tmp_path):
    """Streaming over the archive: the manifest is an append log, so a
    restartable stream picks up exactly the shards appended since its
    checkpointed offset — batch 1 then batch 2, no re-reads."""
    from text_extraction_evaluation_spark.sources.readers import pages_df

    register(spark)
    path = str(tmp_path / "wstream")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    pages = pages_df(spark, SF0001, n_partitions=2).select(
        "url", "warc_ts", "lang", "html"
    )
    first = pages.filter(pages.lang != "zh")
    second = pages.filter(pages.lang == "zh")
    first.write.format("warcpages").mode("append").save(path)

    def drain():
        q = (
            spark.readStream.format("warcpages")
            .load(path)
            .select("url", "warc_ts", "lang")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got1 = spark.read.parquet(out).count()
    assert got1 == first.count()
    second.write.format("warcpages").mode("append").save(path)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == pages.count()
    # exactly-once: no (url, crawl) duplicated across the two
    # increments (same url+lang legitimately recurs as a recrawl with
    # a different warc_ts)
    assert got.distinct().count() == got.count()
