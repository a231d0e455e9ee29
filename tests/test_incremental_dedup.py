"""Incremental MinHash-index maintenance contract: feeding the corpus
chunk by chunk through append_minhash_chunk must discover EXACTLY the
candidate-pair set the one-shot batch candidate_pairs finds — no pair
missed across chunk boundaries, no old-vs-old pair re-derived — and a
re-run of a committed chunk must be a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def _pair_set(df):
    return {(r["doc_id_a"], r["doc_id_b"]) for r in df.collect()}


def test_incremental_pairs_equal_batch_pairs(spark, tmp_path_factory):
    from text_extraction_evaluation_spark.operators.dedup import (
        candidate_pairs,
        minhash_band_rows,
    )
    from text_extraction_evaluation_spark.operators.index import (
        MINHASH_INDEX_TABLE,
        append_minhash_chunk,
    )
    from text_extraction_evaluation_spark.sources.catalog import LocalCatalog

    cat_root = str(tmp_path_factory.mktemp("inc_dedup"))
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").select("doc_id", "text")

    # three crawl increments by doc_id range (ids are globally unique,
    # the contract the index relies on)
    bounds = [(0, 150), (150, 320), (320, 10**9)]
    chunks = [
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in bounds
    ]
    assert all(c.count() > 0 for c in chunks)

    got: set[tuple[int, int]] = set()
    for i, chunk in enumerate(chunks):
        pairs = append_minhash_chunk(spark, chunk, cat_root, chunk_id=f"crawl{i}")
        assert pairs is not None
        new_pairs = _pair_set(pairs)
        # incremental increments never re-derive already-known pairs
        # involving only older chunks
        assert all(
            max(a, b) >= bounds[i][0] for a, b in new_pairs
        ), "emitted a pair with no member in the new chunk"
        got |= new_pairs

    want = _pair_set(candidate_pairs(minhash_band_rows(docs)))
    assert got == want

    # idempotent re-run: chunk already committed -> None, index unchanged
    n_rows = LocalCatalog(cat_root).read(spark, MINHASH_INDEX_TABLE).count()
    assert append_minhash_chunk(spark, chunks[1], cat_root, "crawl1") is None
    assert LocalCatalog(cat_root).read(spark, MINHASH_INDEX_TABLE).count() == n_rows


def test_incremental_hot_bucket_is_star_reduced(spark, tmp_path_factory):
    """A degenerate index bucket (here: > max_bucket_size identical
    docs) must contribute O(|new|) hub pairs to an increment, not
    |new| x |bucket| — and connectivity to the hub must survive."""
    from text_extraction_evaluation_spark.operators.index import (
        append_minhash_chunk,
    )

    cat_root = str(tmp_path_factory.mktemp("inc_hot"))
    boiler = "the same boilerplate navigation footer text appears on every page"
    old = spark.createDataFrame(
        [(i, boiler) for i in range(40)], "doc_id long, text string"
    )
    first = append_minhash_chunk(spark, old, cat_root, "seed", max_bucket_size=10)
    assert first is not None
    new = spark.createDataFrame(
        [(100 + i, boiler) for i in range(3)], "doc_id long, text string"
    )
    pairs = append_minhash_chunk(spark, new, cat_root, "inc", max_bucket_size=10)
    got = _pair_set(pairs)
    # cross pairs: each new doc pairs ONLY with the old hub (min id 0),
    # plus the within-new pairs of the 3 new docs (their own bucket is
    # under the cap)
    cross = {p for p in got if min(p) < 100}
    assert cross == {(0, 100), (0, 101), (0, 102)}
    within = {p for p in got if min(p) >= 100}
    assert within == {(100, 101), (100, 102), (101, 102)}
