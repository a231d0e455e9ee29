"""Catalog compaction (the Iceberg rewrite_data_files analogue):
compact() must preserve table contents and pre-compaction time travel,
read_diff() must not replay the rewrite, and expire_retired() must
reclaim retired chunks (the expire_snapshots trade)."""

from __future__ import annotations

import glob

import pytest

from text_extraction_evaluation_spark.sources.catalog import LocalCatalog


@pytest.fixture()
def cat4(spark, tmp_path):
    """A catalog with 4 committed single-value chunks (values 0..3)."""
    cat = LocalCatalog(tmp_path)
    for i in range(4):
        cat.commit_append(
            spark.range(i * 10, i * 10 + 5).toDF("v"), "t", f"c{i}"
        )
    return cat


def _vals(df):
    return sorted(r["v"] for r in df.collect())


ALL_VALS = sorted(v for i in range(4) for v in range(i * 10, i * 10 + 5))


def test_compact_preserves_contents_and_reduces_files(spark, cat4):
    before_files = glob.glob(f"{cat4.root}/t/chunk=*/*.parquet")
    assert cat4.compact(spark, "t", "compacted-1")
    assert _vals(cat4.read(spark, "t")) == ALL_VALS
    live = [
        c
        for c in cat4.committed_chunks("t").values()
        if "retired_seq" not in c
    ]
    assert len(live) == 1 and live[0]["compacted_from"] == [
        "c0", "c1", "c2", "c3",
    ]
    after_files = glob.glob(f"{cat4.root}/t/chunk=compacted-1/*.parquet")
    assert len(after_files) == 1 < len(before_files)


def test_compact_preserves_time_travel_until_expiry(spark, cat4):
    pre = {k: _vals(cat4.read(spark, "t", as_of=k)) for k in (1, 2, 3, 4)}
    assert cat4.compact(spark, "t", "compacted-1")
    # pre-compaction versions still read the ORIGINAL chunk files
    for k, want in pre.items():
        assert _vals(cat4.read(spark, "t", as_of=k)) == want
    # the compaction version and the present read the compacted chunk
    assert _vals(cat4.read(spark, "t", as_of=5)) == ALL_VALS
    assert _vals(cat4.read(spark, "t")) == ALL_VALS
    # expiry reclaims the retired dirs; old versions are gone (None:
    # nothing visible at as_of<=4 anymore), the present is unchanged
    removed = cat4.expire_retired("t")
    assert len(removed) == 4
    assert cat4.read(spark, "t", as_of=4) is None
    assert _vals(cat4.read(spark, "t")) == ALL_VALS
    assert glob.glob(f"{cat4.root}/t/chunk=c[0-9]*") == []


def test_read_diff_skips_the_rewrite(spark, cat4):
    assert cat4.compact(spark, "t", "compacted-1")
    # historical windows replay the original appends (until expiry)
    assert _vals(cat4.read_diff(spark, "t", 0, 2)) == sorted(
        v for i in (0, 1) for v in range(i * 10, i * 10 + 5)
    )
    # the compaction event added no rows -> empty window
    assert cat4.read_diff(spark, "t", 4, 5) is None
    # appends after the compaction flow through the feed normally
    cat4.commit_append(spark.range(100, 103).toDF("v"), "t", "c4")
    assert _vals(cat4.read_diff(spark, "t", 5, 6)) == [100, 101, 102]


def test_compact_targets_fixed_set_only(spark, cat4):
    """A chunk committed while the rewrite runs must stay live — the
    rewrite swaps exactly the chunk set it read."""
    assert cat4.compact(spark, "t", "compacted-1", chunk_ids=["c0", "c1"])
    live = {
        cid
        for cid, c in cat4.committed_chunks("t").items()
        if "retired_seq" not in c
    }
    assert live == {"c2", "c3", "compacted-1"}
    assert _vals(cat4.read(spark, "t")) == ALL_VALS


def test_compact_noop_cases(spark, cat4):
    # duplicate output id
    assert not cat4.compact(spark, "t", "c0")
    # fewer than 2 targets
    assert not cat4.compact(spark, "t", "x", chunk_ids=["c0"])
    # already-retired targets abort (stale rewrite)
    assert cat4.compact(spark, "t", "compacted-1", chunk_ids=["c0", "c1"])
    assert not cat4.compact(spark, "t", "again", chunk_ids=["c0", "c1"])
    assert _vals(cat4.read(spark, "t")) == ALL_VALS
