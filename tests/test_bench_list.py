"""bench.py's headline list must stay a subset of the oracle-checked
registry — a benched-but-unregistered name would crash the per-round
bench, and a typo would silently bench nothing."""

from __future__ import annotations


def test_bench_queries_are_registered():
    import bench
    from text_extraction_evaluation_spark.plans.queries import SQL_CHECKED

    missing = [q for q in bench.BENCH_QUERIES if q not in SQL_CHECKED]
    assert not missing, missing
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)
