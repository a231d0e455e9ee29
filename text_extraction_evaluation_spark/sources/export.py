"""Sharded JSONL export sink — the delivery format LM training stacks
ingest: one JSON object per line, ``n_shards`` hash-balanced shard
directories with exactly one file each, plus a ``manifest.json``
recording per-shard row counts, whitespace-token counts, and an
order-independent content fingerprint (sum of per-doc md5 bigints).

Determinism contract (tested in tests/test_export_jsonl.py): the same
input exports byte-identical shard files every run — shard assignment
is a pure hash of doc_id, each shard is produced by exactly one task
(repartition on the shard key), rows are sorted by doc_id inside the
task, and JSON field order follows the fixed column order. That makes
the export safe to regenerate and diff, and the manifest fingerprints
let a consumer verify a transfer without re-reading the corpus.

Scale shape: one hash exchange on the shard key, everything else
map-side; the manifest aggregate is n_shards rows (a sink-side
collect on par with plans/report_sinks.py — the only other collect in
the codebase)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_int, tokens_col

EXPORT_COLS = ["doc_id", "lang", "source", "text"]


def _with_shard(docs: DataFrame, n_shards: int) -> DataFrame:
    shard = F.pmod(md5_int(F.col("doc_id").cast("string")), F.lit(n_shards))
    return docs.select(*EXPORT_COLS).withColumn(
        "shard", shard.cast("int")
    )


def shard_manifest(docs: DataFrame, n_shards: int = 8) -> DataFrame:
    """(shard, n_docs, n_tokens, content_fingerprint) — computed
    distributed; the fingerprint is an order-independent BIT_XOR of
    per-document md5 bigints (commutative AND overflow-free, unlike a
    sum under ANSI arithmetic), so any reader can re-derive it from
    the shard files alone and compare."""
    return (
        _with_shard(docs, n_shards)
        .withColumn("fp", md5_int(F.col("text")))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens_col("text"))).cast("bigint").alias("n_tokens"),
            F.expr("bit_xor(fp)").alias("content_fingerprint"),
        )
        .orderBy("shard")
    )


def export_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    overwrite: bool = False,
) -> dict:
    """Write ``docs`` as ``out_dir/shard=K/part-*.json`` (one file per
    shard) plus ``out_dir/manifest.json``; returns the manifest dict.

    One file per shard because the frame is repartitioned ON the shard
    key before partitionBy — every shard value lives in exactly one
    task. Rows sort by doc_id within the task, so file bytes are a
    pure function of the input set."""
    with_shard = _with_shard(docs, n_shards)
    (
        with_shard.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
        .write.mode("overwrite" if overwrite else "errorifexists")
        .partitionBy("shard")
        .json(out_dir)
    )
    shards = [r.asDict() for r in shard_manifest(docs, n_shards).collect()]
    manifest = {
        "format": "jsonl",
        "columns": [c for c in EXPORT_COLS],
        "n_shards": n_shards,
        "shards": shards,
        "total_docs": sum(s["n_docs"] for s in shards),
        "total_tokens": sum(s["n_tokens"] for s in shards),
    }
    tmp = os.path.join(out_dir, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def read_jsonl_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Round-trip reader: shard partition dirs + fixed schema (never
    inferred — deterministic IO, same rule as the parquet readers)."""
    return spark.read.schema(
        "doc_id long, lang string, source string, text string"
    ).json(os.path.join(out_dir, "shard=*"))
