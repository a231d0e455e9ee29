"""JSONL shard export: round-trip fidelity, manifest math, one file
per shard, and byte-level determinism across re-exports."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from tests.conftest import SF0001

N_SHARDS = 4


def _docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "lang", "source", "text"
    )


def _shard_files(out):
    return sorted(glob.glob(os.path.join(out, "shard=*", "part-*.json")))


def test_export_roundtrip_manifest_and_determinism(spark, tmp_path_factory):
    from text_extraction_evaluation_spark.sources.export import (
        export_jsonl_shards,
        read_jsonl_shards,
    )

    docs = _docs(spark)
    out1 = str(tmp_path_factory.mktemp("exp") / "v1")
    out2 = str(tmp_path_factory.mktemp("exp") / "v2")
    mani = export_jsonl_shards(docs, out1, n_shards=N_SHARDS)
    export_jsonl_shards(docs, out2, n_shards=N_SHARDS)

    # exactly one data file per shard dir
    files1 = _shard_files(out1)
    assert len(files1) == N_SHARDS
    assert len({os.path.dirname(f) for f in files1}) == N_SHARDS

    # round-trip: same (doc_id, text) set
    back = read_jsonl_shards(spark, out1)
    want = {(r["doc_id"], r["text"]) for r in docs.collect()}
    got = {(r["doc_id"], r["text"]) for r in back.collect()}
    assert got == want

    # manifest totals + written copy
    assert mani["total_docs"] == len(want)
    disk = json.load(open(os.path.join(out1, "manifest.json")))
    assert disk == json.loads(json.dumps(mani))  # int64 -> int normalized
    assert disk["total_tokens"] > 0

    # per-shard fingerprint is re-derivable from the shard files alone
    from text_extraction_evaluation_spark.functions.text import md5_int

    re_fp = {
        r["shard"]: (r["fp"], r["n"])
        for r in back.withColumn(
            "shard", F.input_file_name()
        )
        .withColumn(
            "shard",
            F.regexp_extract("shard", r"shard=(\d+)", 1).cast("int"),
        )
        .withColumn("fp", md5_int(F.col("text")))
        .groupBy("shard")
        .agg(
            F.expr("bit_xor(fp)").alias("fp"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for s in disk["shards"]:
        assert re_fp[s["shard"]] == (s["content_fingerprint"], s["n_docs"])

    # byte determinism: both exports produce identical shard bytes
    for f1, f2 in zip(files1, _shard_files(out2), strict=True):
        assert os.path.basename(os.path.dirname(f1)) == os.path.basename(
            os.path.dirname(f2)
        )
        assert open(f1, "rb").read() == open(f2, "rb").read()


def test_export_refuses_overwrite_unless_asked(spark, tmp_path_factory):
    from text_extraction_evaluation_spark.sources.export import (
        export_jsonl_shards,
    )

    docs = _docs(spark).limit(50)
    out = str(tmp_path_factory.mktemp("exp") / "once")
    export_jsonl_shards(docs, out, n_shards=2)
    try:
        export_jsonl_shards(docs, out, n_shards=2)
        raised = False
    except Exception:
        raised = True
    assert raised
    # explicit overwrite succeeds and stays consistent
    mani = export_jsonl_shards(docs, out, n_shards=2, overwrite=True)
    assert mani["total_docs"] == 50
