"""Streaming façade test: availableNow file-stream extraction produces
byte-identical output to the batch kernel, exactly once, resumable via
checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_stream_dedup_drops_recrawls(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark keeps one row per url when the
    re-crawls arrive inside the watermark horizon."""
    from text_extraction_evaluation_spark.sources.readers import pages_df
    from text_extraction_evaluation_spark.streaming.stream import (
        dedup_pages_stream,
        read_pages_stream,
    )

    base = tmp_path_factory.mktemp("sdedup")
    pages_dir = str(base / "pages")
    out_dir = str(base / "out")
    ckpt = str(base / "ckpt")

    pages = pages_df(spark, SF0001, n_partitions=4)
    n_urls = pages.select("url").distinct().count()
    n_rows = pages.count()
    assert n_rows > n_urls  # the fixture plants duplicate crawls
    pages.write.parquet(pages_dir)

    q = (
        dedup_pages_stream(read_pages_stream(spark, pages_dir, max_files_per_trigger=2))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir)
    assert out.count() == n_urls
    assert out.select("url").distinct().count() == n_urls


def test_gap_interval_parsing():
    import pytest

    from text_extraction_evaluation_spark.streaming.stream import _parse_interval_ms

    assert _parse_interval_ms("30 minutes") == 1_800_000
    assert _parse_interval_ms("1 hour") == 3_600_000
    assert _parse_interval_ms("15 minutes") == 900_000
    assert _parse_interval_ms("45 seconds") == 45_000
    assert _parse_interval_ms(90) == 90_000
    with pytest.raises(ValueError):
        _parse_interval_ms("a fortnight")
    with pytest.raises(ValueError):
        _parse_interval_ms("30m")


def test_sessionize_stream_equals_batch_twin(spark, tmp_path_factory):
    """On time-ordered input the streaming sessionizer must produce the
    SAME sessions as the batch twin q_event_sessions: same per-user
    multiset of (n_events, duration_sec)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from text_extraction_evaluation_spark.plans.queries import q_event_sessions
    from text_extraction_evaluation_spark.streaming.stream import (
        sessionize_events_stream,
    )

    base = tmp_path_factory.mktemp("sess_twin")
    events_dir = str(base / "events")
    out_dir = str(base / "out")
    ckpt = str(base / "ckpt")

    ev = (
        spark.read.parquet(f"{SF0001}/events.parquet")
        .select("user_id", "ts")
        .filter("user_id < 12")
    )
    # single ordered file -> one micro-batch: all in-batch gap splits
    # must reproduce the batch sessionization exactly
    ev.orderBy("ts").coalesce(1).write.parquet(events_dir)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(events_dir)
    )
    q = (
        sessionize_events_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir).toPandas()

    def esec(t):
        return int(pd.Timestamp(t).value // 1_000_000_000)

    got: dict[int, list] = {}
    for uid, grp in out.groupby("user_id"):
        closed = grp[grp.closed]
        # availableNow ends with a no-data batch whose advanced
        # watermark TIMES OUT the final open session (emitting it as a
        # closed row) — a live row counts only when no closed row
        # covers its span
        last_close = closed.t_last.max() if len(closed) else pd.Timestamp.min
        live = grp[(~grp.closed) & (grp.t_first > last_close)]
        spans = [
            (int(n), esec(b) - esec(a))
            for n, a, b in zip(closed.session_events, closed.t_first, closed.t_last)
        ]
        if len(live):
            final = live.sort_values("session_events").iloc[-1]
            spans.append(
                (int(final.session_events), esec(final.t_last) - esec(final.t_first))
            )
        got[uid] = sorted(spans)

    batch = (
        q_event_sessions(spark, SF0001)
        .filter(F.col("user_id") < 12)
        .toPandas()
    )
    want = {
        int(uid): sorted(
            (int(r.n_events), int(r.duration_sec)) for r in grp.itertuples()
        )
        for uid, grp in batch.groupby("user_id")
    }
    assert got == want


def test_sessionize_events_stream_stateful(spark, tmp_path_factory):
    """applyInPandasWithState gap sessionization over a chronologically
    arriving file stream: every event is accounted for in exactly one
    emitted session (closed sessions + the final live session), and
    closed sessions are disjoint in time."""
    import pandas as pd
    from pyspark.sql import functions as F

    from text_extraction_evaluation_spark.streaming.stream import (
        sessionize_events_stream,
    )

    base = tmp_path_factory.mktemp("sess")
    events_dir = str(base / "events")
    out_dir = str(base / "out")
    ckpt = str(base / "ckpt")

    ev = (
        spark.read.parquet(f"{SF0001}/events.parquet")
        .select("user_id", "ts")
        .filter("user_id < 12")
    )
    # chronological arrival: three time-range files written in order
    # (watermarked stateful ops drop rows far behind max event time —
    # the operator's documented arrival contract)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    for i in range(3):
        part = ev.filter(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span if i < 2 else hi + pd.Timedelta("1s")))
        )
        part.coalesce(1).write.mode("append").parquet(events_dir)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        sessionize_events_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir).toPandas()
    assert len(out) > 0
    want = {r["user_id"]: r["n"] for r in
            ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    for uid, grp in out.groupby("user_id"):
        closed = grp[grp.closed]
        last_close = closed.t_last.max() if len(closed) else pd.Timestamp.min
        live = grp[(~grp.closed) & (grp.t_first > last_close)]
        final_live = live.session_events.max() if len(live) else 0
        assert closed.session_events.sum() + final_live == want[uid], uid
        # closed sessions must not overlap
        spans = sorted(zip(closed.t_first, closed.t_last))
        for (a1, b1), (a2, _b2) in zip(spans, spans[1:]):
            assert b1 < a2


def test_stream_dedup_ordered_replay_matches_batch_first_crawl(
    spark, tmp_path_factory
):
    """Streaming<->batch contract for dedup_pages_stream: on an ORDERED
    replay (crawl generations arrive oldest-first, one file per
    trigger) the survivor per url is exactly the batch first-crawl row
    — same (url, warc_ts) set AND same bytes. Mirrors the sessionizer's
    batch-twin test."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from text_extraction_evaluation_spark.sources.readers import pages_df
    from text_extraction_evaluation_spark.streaming.stream import (
        dedup_pages_stream,
        read_pages_stream,
    )

    base = tmp_path_factory.mktemp("sdedup_twin")
    src = base / "pages"
    src.mkdir()
    out_dir = str(base / "out")
    ckpt = str(base / "ckpt")

    pages = pages_df(spark, SF0001, n_partitions=4).cache()
    # batch twin: first crawl per url (deterministic — fixture crawl
    # timestamps are unique per url, asserted)
    per_url = pages.groupBy("url").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("warc_ts").alias("nd")
    )
    assert per_url.filter("n <> nd").count() == 0
    w = Window.partitionBy("url").orderBy("warc_ts")
    ranked = pages.withColumn("rn", F.row_number().over(w))
    first = ranked.filter("rn = 1").drop("rn")
    rest = ranked.filter("rn > 1").drop("rn")

    # ordered replay: generation files with strictly increasing mtimes
    # (FileStreamSource admits oldest-mtime files first)
    for i, gen in enumerate([first, rest]):
        tmp = str(base / f"gen{i}")
        gen.coalesce(1).write.parquet(tmp)
        part = next(
            p for p in os.listdir(tmp) if p.endswith(".parquet") and p.startswith("part")
        )
        dst = src / f"{i:02d}.parquet"
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    q = (
        dedup_pages_stream(
            read_pages_stream(spark, str(src), max_files_per_trigger=1),
            watermark="720 hours",  # keep all url state across the replay
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["url"], r["warc_ts"]): r["text"]
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {(r["url"], r["warc_ts"]): r["text"] for r in first.collect()}
    pages.unpersist()
    assert got == want


def test_windowed_status_counts_equal_batch_aggregate(spark, tmp_path_factory):
    """The streaming windowed status aggregate must equal the batch
    groupBy(window, status) on the same finite input (complete output
    mode on a memory sink, so closed and open windows both emit)."""
    from text_extraction_evaluation_spark.operators.extract import extract_pages
    from text_extraction_evaluation_spark.sources.readers import pages_df
    from text_extraction_evaluation_spark.streaming.stream import (
        read_pages_stream,
        windowed_status_counts,
    )

    base = tmp_path_factory.mktemp("winstream")
    pages_dir = str(base / "pages")
    pages = pages_df(spark, SF0001, n_partitions=6)
    pages.write.parquet(pages_dir)

    agg = windowed_status_counts(read_pages_stream(spark, pages_dir))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_status")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window"]["start"], r["window"]["end"], r["status"]): r["n_docs"]
        for r in spark.sql("SELECT * FROM win_status").collect()
    }
    want = {
        (r["window"]["start"], r["window"]["end"], r["status"]): r["n_docs"]
        for r in (
            extract_pages(spark.read.parquet(pages_dir))
            .groupBy(F.window("warc_ts", "10 minutes"), "status")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .collect()
        )
    }
    assert got == want
    assert len({(s, e) for s, e, _ in got}) > 1  # multiple real windows


def test_stream_heavy_hitters_space_saving_guarantees(spark, tmp_path_factory):
    """Space-saving sketch over a multi-batch term stream: (a) state
    stays within groups*capacity counters, (b) est >= true >= est-err
    for every surviving counter, (c) every guaranteed heavy hitter
    (true count > N_group/capacity) survives to the final table."""
    from text_extraction_evaluation_spark.streaming.stream import (
        heavy_hitters_stream,
    )

    base = tmp_path_factory.mktemp("hhstream")
    terms_dir = str(base / "terms")
    ckpt = str(base / "ckpt")

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    terms = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    # several files so availableNow runs multiple micro-batches
    terms.repartition(6).write.parquet(terms_dir)

    capacity, groups = 16, 8
    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 2)
        .parquet(terms_dir)
    )
    q = (
        heavy_hitters_stream(stream, capacity=capacity, groups=groups)
        .writeStream.format("memory")
        .queryName("hh_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.sql("SELECT * FROM hh_stream").collect()
    assert rows
    n_batches = max(r["seq"] for r in rows)
    assert n_batches >= 2  # the state actually folded across batches

    # final table per group = its max-seq emission
    last_seq = {}
    for r in rows:
        last_seq[r["grp"]] = max(last_seq.get(r["grp"], 0), r["seq"])
    final = [(r["grp"], r["term"], r["est"], r["err"])
             for r in rows if r["seq"] == last_seq[r["grp"]]]
    per_group = {}
    for g, t, est, err in final:
        per_group.setdefault(g, {})[t] = (est, err)
    assert all(len(c) <= capacity for c in per_group.values())

    truth = {
        r["term"]: r["n"]
        for r in terms.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    grp_of = {
        r["term"]: r["g"]
        for r in terms.select(
            "term", F.pmod(F.xxhash64("term"), F.lit(groups)).cast("int").alias("g")
        ).distinct().collect()
    }
    group_n = {}
    for t, n in truth.items():
        group_n[grp_of[t]] = group_n.get(grp_of[t], 0) + n

    for g, counters in per_group.items():
        for t, (est, err) in counters.items():
            assert est >= truth[t] >= est - err, (g, t, est, err, truth[t])
    missed_guaranteed = [
        t for t, n in truth.items()
        if n > group_n[grp_of[t]] / capacity
        and t not in per_group.get(grp_of[t], {})
    ]
    assert not missed_guaranteed


def test_stream_heavy_hitters_state_survives_restart(spark, tmp_path_factory):
    """Space-saving state restores from the checkpoint: a second run
    over NEW files continues the counters (est for a term present in
    both phases exceeds either phase's count alone)."""
    from text_extraction_evaluation_spark.streaming.stream import (
        heavy_hitters_stream,
    )

    base = tmp_path_factory.mktemp("hhrestart")
    terms_dir = str(base / "terms")
    ckpt = str(base / "ckpt")

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    terms = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    half = terms.limit(2000).cache()
    half.coalesce(1).write.mode("append").parquet(terms_dir)

    out_dir = str(base / "out")

    def run_once():
        stream = (
            spark.readStream.schema("term string")
            .option("maxFilesPerTrigger", 4)
            .parquet(terms_dir)
        )
        q = (
            heavy_hitters_stream(stream, capacity=16, groups=4)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.read.parquet(out_dir).collect()
        last = {}
        for r in rows:
            last[r["grp"]] = max(last.get(r["grp"], 0), r["seq"])
        return {
            (r["grp"], r["term"]): r["est"]
            for r in rows
            if r["seq"] == last[r["grp"]]
        }

    first = run_once()
    # phase 2: the same rows again as new files -> counts must double
    # for terms that survive both phases (state restored, not reset)
    half.coalesce(1).write.mode("append").parquet(terms_dir)
    second = run_once()

    true_half = {
        r["term"]: r["n"]
        for r in half.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    grew = 0
    for (g, t), est2 in second.items():
        if (g, t) in first and t in true_half:
            assert est2 >= first[(g, t)], (g, t)
            if est2 > true_half[t]:  # exceeds any single phase's max
                grew += 1
    assert grew > 0


def test_stream_stream_interval_join_equals_batch_twin(spark, tmp_path_factory):
    """attribute_purchases_stream (stream-stream interval join) must
    produce exactly the batch join's (click, purchase) pair set on an
    ordered replay with a watermark wide enough to keep all state —
    and the physical plan must be a StreamingSymmetricHashJoin (the
    bounded-state join, not a nested loop)."""
    import os

    from text_extraction_evaluation_spark.streaming.stream import (
        attribute_purchases_stream,
    )

    base = tmp_path_factory.mktemp("ssjoin")
    src = base / "events"
    src.mkdir()
    out_dir = str(base / "out")
    ckpt = str(base / "ckpt")

    events = spark.read.parquet(f"{SF0001}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    # batch twin: identical condition on static frames
    clicks = events.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = events.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    want_rows = (
        clicks.join(
            purchases,
            F.expr(
                "user_id = p_user AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 86400 SECONDS"
            ),
        )
        .select("purchase_id", "click_id", "purchase_value")
        .collect()
    )
    want = {(r["purchase_id"], r["click_id"]): r["purchase_value"] for r in want_rows}
    assert len(want) > 10  # fixture must make the test non-trivial

    # ordered replay: three generation files in event-time order
    ranked = events.orderBy("ts").withColumn(
        "gen", F.ntile(3).over(__import__("pyspark").sql.window.Window.orderBy("ts"))
    )
    for i in range(1, 4):
        tmp = str(base / f"gen{i}")
        ranked.filter(F.col("gen") == i).drop("gen").coalesce(1).write.parquet(tmp)
        part = next(
            p for p in os.listdir(tmp) if p.endswith(".parquet") and p.startswith("part")
        )
        dst = src / f"{i:02d}.parquet"
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    joined = attribute_purchases_stream(
        stream, attribution_window="24 hours", watermark="720 hours"
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    ops = [s["operatorName"] for s in (q.lastProgress or {}).get("stateOperators", [])]
    assert "symmetricHashJoin" in ops, ops
    got = {
        (r["purchase_id"], r["click_id"]): r["purchase_value"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == want


def test_scd2_stream_equals_batch_twin(spark, tmp_path_factory):
    """Streaming<->batch contract for scd2_pages_stream: on an ordered
    replay with the crawl generations in SEPARATE micro-batches (state
    must cross the batch boundary), closed rows + the latest progress
    row per url reconstruct exactly the batch build_scd2 interval
    table."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from text_extraction_evaluation_spark.operators.temporal import build_scd2
    from text_extraction_evaluation_spark.sources.readers import pages_df
    from text_extraction_evaluation_spark.streaming.stream import (
        read_pages_stream,
        scd2_pages_stream,
    )

    base = tmp_path_factory.mktemp("scd2_twin")
    src = base / "pages"
    src.mkdir()
    out_dir = str(base / "out")
    ckpt = str(base / "ckpt")

    pages = pages_df(spark, SF0001, n_partitions=4).cache()
    w = Window.partitionBy("url").orderBy("warc_ts")
    ranked = pages.withColumn("rn", F.row_number().over(w))
    for i, gen in enumerate(
        [ranked.filter("rn = 1").drop("rn"), ranked.filter("rn > 1").drop("rn")]
    ):
        tmp = str(base / f"gen{i}")
        gen.coalesce(1).write.parquet(tmp)
        part = next(
            p
            for p in os.listdir(tmp)
            if p.endswith(".parquet") and p.startswith("part")
        )
        dst = src / f"{i:02d}.parquet"
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    q = (
        scd2_pages_stream(read_pages_stream(spark, str(src), max_files_per_trigger=1))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir).toPandas()
    got = set()
    for url, grp in out.groupby("url"):
        for r in grp[grp.closed].itertuples():
            got.add((r.host, url, int(r.version_no), r.raw_h,
                     int(r.ep_from), int(r.ep_to)))
        live = grp[~grp.closed]
        final = live.sort_values("version_no").iloc[-1]
        got.add((final.host, url, int(final.version_no), final.raw_h,
                 int(final.ep_from), None))

    host = F.regexp_extract("url", r"^http://([^/]+)/", 1)
    crawls = pages.select(
        host.alias("host"), "url", "warc_ts", F.md5("html").alias("raw_h")
    )
    want = {
        (r.host, r.url, r.version_no, r.raw_h, r.ep_from,
         None if r.ep_to is None else int(r.ep_to))
        for r in build_scd2(crawls).collect()
    }
    pages.unpersist()
    assert got == want
    # genuinely multi-version: the fixtures recrawl ~5% of urls with
    # changed bytes, so closed intervals must exist
    assert any(t[5] is not None for t in got)


def test_stream_score_windowed_micro_f1_equals_batch(spark, tmp_path_factory):
    """Stream-static scoring contract: the streaming windowed micro
    counters (extract stream -> broadcast static gold join -> score
    kernel -> event-time window) equal the batch twin computed with
    the SAME operators on the same finite input — exact-integer
    counters, so equality is literal, not approximate."""
    from text_extraction_evaluation_spark.operators.extract import extract_pages
    from text_extraction_evaluation_spark.operators.score import score_extracted
    from text_extraction_evaluation_spark.sources.readers import gold_df, pages_df
    from text_extraction_evaluation_spark.streaming.stream import (
        read_pages_stream,
        windowed_micro_f1,
    )

    base = tmp_path_factory.mktemp("scorestream")
    pages_dir = str(base / "pages")
    pages = pages_df(spark, SF0001, n_partitions=6)
    pages.write.parquet(pages_dir)
    gold = gold_df(spark, SF0001)

    agg = windowed_micro_f1(read_pages_stream(spark, pages_dir), gold)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_f1")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    key = lambda r: (r["window"]["start"], r["window"]["end"], r["extractor"], r["dataset"])  # noqa: E731
    got = {
        key(r): (r["micro_matched"], r["micro_retrieved"], r["micro_relevant"], r["n_docs"])
        for r in spark.sql("SELECT * FROM win_f1").collect()
    }
    batch_scores = score_extracted(
        extract_pages(spark.read.parquet(pages_dir)), gold, keep_cols=("warc_ts",)
    )
    want = {
        key(r): (r["micro_matched"], r["micro_retrieved"], r["micro_relevant"], r["n_docs"])
        for r in (
            batch_scores.groupBy(F.window("warc_ts", "10 minutes"), "extractor", "dataset")
            .agg(
                F.sum("matched").alias("micro_matched"),
                F.sum("retrieved").alias("micro_retrieved"),
                F.sum("relevant").alias("micro_relevant"),
                F.count(F.lit(1)).alias("n_docs"),
            )
            .collect()
        )
    }
    assert got == want
    assert sum(v[3] for v in got.values()) > 0
