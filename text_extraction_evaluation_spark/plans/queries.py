"""Oracle-checked query registry (driver contract, __spark_entry__.py).

Every SQL-expressible operator from SURVEY.md §2 — plus the
training-data-pipeline operators (dedup exact/MinHash-LSH/SimHash/
n-gram-Jaccard, similarity search, text quality/token stats,
fingerprinting) — gets a Spark DataFrame implementation here AND an
ANSI-SQL twin the driver runs through DuckDB at sf0.01.

Cross-engine determinism rules used throughout:
* money/quantity sums go through DECIMAL casts (exact partial-agg-order
  -independent arithmetic) and are cast to DOUBLE at the end;
* double averages are ``round(x, 6)``;
* hash primitives are md5-hex-prefix -> bigint (identical in both
  engines), never xxhash64/murmur (engine-specific);
* every computed column is aliased identically on both sides (the
  driver's value-hash sorts columns by name).

Scale notes are attached per query: broadcast hints on dimension
tables, aggregate-before-join where legal, and no driver-side loops.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    MINHASH_BANDS,
    MINHASH_ROWS_PER_BAND,
    MINHASH_SEEDS,
    SIMHASH_BITS,
    md5_int,
    minhash_signature,
    tokens_col,
    word_shingles,
)
from ..algo.stoplists import _SYNTH_STOPWORDS

STOPWORDS_SORTED = sorted(_SYNTH_STOPWORDS)
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_SORTED)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, spread across cores. The fixture is one small parquet
    file => one input split; the lambda-heavy shingle/hash queries are
    CPU-bound per row, so give them all cores. (Real corpora arrive in
    many splits and skip this.)"""
    return _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def _dec(col, prec="decimal(18,2)"):
    return F.col(col).cast(prec) if isinstance(col, str) else col.cast(prec)


# ---------------------------------------------------------------------------
# Relational battery (star schema) — SURVEY.md §2.2/2.4/2.5/2.6/2.7
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-style wide aggregation (TPC-H Q1 shape): filter pushdown to the
    parquet scan + hash aggregate with map-side partials."""
    li = _t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(3,2)"))
    charge = disc_price * (one + _dec("l_tax", "decimal(3,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity", "decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6))
        .withColumn("avg_price", F.round(F.col("sum_base_price") / F.col("count_order"), 6))
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J + A + O1 top-k: aggregate orders BEFORE the join (smaller
    shuffle), broadcast the customer dim, window row_number top-20."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return (
        rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "c_mktsegment", "revenue", "n_orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
    )


_TOP_CUST_SQL = """
WITH rev AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
), j AS (
  SELECT c_custkey, c_name, c_mktsegment, revenue, n_orders,
         ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rk
  FROM rev JOIN customer ON o_custkey = c_custkey
)
SELECT * FROM j WHERE rk <= 20
"""


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiway join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    Dims are broadcast; the only big shuffle is lineitem⋈orders on
    orderkey (at 100 TB: co-partition/bucket both on orderkey)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(3,2)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_NATION_REV_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (the same shape as the resume pending-work join
    J2, SURVEY.md §2.4): customers with no URGENT-priority order.
    (Every customer has SOME order in this fixture, so the anti-join is
    against the urgent subset — non-trivial result at every SF.)"""
    cust = _t(spark, sf_dir, "customer")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
"""


def q_urgent_shipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: orders having at least one early-shipped line."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_SEMI_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
)
GROUP BY o_orderpriority
"""


def q_rank_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 window ranking: top-3 customers by acctbal per nation."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "rk", "c_custkey", "c_name",
                F.round("c_acctbal", 2).alias("acctbal"))
    )


_RANK_SQL = """
SELECT n_name, rk, c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM (
  SELECT n_name, c_custkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rk <= 3
"""


def q_rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets rollup over (status, priority) with subtotal rows."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation over the event stream table."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
    )


_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       ROUND(AVG(value), 6) AS avg_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props column (SURVEY.md §2.10)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_EVENTS_JSON_SQL = """
SELECT event_type,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag over (user, ts), new session when the gap
    exceeds 30 minutes, session id via running sum — the canonical
    stateful-over-window pattern (stream-analytics shape, batch form)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    # ts is TIMESTAMP_NTZ; session tz is pinned UTC, so ntz->timestamp->
    # long is floored epoch seconds (matches the oracle's floor(epoch()))
    epoch = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_seq", F.sum("new_sess").over(w)
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(epoch) - F.min(epoch)).alias("duration_sec"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("session_value"),
        )
    )


_SESSIONS_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       max(floor(epoch(ts))::BIGINT) - min(floor(epoch(ts))::BIGINT) AS duration_sec,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS session_value
FROM s GROUP BY user_id, session_seq
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (TPC-H Q2 skeleton): suppliers whose
    account balance equals the minimum within their nation — decorrelated
    by Catalyst into an aggregate + join."""
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    min_bal = sup.groupBy("s_nationkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        sup.join(F.broadcast(min_bal), "s_nationkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("n_name", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


_MIN_COST_SQL = """
SELECT n_name, s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
FROM supplier s
JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (
  SELECT MIN(s2.s_acctbal) FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey
)
"""


# ---------------------------------------------------------------------------
# Training-data pipeline operators over `documents`
# ---------------------------------------------------------------------------


# BPE-ish pre-tokenizer regex (GPT-2-style, simplified to the subset
# where Java regex and RE2 agree): letter runs, digit runs, and single
# non-alphanumeric marks — the standard proxy for LLM token budgeting
# when the real BPE merges are not applied.
_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — whitespace tokenizer + BPE-ish regex count,
    JVM-side only."""
    docs = _docs_par(spark, sf_dir)
    tok = tokens_col("text")
    n = F.size(tok)
    chars = F.length(F.regexp_replace("text", r"\s+", ""))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct_tokens"),
        F.regexp_count("text", F.lit(_BPE_RE)).alias("n_bpe_tokens"),
        chars.alias("n_chars_nospace"),
        F.round(chars.cast("double") / n, 6).alias("avg_token_len"),
    )


_TOKEN_STATS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
         CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INTEGER) AS bpe,
         length(regexp_replace(text, '\\s+', '', 'g')) AS chars
  FROM documents
)
SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct_tokens,
       bpe AS n_bpe_tokens, chars AS n_chars_nospace,
       ROUND(CAST(chars AS DOUBLE) / len(w), 6) AS avg_token_len
FROM t
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + length saturation + lexical
    diversity (the length/stopword feature family the extractor's
    classifier uses, lifted to corpus level)."""
    docs = _docs_par(spark, sf_dir)
    tok = tokens_col("text")
    n = F.size(tok)
    stop_hits = F.aggregate(
        tok,
        F.lit(0),
        lambda acc, w: acc + F.when(w.isin(STOPWORDS_SORTED), 1).otherwise(0),
    )
    stop_ratio = stop_hits.cast("double") / n
    distinct_ratio = F.size(F.array_distinct(tok)).cast("double") / n
    length_sat = F.least(F.lit(1.0), n.cast("double") / F.lit(100.0))
    quality = 0.5 * stop_ratio + 0.3 * length_sat + 0.2 * distinct_ratio
    return docs.select(
        "doc_id",
        "lang",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(length_sat, 6).alias("length_sat"),
        # floor-quantized micro-units: ROUND half-tie semantics differ
        # across engines for values landing exactly on a .5 boundary
        F.floor(quality * 1e6).cast("bigint").alias("quality_e6"),
    )


_TEXT_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), s AS (
  SELECT doc_id, lang,
    CAST(list_sum(list_transform(w, x -> CASE WHEN x IN ({_STOP_SQL}) THEN 1 ELSE 0 END)) AS DOUBLE) / len(w) AS sr,
    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dr,
    LEAST(1.0::DOUBLE, CAST(len(w) AS DOUBLE) / 100.0::DOUBLE) AS ls
  FROM t
)
SELECT doc_id, lang, ROUND(sr, 6) AS stop_ratio, ROUND(dr, 6) AS distinct_ratio,
       ROUND(ls, 6) AS length_sat,
       CAST(floor((0.5::DOUBLE * sr + 0.3::DOUBLE * ls + 0.2::DOUBLE * dr) * 1000000.0::DOUBLE) AS BIGINT) AS quality_e6
FROM s
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized lowercased
    text (engine-portable; used as the exact-dedup key)."""
    docs = _docs_par(spark, sf_dir)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


_FINGERPRINT_SQL = """
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint over the
    corpus plus a deterministically re-crawled subset (doc_id % 10 == 0
    re-keyed past max(doc_id) — the fixture corpus itself has only
    NEAR-dups, which minhash/jaccard below find; re-crawls model
    byte-identical refetches). The offset is derived as max(doc_id)+1
    (broadcast single-row aggregate, no driver action) so planted ids
    can NEVER collide with real doc_ids at any corpus size; the output
    is offset-invariant because a planted id never wins min(doc_id).
    Emits duplicate groups with the canonical keeper id. At 100 TB this
    is one map-side fingerprint + one hash aggregate — the cheapest
    dedup tier, always run before the LSH tiers."""
    docs = _docs_par(spark, sf_dir).select("doc_id", "text")
    off = docs.agg((F.max("doc_id") + 1).alias("off"))
    recrawl = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .join(F.broadcast(off))
        .withColumn("doc_id", F.col("doc_id") + F.col("off"))
        .drop("off")
    )
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    return (
        docs.unionByName(recrawl)
        .select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


_DEDUP_EXACT_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), text
  FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
       COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM corpus GROUP BY 1 HAVING COUNT(*) > 1
"""


# Hot-key caps for the exact sketch equi-joins: a key (shingle /
# winnowing fingerprint) shared by k documents emits O(k^2) join rows;
# keys above these document frequencies are boilerplate, not signal,
# and are dropped from both the index and the size terms (mirrored in
# the oracle SQL, so the check is exact over the capped universe).
NGRAM_MAX_DF = 256
CONTAINMENT_MAX_DF = 256


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-word-shingle Jaccard >= 0.8 pairs via an inverted index:
    explode (doc_id, shingle), EQUI-join on the shingle, count shared
    shingles per pair (intersection), then join back the set sizes for
    the union term. Any pair with Jaccard > 0 shares a shingle, so this
    is exact over the RETAINED shingle universe — and it shuffles on
    shingle keys instead of the O(n^2) nested-loop self-join
    (dedup_ngram_jaccard_brute, the test twin).

    Hot-key cap: a shingle present in k docs contributes O(k^2) join
    rows — boilerplate shingles ("click here to subscribe") are the
    skew at 100 TB. Shingles with document frequency > NGRAM_MAX_DF
    are dropped from BOTH the inverted index AND the set-size term, so
    the result is exactly "Jaccard over shingles with df <= cap" — the
    standard stop-shingle / prefix-filter semantic, mirrored in the
    oracle SQL. The hot set is tiny by construction (<= total
    shingle-instances / cap keys), hence the broadcast anti-join. The
    fixture corpus has no hot shingles, so the cap is semantics-
    preserving there; tests/test_dedup.py plants a hot shingle and
    asserts the bounded pair count."""
    docs = _docs_par(spark, sf_dir)
    sh = docs.select(
        "doc_id", word_shingles(tokens_col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    inv = sh.select("doc_id", F.explode("sh").alias("s"))
    hot = (
        inv.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > NGRAM_MAX_DF)
        .select("s")
    )
    inv = inv.join(F.broadcast(hot), "s", "left_anti")
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).select(
        "doc_id", "n"
    )
    a, b = inv.alias("a"), inv.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    # threshold on the UNROUNDED value (matching the SQL twin's WHERE);
    # rounding is display-only — filtering the rounded value would
    # disagree with the oracle for jaccard in [0.7999995, 0.8)
    return (
        co.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .filter(jac >= 0.8)
        .select("doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard"))
    )


def dedup_ngram_jaccard_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs exactness twin (array_intersect over a nested-loop
    self-join) — NOT registered; tests assert equality with the
    inverted-index plan."""
    docs = _docs_par(spark, sf_dir)
    sh = docs.select(
        "doc_id", word_shingles(tokens_col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(jac >= 0.8)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


_JACCARD_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS sl
  FROM t WHERE len(w) >= 3
), inv AS (
  SELECT doc_id, unnest(sl) AS s FROM sh
), cold AS (
  SELECT s FROM inv GROUP BY s HAVING COUNT(*) <= {NGRAM_MAX_DF}
), inv2 AS (
  SELECT inv.doc_id, inv.s FROM inv JOIN cold USING (s)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM inv2 GROUP BY doc_id
), co AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS inter
  FROM inv2 a JOIN inv2 b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_a, doc_id_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
FROM co
JOIN sizes sa ON sa.doc_id = doc_id_a
JOIN sizes sb ON sb.doc_id = doc_id_b
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH candidate pairs: 16 xor-permuted md5 minhashes,
    4 bands x 4 rows; docs sharing any band bucket become a candidate
    pair. Signatures come from the Arrow/numpy kernel
    (operators.dedup.minhash_band_rows — same engine-portable hash
    family as the SQL oracle; ~20x faster than interpreted Catalyst
    lambdas); the band-bucket shuffle and pair generation stay JVM-side
    and move only (doc_id, band_key), never shingles."""
    from ..operators.dedup import candidate_pairs, minhash_band_rows

    docs = _docs_par(spark, sf_dir)
    return candidate_pairs(minhash_band_rows(docs))


def dedup_minhash_lsh_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM (Catalyst higher-order-function) formulation of the
    same MinHash-LSH candidates — kept as a cross-check twin for the
    Arrow kernel (tests assert equality) and as the no-Python-workers
    fallback."""
    docs = _docs_par(spark, sf_dir)
    sh = docs.select(
        "doc_id", word_shingles(tokens_col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    # materialized hash pass in its own projection so CollapseProject
    # does not inline the md5 transform 16x into the signature exprs
    hs = sh.select("doc_id", F.transform("sh", md5_int).alias("h"))
    sig = hs.select("doc_id", *[
        F.array_min(F.transform("h", lambda x: x.bitwiseXOR(F.lit(seed)))).alias(f"s{i}")
        for i, seed in enumerate(MINHASH_SEEDS)
    ])
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(",", *[
                    F.col(f"s{b * MINHASH_ROWS_PER_BAND + r}").cast("string")
                    for r in range(MINHASH_ROWS_PER_BAND)
                ])
            ).alias("band_key"),
        )
        for b in range(MINHASH_BANDS)
    ])
    bands = sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    from ..operators.dedup import candidate_pairs

    return candidate_pairs(bands)


def _minhash_sql() -> str:
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(h, x -> xor(x, {seed}::BIGINT))) AS s{i}"
        for i, seed in enumerate(MINHASH_SEEDS)
    )
    band_selects = "\n  UNION ALL\n".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sig".format(
            b=b,
            key=" || ',' || ".join(
                f"s{b * MINHASH_ROWS_PER_BAND + r}::VARCHAR"
                for r in range(MINHASH_ROWS_PER_BAND)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
  FROM t WHERE len(w) >= 3
), hs AS (
  SELECT doc_id, list_transform(s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h FROM sh
), sig AS (
  SELECT doc_id,
    {sig_exprs}
  FROM hs
), bands AS (
  {band_selects}
)
SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup operator: LSH candidates verified with
    exact 3-gram Jaccard >= 0.8 — linear signature pass + candidate-only
    verification join (never all-pairs)."""
    from ..operators.dedup import verified_near_dup_pairs

    docs = _docs_par(spark, sf_dir)
    return verified_near_dup_pairs(docs, threshold=0.8)


def _minhash_verified_sql() -> str:
    cand = _minhash_sql()
    return f"""
WITH cand AS ({cand}),
tt AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh2 AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
  FROM tt WHERE len(w) >= 3
)
SELECT c.doc_id_a, c.doc_id_b,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
FROM cand c
JOIN sh2 a ON a.doc_id = c.doc_id_a
JOIN sh2 b ON b.doc_id = c.doc_id_b
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
"""


def doc_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash fingerprints (1-in-8 sampled 5-gram
    hashes) — compact containment/overlap sketch per document."""
    from ..operators.textstats import rolling_fingerprints

    docs = _docs_par(spark, sf_dir)
    return rolling_fingerprints(docs, window=5, keep_mod=8)


_ROLLING_FP_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
          for i in range(1, len(w) - 3)] AS s
  FROM t WHERE len(w) >= 5
), h AS (
  SELECT doc_id,
         list_distinct(list_filter(
           list_transform(s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT),
           v -> v % 8 = 0)) AS fps
  FROM sh
)
SELECT doc_id, unnest(fps) AS fingerprint FROM h WHERE len(fps) > 0
"""


def doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing containment candidates: documents sharing >= 2 sampled
    rolling-hash fingerprints, scored by |shared| / min(|fps_a|,
    |fps_b|) — the standard copy/containment estimate (MOSS-style) from
    the compact sketch. EQUI-join on the fingerprint, never an
    all-pairs comparison; at 100 TB the sketch (1-in-8 of 5-gram
    hashes) is what ships to the shuffle, not documents.

    Hot-key cap (same pattern as dedup_ngram_jaccard): a fingerprint
    shared by k docs emits O(k^2) join rows; fingerprints with document
    frequency > CONTAINMENT_MAX_DF are boilerplate and are dropped from
    both the join and the size terms via a broadcast anti-join — the
    oracle SQL applies the identical cap, so the check stays exact over
    the capped sketch universe."""
    from ..operators.textstats import rolling_fingerprints

    fps = rolling_fingerprints(_docs_par(spark, sf_dir), window=5, keep_mod=8)
    hot = (
        fps.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > CONTAINMENT_MAX_DF)
        .select("fingerprint")
    )
    fps = fps.join(F.broadcast(hot), "fingerprint", "left_anti")
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    a, b = fps.alias("a"), fps.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_fp").alias("n_b"))
    contain = F.col("n_shared").cast("double") / F.least("n_a", "n_b")
    return (
        shared.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a", "doc_id_b", "n_shared",
            F.round(contain, 6).alias("containment"),
        )
    )


_CONTAINMENT_SQL = f"""
WITH fp0 AS ({_ROLLING_FP_SQL}),
cold AS (
  SELECT fingerprint FROM fp0 GROUP BY fingerprint
  HAVING COUNT(*) <= {CONTAINMENT_MAX_DF}
), fp AS (
  SELECT fp0.doc_id, fp0.fingerprint FROM fp0 JOIN cold USING (fingerprint)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_fp FROM fp GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_shared
  FROM fp a JOIN fp b
    ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT doc_id_a, doc_id_b, n_shared,
       ROUND(CAST(n_shared AS DOUBLE) / least(sa.n_fp, sb.n_fp), 6) AS containment
FROM shared
JOIN sizes sa ON sa.doc_id = doc_id_a
JOIN sizes sb ON sb.doc_id = doc_id_b
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS: connected components over the verified
    MinHash-LSH pair graph (iterative min-label propagation on the
    Spark side; recursive CTE in the DuckDB oracle). The production
    answer to transitive duplicate chains — greedy pairwise removal
    under-merges."""
    from ..operators.dedup import connected_components, verified_near_dup_pairs

    docs = _docs_par(spark, sf_dir)
    pairs = verified_near_dup_pairs(docs, threshold=0.8).select(
        "doc_id_a", "doc_id_b"
    )
    return connected_components(pairs)


def _components_sql() -> str:
    pairs = _minhash_verified_sql()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
reach(src, node) AS (
  SELECT doc_id_a, doc_id_a FROM pairs
  UNION
  SELECT doc_id_b, doc_id_b FROM pairs
  UNION
  SELECT r.src,
         CASE WHEN p.doc_id_a = r.node THEN p.doc_id_b ELSE p.doc_id_a END
  FROM reach r JOIN pairs p ON r.node IN (p.doc_id_a, p.doc_id_b)
)
SELECT src AS doc_id, MIN(node) AS component FROM reach GROUP BY src
"""


def dedup_keep_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual dedup DELIVERABLE, end-to-end: run the full near-dup
    removal (MinHash-LSH candidates -> exact-Jaccard verification ->
    connected components -> keep min-id per component, i.e.
    operators.dedup.dedup_keep_list) and census the surviving corpus
    per language — kept / dropped / total counts. One left join of the
    tiny drop list onto the corpus, then a hash aggregate; at 100 TB
    the drop list is the only extra shuffle beyond the pair pipeline.
    Oracle: recursive-CTE connected components over the same verified
    pair graph."""
    from ..operators.dedup import dedup_keep_list

    docs = _docs_par(spark, sf_dir)
    kept = dedup_keep_list(docs, threshold=0.8, method="components")
    return (
        docs.select("doc_id", "lang")
        .join(kept.select("doc_id", F.lit(1).alias("k")), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.coalesce("k", F.lit(0))).alias("n_kept"),
        )
        .withColumn("n_dropped", F.col("n_total") - F.col("n_kept"))
    )


def _keep_census_sql() -> str:
    pairs = _minhash_verified_sql()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
reach(src, node) AS (
  SELECT doc_id_a, doc_id_a FROM pairs
  UNION
  SELECT doc_id_b, doc_id_b FROM pairs
  UNION
  SELECT r.src,
         CASE WHEN p.doc_id_a = r.node THEN p.doc_id_b ELSE p.doc_id_a END
  FROM reach r JOIN pairs p ON r.node IN (p.doc_id_a, p.doc_id_b)
),
comp AS (SELECT src AS doc_id, MIN(node) AS component FROM reach GROUP BY src),
drops AS (SELECT doc_id FROM comp WHERE doc_id <> component)
SELECT d.lang,
       COUNT(*) AS n_total,
       CAST(COUNT(*) FILTER (WHERE dr.doc_id IS NULL) AS BIGINT) AS n_kept,
       CAST(COUNT(dr.doc_id) AS BIGINT) AS n_dropped
FROM documents d LEFT JOIN drops dr ON dr.doc_id = d.doc_id
GROUP BY d.lang
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per document from md5 3-word-shingle hashes — one
    pass: explode distinct shingles, 48 conditional sums, recombine.
    Pure built-ins (bit ops survive whole-stage codegen). Shingle
    features, not single words: the benchmark corpus has a closed
    31-word vocabulary, so word-level simhash degenerates (every doc
    contains nearly every word)."""
    docs = _docs_par(spark, sf_dir)
    words = docs.select(
        "doc_id", F.explode(word_shingles(tokens_col("text"))).alias("w")
    ).withColumn("h", md5_int(F.col("w")))
    aggs = [
        (
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            )
            >= 0
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    bits = words.groupBy("doc_id").agg(*aggs)
    sim = reduce(
        operator.add,
        [
            F.when(F.col(f"b{i}"), F.lit(1 << i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
            for i in range(SIMHASH_BITS)
        ],
    )
    return bits.select("doc_id", sim.alias("simhash"))


def _simhash_sql(pairs: bool = False) -> str:
    bit_exprs = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) >= 0 AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"CASE WHEN b{i} THEN {1 << i} ELSE 0 END" for i in range(SIMHASH_BITS)
    )
    base = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS wlist FROM documents
), words AS (
  SELECT doc_id,
         unnest(list_distinct([wlist[i] || ' ' || wlist[i+1] || ' ' || wlist[i+2]
                               for i in range(1, len(wlist) - 1)])) AS w
  FROM t WHERE len(wlist) >= 3
), h AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM words
), bits AS (
  SELECT doc_id,
    {bit_exprs}
  FROM h GROUP BY doc_id
), sim AS (
  SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM bits
)
"""
    if not pairs:
        return base + "SELECT doc_id, simhash FROM sim"
    return base + """
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
"""


# 48 bits split into 7 bands (6x7 + 1x6): a pair within Hamming
# distance 6 differs in at most 6 bands, so by pigeonhole it collides
# in at least one band — banding is exact for the <=6 threshold.
_SIMHASH_BANDS: list[tuple[int, int]] = [
    (0, 7), (7, 7), (14, 7), (21, 7), (28, 7), (35, 7), (42, 6),
]


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= 6, banded: each
    doc explodes to 7 (band, value) keys; candidates come from an
    EQUI-join on the band key (shuffle moves only doc_id+simhash+band,
    never O(n^2) pairs), then exact bit_count verifies Hamming <= 6.
    Exact — not approximate — by the pigeonhole split above, so the
    brute all-pairs twin (kept for tests) returns identical rows."""
    sim = dedup_simhash(spark, sf_dir)
    band_arr = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright("simhash", off).bitwiseAND(F.lit((1 << width) - 1)).alias("val"),
        )
        for i, (off, width) in enumerate(_SIMHASH_BANDS)
    ])
    bands = sim.select("doc_id", "simhash", F.explode(band_arr).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.val").alias("val")
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
        .distinct()
    )


def dedup_simhash_pairs_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs exactness twin of dedup_simhash_pairs — O(n^2)
    nested-loop self-join, NOT registered; tests assert it equals the
    banded plan on the fixture."""
    sim = dedup_simhash(spark, sf_dir)
    a = sim.alias("a")
    b = sim.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
    )


def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per (lang, dataset-side source bucket)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


_LANG_DIST_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 query vectors: the
    correctness baseline for ANN. Norms precomputed per row; query side
    broadcast; dot product via zip_with+aggregate (JVM-side, no UDF)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sq = lambda v: F.aggregate(  # noqa: E731
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    base = emb.withColumn("nrm", F.sqrt(sq(F.col("v"))))
    q = base.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    ).filter(F.col("query_id") < 10)
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cos)
        .withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "nn_rank",
            F.round("cos", 4).alias("cos_sim"),
        )
    )


_ANN_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), q AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10
), s AS (
  SELECT query_id, n.vec_id AS neighbor_id,
         list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN n ON n.vec_id <> query_id
), r AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS nn_rank
  FROM s
)
SELECT query_id, neighbor_id, nn_rank, ROUND(cos, 4) AS cos_sim
FROM r WHERE nn_rank <= 5
"""


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding L2-norm statistics."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    nrm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return (
        emb.withColumn("nrm", nrm)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


_EMB_NORMS_SQL = """
WITH n AS (
  SELECT label, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs, ROUND(AVG(nrm), 6) AS avg_norm,
       ROUND(MIN(nrm), 6) AS min_norm, ROUND(MAX(nrm), 6) AS max_norm
FROM n GROUP BY label
"""


# Sign-LSH bucket sizing rule, in code (not prose): pick enough bits
# that EXPECTED bucket occupancy n / 2^bits stays <= the target, so
# within-bucket pair work is O(n * target), not O((n/2^bits)^2 * 2^bits)
# growing with the corpus. The fixture corpora hold 500 vectors ->
# sign_lsh_bits(500) == 6; a 10^9-vector corpus would get 27 bits.
EMB_LSH_TARGET_OCCUPANCY = 8


def sign_lsh_bits(n_vectors: int, target: int = EMB_LSH_TARGET_OCCUPANCY) -> int:
    import math

    return max(1, math.ceil(math.log2(max(2.0, n_vectors / target))))


_EMB_COSINE_BITS = sign_lsh_bits(500)
assert _EMB_COSINE_BITS == 6  # frozen for the 500-vector fixtures


def embedding_cosine_pairs(
    emb: DataFrame, bits: int, threshold: float = 0.3
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with sign-LSH blocking.

    Scale path: bucket every vector by the sign pattern of its first
    ``bits`` dimensions (axis-aligned random-projection LSH —
    deterministic so the DuckDB oracle can reproduce it), self-join
    ONLY within buckets (shuffle on the bucket key — never the O(n^2)
    cross join), then verify exact cosine >= threshold on the surviving
    candidates. ``bits`` comes from sign_lsh_bits(corpus size); all
    arithmetic is JVM-side (zip_with/aggregate), no Python UDF.
    """
    emb = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    nrm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    bucket = sum(
        F.when(F.element_at("v", i + 1) > 0, F.lit(2 ** (bits - 1 - i))).otherwise(F.lit(0))
        for i in range(bits)
    )
    base = emb.withColumn("nrm", nrm).withColumn("bucket", bucket.cast("int"))
    a = base.select(
        F.col("bucket").alias("b_a"),
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("v_a"),
        F.col("nrm").alias("n_a"),
    )
    b = base.select(
        F.col("bucket").alias("b_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("v_b"),
        F.col("nrm").alias("n_b"),
    )
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.join(b, (F.col("b_a") == F.col("b_b")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos", dot / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cos") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.col("b_a").alias("bucket"),
            F.round("cos", 4).alias("cos_sim"),
        )
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered sign-LSH near-dup query at the fixture's bit count
    (sign_lsh_bits(500) = 6); the DuckDB twin is generated from the
    same constant by _emb_cosine_sql."""
    return embedding_cosine_pairs(
        _t(spark, sf_dir, "embeddings"), bits=_EMB_COSINE_BITS
    )


def _emb_cosine_sql(bits: int = _EMB_COSINE_BITS, threshold: float = 0.3) -> str:
    cases = "\n        + ".join(
        f"CASE WHEN v[{i + 1}] > 0 THEN {1 << (bits - 1 - i)} ELSE 0 END"
        for i in range(bits)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         ({cases})::INT AS bucket
  FROM e
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
       ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos_sim
FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {threshold}
"""


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest click by the same
    user at-or-before the purchase timestamp.

    Spark has no ASOF JOIN operator; the scalable composition is
    union + window (SURVEY.md §2.4 "custom operators"): tag both
    streams, sort once per user, and carry the last-seen click forward
    with ``last(..., ignorenulls)``. ONE shuffle on user_id, O(n log n)
    per key — never the range-join explosion of
    ``p JOIN c ON c.ts <= p.ts`` + argmax. Clicks are pre-aggregated
    per (user, ts) so ties are deterministic in both engines.
    """
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select("user_id", "ts", "click_value", F.lit(1).alias("is_click"),
                F.lit(None).cast("long").alias("event_id"),
                F.lit(None).cast("double").alias("purchase_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("double").alias("click_value"),
        F.lit(0).alias("is_click"), "event_id",
        F.col("value").alias("purchase_value"),
    )
    # at equal ts the click sorts first (is_click desc) => "at-or-before"
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "*",
        F.last(F.when(F.col("is_click") == 1, F.col("ts")), ignorenulls=True)
        .over(w).alias("click_ts"),
        F.last(F.col("click_value"), ignorenulls=True).over(w).alias("last_click_value"),
    )
    return merged.filter(F.col("is_click") == 0).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_value",
        "click_ts",
        F.col("last_click_value").alias("click_value"),
    )


_ASOF_SQL = """
WITH c AS (
  SELECT user_id, ts, MAX(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
       c.ts AS click_ts, c.click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: clicks within the hour preceding each
    purchase, per user. Spark plans a raw ``c.ts BETWEEN p.ts - 1h AND
    p.ts`` predicate as a nested loop; the scalable form BINS time into
    hour buckets — a 1-hour lookback spans at most 2 bins, so each
    purchase explodes to its 2 candidate bins, candidates come from an
    EQUI-join on (user_id, bin), and the exact interval filter refines.
    Exact: every qualifying click's bin is one of the two probed bins,
    and each (purchase, click) pair matches in exactly one bin (the
    click's own), so no dedup is needed."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    hour_bin = (F.col("ts").cast("timestamp").cast("long") / 3600).cast("long")
    cbin = (F.col("cts").cast("timestamp").cast("long") / 3600).cast("long")
    pb = purchases.withColumn(
        "bin", F.explode(F.array(hour_bin - 1, hour_bin))
    )
    cand = pb.join(clicks.withColumn("bin", cbin), ["user_id", "bin"]).filter(
        (F.col("cts") <= F.col("ts"))
        & (F.col("cts") > F.col("ts") - F.expr("INTERVAL 1 HOUR"))
    )
    agg = cand.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_clicks_1h"))
    return (
        purchases.join(agg, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_clicks_1h", F.lit(0)).alias("n_clicks_1h"),
        )
    )


_RANGE_JOIN_SQL = """
SELECT p.event_id, p.user_id, COUNT(c.cts) AS n_clicks_1h
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.cts <= p.ts AND c.cts > p.ts - INTERVAL 1 HOUR
GROUP BY 1, 2
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbours: the scale path past
    brute-force (`ann_cosine_topk`) and RP-LSH (`ann_lsh_topk`).

    Coarse quantizer = the first N_CENTROIDS vectors (deterministic so
    the DuckDB oracle reproduces it; production swaps in k-means
    centroids). Every vector is assigned to its nearest centroid
    (broadcast centroid table — map-side, no shuffle of the corpus);
    each query probes its NPROBE nearest cells and scans only those
    inverted lists via an equi-join on cell id. At 100 TB the cell
    count scales with corpus size so list length stays bounded.
    """
    n_centroids = 8
    base = _emb_with_norm(spark, sf_dir)
    cent = base.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    return _ivf_probe(base, cent, nprobe=2, topk=3, n_queries=10)


def _emb_with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sq = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return emb.withColumn("nrm", sq)


def _ivf_probe(
    base: DataFrame, cent: DataFrame, nprobe: int, topk: int, n_queries: int
) -> DataFrame:
    """Shared IVF probe: centroids (cid, cv, cn) collapse to a one-row
    broadcast array; assignment is a map-side argmin per vector
    (array_sort over per-centroid cosine structs) — no corpus x
    n_centroids row explosion and NO shuffle for the assignment stage.
    (-ccos asc, cid asc) sort order replicates the oracle's
    ROW_NUMBER ... ORDER BY ccos DESC, cid."""
    cent_arr = cent.select(F.struct("cid", "cv", "cn").alias("c")).agg(
        F.collect_list("c").alias("cents")
    )
    scored_cells = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (
                -(
                    F.aggregate(
                        F.zip_with(F.col("v"), c["cv"], lambda x, y: x * y),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    / (F.col("nrm") * c["cn"])
                )
            ).alias("neg_ccos"),
            c["cid"].alias("cid"),
        ),
    )
    assigned = base.join(F.broadcast(cent_arr)).withColumn(
        "pc", F.slice(F.array_sort(scored_cells), 1, nprobe)
    )
    cells = assigned.select(
        "vec_id", "v", "nrm", F.element_at("pc", 1)["cid"].alias("cell")
    )
    probes = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(F.transform("pc", lambda s: s["cid"])).alias("cell"),
    )
    qcos = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    ) / (F.col("qn") * F.col("nrm"))
    wtop = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        probes.join(cells, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", qcos)
        .withColumn("nn_rank", F.row_number().over(wtop))
        .filter(F.col("nn_rank") <= topk)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "nn_rank",
                F.round("cos", 4).alias("cos_sim"))
    )


_IVF_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), cent AS (
  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8
), ranked AS (
  SELECT n.vec_id, n.v, n.nrm, cent.cid,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) DESC, cent.cid
         ) AS crank
  FROM n CROSS JOIN cent
), cells AS (
  SELECT vec_id, v, nrm, cid AS cell FROM ranked WHERE crank = 1
), probes AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid AS cell
  FROM ranked WHERE vec_id < 10 AND crank <= 2
), scored AS (
  SELECT query_id, cells.vec_id AS neighbor_id,
         list_dot_product(qv, cells.v) / (qn * cells.nrm) AS cos
  FROM probes JOIN cells USING (cell)
  WHERE cells.vec_id <> query_id
), top AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS nn_rank
  FROM scored
)
SELECT query_id, neighbor_id, nn_rank, ROUND(cos, 4) AS cos_sim
FROM top WHERE nn_rank <= 3
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (adapted to the fixture's simplified orders
    schema): top-10 unshipped-revenue orders for one market segment.
    customer is broadcast; the lineitem⋈orders equi-join is the one
    wide dependency (co-partition/bucket both on orderkey at 100 TB);
    top-k via a single global sort-limit (Spark's TakeOrderedAndProject
    — never a full sort materialization)."""
    cutoff = "1998-01-01"
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    one = F.lit(1).cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(3,2)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO parts in one month.
    part is broadcast (map-side join against the date-pruned lineitem
    scan); conditional aggregation, single-row result."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-03-01")
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    one = F.lit(1).cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(3,2)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                (F.lit(100.0) * F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double"))
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


_Q14_SQL = """
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE),
         6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-03-01'
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the supplier and the
    customer share a nation, one region, one order-date year. The
    6-table join: lineitem⋈orders is the single wide dependency
    (co-partition on orderkey at 100 TB — see tests/test_bucketing);
    customer/supplier/nation/region all broadcast; Catalyst pushes the
    region and date filters below the joins."""
    cutoff_lo, cutoff_hi = "1997-01-01", "1998-01-01"
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(3,2)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (F.col("l_suppkey") == sup.s_suppkey)
            & (F.col("c_nationkey") == sup.s_nationkey),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


_Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping combinations in
    one pass (partial-agg friendly; complements the rollup query)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_totalprice"),
        )
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       ROUND(AVG(o_totalprice), 4) AS avg_totalprice
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing, driver-hashable shape: synthesize the
    deterministic media table, run the Arrow feature kernel, and explode
    the feature vector to (media_id, dim_idx, value) rows. The fake
    decode is the registry's md5-prefix hash primitive, so the DuckDB
    twin regenerates the identical float32 features from scratch."""
    from ..operators.multimodal import extract_media_features, synth_media_df

    feats = extract_media_features(synth_media_df(spark, n=128), dim=16)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "feat_dim",
        "status",
        F.posexplode("feature").alias("dim_idx", "value"),
    ).withColumn("value", F.round(F.col("value").cast("double"), 6))


_MEDIA_FEATURES_SQL = """
WITH m AS (
  SELECT media_id,
         CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         repeat(sha256('media-' || media_id), 4 + media_id % 5) AS payload_str
  FROM range(128) t(media_id)
), f AS (
  SELECT media_id, kind, length(payload_str) AS n_bytes, CAST(i AS INTEGER) AS dim_idx,
         ('0x' || substr(md5(payload_str || ':' || i), 1, 15))::BIGINT AS h
  FROM m, range(16) r(i)
)
SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes, 16 AS feat_dim, 'ok' AS status,
       dim_idx,
       ROUND(CAST(CAST((h / 1152921504606846976.0 - 0.5) * 2.0 AS FLOAT) AS DOUBLE), 6) AS value
FROM f
"""


def lang_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID over documents (Arrow kernel, broadcast-frozen
    profiles). SQL-checkable because the trigram profiles are frozen
    constants: the DuckDB twin replays the same contains-count argmax."""
    from ..operators.textstats import lang_id

    return lang_id(_docs_par(spark, sf_dir))


def _lang_id_sql() -> str:
    """DuckDB twin of detect_lang: per-language profile-hit counts over
    the lowercased 2000-char prefix, argmax with ties to the earlier
    language code (strict-improvement scan order = sorted lang codes)."""
    from ..operators.textstats import _PROFILES

    hit_exprs = []
    for lang in sorted(_PROFILES):
        grams = _PROFILES[lang]
        terms = " + ".join(
            "CASE WHEN contains(sample, '{}') THEN 1 ELSE 0 END".format(
                g.replace("'", "''")
            )
            for g in grams
        )
        hit_exprs.append(f"({terms}) AS h_{lang}, {len(grams)} AS n_{lang}")
    langs = sorted(_PROFILES)
    best = "greatest({})".format(
        ", ".join(f"h_{code} / CAST(n_{code} AS DOUBLE)" for code in langs)
    )
    detect_chain = " ".join(
        f"WHEN h_{code} / CAST(n_{code} AS DOUBLE) = best THEN '{code}'"
        for code in langs
    )
    return f"""
WITH s AS (
  SELECT doc_id, lang, lower(substr(coalesce(text, ''), 1, 2000)) AS sample
  FROM documents
), h AS (
  SELECT doc_id, lang, {', '.join(hit_exprs)} FROM s
), b AS (
  SELECT *, {best} AS best FROM h
)
SELECT doc_id, lang,
       CASE WHEN best = 0 THEN 'und' {detect_chain} ELSE 'und' END AS detected_lang,
       CASE WHEN best = 0 THEN 0.0 ELSE best END AS lang_score
FROM b
"""


def pdf_pages_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF layout parse over the deterministic fake container: one row
    per page, blocks sorted into reading order (y, x). The DuckDB twin
    regenerates the same container content from the sha256 seeds."""
    from ..operators.multimodal import pdf_extract_pages, synth_pdf_df

    return pdf_extract_pages(synth_pdf_df(spark, n=128))


_PDF_PAGES_SQL = """
WITH pages AS (
  SELECT doc_id, p FROM range(128) t(doc_id), range(4) r(p)
  WHERE p < 1 + doc_id % 4
), blocks AS (
  SELECT doc_id, p, b, sha256(doc_id || '-' || p || '-' || b) AS h
  FROM pages, range(5) rb(b) WHERE b < 2 + (doc_id + p) % 3
), pos AS (
  SELECT doc_id, p,
         ('0x' || substr(h, 1, 2))::INT % 100 AS y,
         ('0x' || substr(h, 3, 2))::INT % 50 AS x,
         'block ' || doc_id || '.' || p || '.' || b || ' word'
           || (('0x' || substr(h, 5, 2))::INT % 7) AS text
  FROM blocks
)
SELECT doc_id, CAST(p AS INT) AS page,
       string_agg(text, chr(10) ORDER BY y, x, text) AS text,
       CAST(COUNT(*) AS INT) AS n_blocks, 'ok' AS status
FROM pos GROUP BY doc_id, p
"""


def ann_lsh_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RP-LSH ANN with multiprobe, driver-checkable shape (cos rounded
    like ann_cosine_topk). The DuckDB twin replays bucket assignment
    from the frozen splitmix hyperplanes as literal arrays — only the
    SIGN of each plane dot-product matters, so cross-engine float-sum
    ordering cannot flip buckets except exactly at the hyperplane."""
    from ..operators.similarity import ann_lsh_topk

    emb = _t(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    r = ann_lsh_topk(emb, list(range(10)), k=5)
    return r.select(
        "query_id", "neighbor_id", "nn_rank", F.round("cos", 4).alias("cos_sim")
    )


def _ann_lsh_sql(n_planes: int = 8, multiprobe: int = 2, dim: int = 64, k: int = 5) -> str:
    from itertools import combinations

    from ..operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes)
    bucket = " + ".join(
        "(CASE WHEN list_dot_product(v, [{}]) >= 0 THEN {} ELSE 0 END)".format(
            ", ".join(repr(float(x)) for x in planes[i]), 1 << i
        )
        for i in range(n_planes)
    )
    masks = [0] + [
        sum(1 << b for b in bits)
        for d in range(1, multiprobe + 1)
        for bits in combinations(range(n_planes), d)
    ]
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         {bucket} AS bucket
  FROM e
), q AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qbucket
  FROM n WHERE vec_id < 10
), qx AS (
  SELECT query_id, qv, qn, xor(qbucket, m) AS bucket
  FROM q, (SELECT unnest([{", ".join(map(str, masks))}]) AS m)
), s AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         MAX(list_dot_product(qv, c.v) / (qn * c.nrm)) AS cos
  FROM qx JOIN n c USING (bucket)
  WHERE c.vec_id <> query_id
  GROUP BY query_id, c.vec_id
), r AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS nn_rank
  FROM s
)
SELECT query_id, neighbor_id, nn_rank, ROUND(cos, 4) AS cos_sim
FROM r WHERE nn_rank <= {k}
"""


# Per-language sampling rates (percent) for the stratified sampler —
# the "downsample the over-represented language" knob of a training-data
# mix. Frozen constants shared with the SQL twin.
_SAMPLE_RATES: dict[str, int] = {"en": 40, "de": 60, "fr": 60, "es": 80, "zh": 100}


def doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum (language) sampling via the engine-
    portable hash: keep a doc when md5_int(doc_id) % 100 < rate[lang].
    Map-side only — no shuffle, no RNG, reproducible across runs and
    engines; the 100 TB shape for building a training mix (each
    executor decides membership locally from the key hash)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    h = md5_int(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 100
    rate = reduce(
        lambda acc, kv: acc.when(F.col("lang") == kv[0], F.lit(kv[1])),
        _SAMPLE_RATES.items(),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(0))
    return (
        docs.withColumn("bucket_pct", h.cast("int"))
        .filter(F.col("bucket_pct") < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


def _sample_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in _SAMPLE_RATES.items()
    )
    return f"""
SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM (
  SELECT lang, n_chars,
         ('0x' || substr(md5('sample:' || doc_id), 1, 15))::BIGINT % 100 AS bucket_pct
  FROM documents
)
WHERE bucket_pct < (CASE lang {cases} ELSE 0 END)
GROUP BY lang
"""


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style heuristic quality gate over the corpus, pure JVM
    higher-order functions: minimum token count, bounded mean word
    length, stopword-ratio floor, terminal-punctuation sentence ratio.
    Emits the per-(lang, keep) census plus quantized mean scores — the
    shape a 100 TB run materializes to audit what a filter drops."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = F.split(F.trim("text"), r"\s+")
    n_tok = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    ).cast("double") / n_tok
    stop_ratio = (
        F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS_SORTED))).cast(
            "double"
        )
        / n_tok
    )
    # repetition signal: distinct-token fraction (low = boilerplate/spam
    # loops). Reported for auditing, not part of the keep rule — the
    # fixture's closed vocabulary would make any threshold length-biased.
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    keep = (
        (n_tok >= 50)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (stop_ratio >= 0.05)
    )
    return (
        docs.select(
            "lang",
            keep.alias("keep"),
            n_tok.alias("n_tok"),
            mean_len.alias("mean_len"),
            stop_ratio.alias("stop_ratio"),
            uniq_ratio.alias("uniq_ratio"),
        )
        .groupBy("lang", "keep")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("mean_len"), 6).alias("avg_mean_len"),
            F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
            F.round(F.avg("uniq_ratio"), 6).alias("avg_uniq_ratio"),
        )
    )


_QUALITY_FILTER_SQL = f"""
WITH t AS (
  SELECT lang, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), f AS (
  SELECT lang,
         len(toks) AS n_tok,
         CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) / len(toks) AS mean_len,
         CAST(len(list_filter(toks, w -> list_contains([{_STOP_SQL}], lower(w)))) AS DOUBLE) / len(toks) AS stop_ratio,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
  FROM t
)
SELECT lang,
       (n_tok >= 50 AND mean_len >= 3.0 AND mean_len <= 10.0 AND stop_ratio >= 0.05) AS keep,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       ROUND(AVG(mean_len), 6) AS avg_mean_len,
       ROUND(AVG(stop_ratio), 6) AS avg_stop_ratio,
       ROUND(AVG(uniq_ratio), 6) AS avg_uniq_ratio
FROM f GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Golden-fingerprint gates for the non-SQL-expressible extraction family.
#
# jusText extraction / LCS scoring cannot be expressed in SQL, so their
# driver gate is an order-independent content fingerprint: a 48-bit
# md5-prefix sum over every row's key fields (+ floor(1e9*x) integer
# sums for the per-span/per-doc doubles, which are bitwise-identical
# between the oracle and the Spark kernel — tests/test_parity.py). The
# oracle side is a frozen constant computed by the pinned pure-Python
# oracle (scripts/freeze_fingerprints.py -> oracle/run_oracle.py),
# never from Spark — so any Spark-side drift (Arrow round-trip, dedup
# window, encoding sniff, partitioning) shows up as a driver hash
# mismatch. Constants are keyed on the fixture scale via
# (SELECT COUNT(*) FROM events): 1000 = sf0.001, 10000 = sf0.01 (both
# document corpora have 500 docs, so doc count cannot key them).
# ---------------------------------------------------------------------------


def _fp48(col: Column) -> Column:
    """48-bit md5-prefix fingerprint (sum-safe in bigint up to ~30k rows
    per fixture; the Python twin is int(md5(s).hexdigest()[:12], 16))."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def _q9(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(1e9)).cast("bigint")


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.extract import extract_pages, extracted_clean, latest_crawl
    from ..sources.readers import pages_df

    pages = pages_df(spark, sf_dir, n_partitions=16)
    return extracted_clean(extract_pages(latest_crawl(pages)))


def extract_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-parity of the full extraction pipeline as one driver row:
    fingerprint over url|lang|status|n_paragraphs|n_good|text."""
    ex = _extracted(spark, sf_dir)
    key = F.concat_ws(
        "|",
        "url",
        "lang",
        "status",
        F.col("n_paragraphs").cast("string"),
        F.col("n_good").cast("string"),
        F.coalesce(F.col("text"), F.lit("")),
    )
    return ex.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(_fp48(key)).alias("fp_sum")
    )


_TEXT_FP_SQL = """
SELECT n_rows, fp_sum FROM (VALUES
  (1000,  CAST(500 AS BIGINT), CAST(70158527454893740 AS BIGINT)),
  (10000, CAST(500 AS BIGINT), CAST(69798393735633324 AS BIGINT))
) t(n_events, n_rows, fp_sum)
WHERE n_events = (SELECT COUNT(*) FROM events)
"""


def extract_spans_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level parity as one driver row: fingerprint over
    url|idx|class_cf|class_final|word_count|heading plus quantized
    density sums."""
    from ..operators.extract import extract_spans, latest_crawl
    from ..sources.readers import pages_df

    spans = extract_spans(latest_crawl(pages_df(spark, sf_dir, n_partitions=16)))
    key = F.concat_ws(
        "|",
        "url",
        F.col("idx").cast("string"),
        "class_cf",
        "class_final",
        F.col("word_count").cast("string"),
        F.col("heading").cast("int").cast("string"),
        "text",
    )
    return spans.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_fp48(key)).alias("fp_sum"),
        F.sum(_q9("link_density")).alias("ld_q9_sum"),
        F.sum(_q9("stopword_density")).alias("sd_q9_sum"),
    )


_SPANS_FP_SQL = """
SELECT n_rows, fp_sum, ld_q9_sum, sd_q9_sum FROM (VALUES
  (1000,  CAST(3413 AS BIGINT), CAST(475679151384561777 AS BIGINT),
          CAST(1520808857500 AS BIGINT), CAST(528771530360 AS BIGINT)),
  (10000, CAST(3244 AS BIGINT), CAST(457125634549963469 AS BIGINT),
          CAST(1520808857500 AS BIGINT), CAST(448049649062 AS BIGINT))
) t(n_events, n_rows, fp_sum, ld_q9_sum, sd_q9_sum)
WHERE n_events = (SELECT COUNT(*) FROM events)
"""


def doc_scores_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LCS/BoW scoring parity as one driver row:
    fingerprint over the integer/string score fields plus quantized
    sums of the six P/R/F1 doubles."""
    from ..operators.score import score_extracted
    from ..sources.readers import gold_df

    scores = score_extracted(_extracted(spark, sf_dir), gold_df(spark, sf_dir))
    key = F.concat_ws(
        "|",
        "url",
        "extractor",
        "dataset",
        F.col("matched").cast("string"),
        F.col("matched_bow").cast("string"),
        F.col("retrieved").cast("string"),
        F.col("relevant").cast("string"),
        "status",
    )
    return scores.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_fp48(key)).alias("fp_sum"),
        F.sum(_q9("precision")).alias("p_q9_sum"),
        F.sum(_q9("recall")).alias("r_q9_sum"),
        F.sum(_q9("f1")).alias("f1_q9_sum"),
        F.sum(_q9("precision_bow")).alias("pb_q9_sum"),
        F.sum(_q9("recall_bow")).alias("rb_q9_sum"),
        F.sum(_q9("f1_bow")).alias("fb_q9_sum"),
    )


_SCORES_FP_SQL = """
SELECT n_rows, fp_sum, p_q9_sum, r_q9_sum, f1_q9_sum, pb_q9_sum, rb_q9_sum, fb_q9_sum
FROM (VALUES
  (1000,  CAST(500 AS BIGINT), CAST(69310761688465331 AS BIGINT),
          CAST(272266938002 AS BIGINT), CAST(266559509428 AS BIGINT),
          CAST(267134691490 AS BIGINT), CAST(272437275957 AS BIGINT),
          CAST(266772245923 AS BIGINT), CAST(267323222762 AS BIGINT)),
  (10000, CAST(500 AS BIGINT), CAST(70349754476732240 AS BIGINT),
          CAST(264560467807 AS BIGINT), CAST(262334017192 AS BIGINT),
          CAST(261836346105 AS BIGINT), CAST(264796460241 AS BIGINT),
          CAST(262640683137 AS BIGINT), CAST(262102801803 AS BIGINT))
) t(n_events, n_rows, fp_sum, p_q9_sum, r_q9_sum, f1_q9_sum, pb_q9_sum, rb_q9_sum, fb_q9_sum)
WHERE n_events = (SELECT COUNT(*) FROM events)
"""


def status_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 fail/empty report over the scored corpus; oracle side is the
    frozen per-fixture status census from the pure-Python oracle."""
    from ..operators.report import status_counts
    from ..operators.score import score_extracted
    from ..sources.readers import gold_df

    scores = score_extracted(_extracted(spark, sf_dir), gold_df(spark, sf_dir))
    return status_counts(scores)


_STATUS_COUNTS_SQL = """
SELECT extractor, dataset, status, n_docs FROM (VALUES
  (1000,  'justext_spark', 'cleaneval',  'empty', CAST(112 AS BIGINT)),
  (1000,  'justext_spark', 'cleaneval',  'ok',    CAST(138 AS BIGINT)),
  (1000,  'justext_spark', 'googlenews', 'empty', CAST(107 AS BIGINT)),
  (1000,  'justext_spark', 'googlenews', 'ok',    CAST(143 AS BIGINT)),
  (10000, 'justext_spark', 'cleaneval',  'empty', CAST(111 AS BIGINT)),
  (10000, 'justext_spark', 'cleaneval',  'ok',    CAST(139 AS BIGINT)),
  (10000, 'justext_spark', 'googlenews', 'empty', CAST(115 AS BIGINT)),
  (10000, 'justext_spark', 'googlenews', 'ok',    CAST(135 AS BIGINT))
) t(n_events, extractor, dataset, status, n_docs)
WHERE n_events = (SELECT COUNT(*) FROM events)
"""


def worst_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 diagnostic: 10 worst-scored ok-documents per (extractor,
    dataset). Oracle side is frozen VALUES from the pure-Python oracle
    (scripts/freeze_fingerprints.py); the P/R/F1 doubles are bitwise-
    deterministic (test_parity), so repr() literals round-trip exactly."""
    from ..operators.report import worst_documents
    from ..operators.score import score_extracted
    from ..sources.readers import gold_df

    scores = score_extracted(_extracted(spark, sf_dir), gold_df(spark, sf_dir))
    return worst_documents(scores, k=10)


# (n_events_key -> rows) frozen by scripts/freeze_fingerprints.py
_WORST_DOCS_CONST: dict[int, list[tuple]] = {
    1000: [
        ("cleaneval", 1, "http://host19.example/204", "0.6029411764705882", "1.0", "0.43157894736842106"),
        ("cleaneval", 2, "http://host5.example/486", "0.6131386861313868", "1.0", "0.4421052631578947"),
        ("cleaneval", 3, "http://host9.example/342", "0.6176470588235294", "1.0", "0.44680851063829785"),
        ("cleaneval", 4, "http://host7.example/488", "0.6573426573426574", "0.6351351351351351", "0.6811594202898551"),
        ("cleaneval", 5, "http://host22.example/22", "0.6615384615384615", "1.0", "0.4942528735632184"),
        ("cleaneval", 6, "http://host36.example/406", "0.6711409395973155", "1.0", "0.5050505050505051"),
        ("cleaneval", 7, "http://host6.example/6", "0.6969696969696969", "1.0", "0.5348837209302325"),
        ("cleaneval", 8, "http://host5.example/264", "0.7338129496402876", "0.6538461538461539", "0.8360655737704918"),
        ("cleaneval", 9, "http://host36.example/443", "0.7339449541284404", "1.0", "0.5797101449275363"),
        ("cleaneval", 10, "http://host32.example/328", "0.7476635514018691", "0.5970149253731343", "1.0"),
        ("googlenews", 1, "http://host25.example/358", "0.6046511627906976", "1.0", "0.43333333333333335"),
        ("googlenews", 2, "http://host29.example/214", "0.6259541984732825", "1.0", "0.45555555555555555"),
        ("googlenews", 3, "http://host17.example/54", "0.6363636363636364", "1.0", "0.4666666666666667"),
        ("googlenews", 4, "http://host4.example/374", "0.6382978723404256", "1.0", "0.46875"),
        ("googlenews", 5, "http://host1.example/38", "0.6434782608695652", "1.0", "0.47435897435897434"),
        ("googlenews", 6, "http://host23.example/134", "0.6446280991735537", "1.0", "0.47560975609756095"),
        ("googlenews", 7, "http://host20.example/390", "0.6666666666666666", "1.0", "0.5"),
        ("googlenews", 8, "http://host30.example/474", "0.7114093959731543", "1.0", "0.5520833333333334"),
        ("googlenews", 9, "http://host12.example/456", "0.7407407407407406", "0.5970149253731343", "0.975609756097561"),
        ("googlenews", 10, "http://host16.example/312", "0.7428571428571429", "0.5909090909090909", "1.0"),
    ],
    10000: [
        ("cleaneval", 1, "http://host22.example/22", "0.6271186440677966", "1.0", "0.4567901234567901"),
        ("cleaneval", 2, "http://host36.example/406", "0.639344262295082", "1.0", "0.46987951807228917"),
        ("cleaneval", 3, "http://host28.example/102", "0.6417910447761194", "1.0", "0.4725274725274725"),
        ("cleaneval", 4, "http://skew.example/200", "0.7096774193548387", "0.6197183098591549", "0.8301886792452831"),
        ("cleaneval", 5, "http://host14.example/88", "0.721311475409836", "0.6197183098591549", "0.8627450980392157"),
        ("cleaneval", 6, "http://host7.example/488", "0.7272727272727273", "0.5714285714285714", "1.0"),
        ("cleaneval", 7, "http://skew.example/120", "0.7326732673267327", "0.578125", "1.0"),
        ("cleaneval", 8, "http://host20.example/168", "0.7476635514018691", "0.5970149253731343", "1.0"),
        ("cleaneval", 9, "http://skew.example/440", "0.7567567567567568", "0.6086956521739131", "1.0"),
        ("cleaneval", 10, "http://host30.example/104", "0.7652173913043477", "0.6197183098591549", "1.0"),
        ("googlenews", 1, "http://host33.example/70", "0.6176470588235294", "1.0", "0.44680851063829785"),
        ("googlenews", 2, "http://host0.example/296", "0.7083333333333333", "0.6538461538461539", "0.7727272727272727"),
        ("googlenews", 3, "http://host28.example/472", "0.7378640776699029", "0.5846153846153846", "1.0"),
        ("googlenews", 4, "http://host4.example/152", "0.7428571428571429", "0.5909090909090909", "1.0"),
        ("googlenews", 5, "http://host35.example/72", "0.7567567567567568", "0.6086956521739131", "1.0"),
        ("googlenews", 6, "http://host10.example/232", "0.759124087591241", "0.6582278481012658", "0.896551724137931"),
        ("googlenews", 7, "http://host9.example/379", "0.7692307692307693", "1.0", "0.625"),
        ("googlenews", 8, "http://host25.example/136", "0.8235294117647058", "0.7", "1.0"),
        ("googlenews", 9, "http://host3.example/373", "0.8235294117647058", "1.0", "0.7"),
        ("googlenews", 10, "http://host16.example/312", "0.8322981366459626", "0.7127659574468085", "1.0"),
    ],
}


def _worst_docs_sql() -> str:
    rows = ",\n  ".join(
        f"({n_ev}, 'justext_spark', '{ds}', CAST({rk} AS INTEGER), '{url}', "
        # string->double (strtod) is correctly rounded; a bare decimal
        # literal goes through DECIMAL and can lose the last ulp
        f"CAST('{f1}' AS DOUBLE), CAST('{p}' AS DOUBLE), CAST('{r}' AS DOUBLE))"
        for n_ev, rs in _WORST_DOCS_CONST.items()
        for (ds, rk, url, f1, p, r) in rs
    )
    return f"""
SELECT extractor, dataset, worst_rank, url, f1, precision, recall FROM (VALUES
  {rows}
) t(n_events, extractor, dataset, worst_rank, url, f1, precision, recall)
WHERE n_events = (SELECT COUNT(*) FROM events)
"""


def _extracted_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.extract import extract_pages_density, extracted_clean, latest_crawl
    from ..sources.readers import pages_df

    pages = pages_df(spark, sf_dir, n_partitions=16)
    return extracted_clean(extract_pages_density(latest_crawl(pages)))


def density_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-parity gate for the SECOND extractor (densometric WSDM-2010
    rules): same order-independent fingerprint shape as
    extract_text_fingerprint, constants frozen from the pandas oracle
    twin (oracle_extract_density)."""
    ex = _extracted_density(spark, sf_dir)
    key = F.concat_ws(
        "|",
        "url",
        "lang",
        "status",
        F.col("n_paragraphs").cast("string"),
        F.col("n_good").cast("string"),
        F.coalesce(F.col("text"), F.lit("")),
    )
    return ex.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(_fp48(key)).alias("fp_sum")
    )


_DENSITY_FP_SQL = """
SELECT n_rows, fp_sum FROM (VALUES
  (1000,  CAST(500 AS BIGINT), CAST(72656019036639518 AS BIGINT)),
  (10000, CAST(500 AS BIGINT), CAST(70358403449349225 AS BIGINT))
) t(n_events, n_rows, fp_sum)
WHERE n_events = (SELECT COUNT(*) FROM events)
"""


def extractor_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference harness's core deliverable: multiple extractors
    scored against the same gold and RANKED per dataset (W1). Both
    extraction kernels run over the same latest-crawl pages; scores are
    unioned and fed to ranked_report; the driver-hashed output keeps
    the integer/string columns (rank order is decided by avg macro-F1
    internally — floats stay out of the hash). Oracle = frozen VALUES
    from the pandas oracle running both extractors."""
    from ..operators.report import ranked_report
    from ..operators.score import score_extracted
    from ..sources.readers import gold_df

    gold = gold_df(spark, sf_dir)
    scores = score_extracted(
        _extracted(spark, sf_dir), gold, extractor="justext_spark"
    ).unionByName(
        score_extracted(_extracted_density(spark, sf_dir), gold, extractor="textdensity")
    )
    return ranked_report(scores).select(
        "dataset", "rank", "extractor", "n_ok", "n_empty", "n_fail"
    )


_EXTRACTOR_RANKING_CONST: dict[int, list[tuple]] = {
    1000: [
        ("cleaneval", 1, "justext_spark", 138, 112, 0),
        ("cleaneval", 2, "textdensity", 197, 53, 0),
        ("googlenews", 1, "justext_spark", 143, 107, 0),
        ("googlenews", 2, "textdensity", 198, 52, 0),
    ],
    10000: [
        ("cleaneval", 1, "justext_spark", 139, 111, 0),
        ("cleaneval", 2, "textdensity", 199, 51, 0),
        ("googlenews", 1, "justext_spark", 135, 115, 0),
        ("googlenews", 2, "textdensity", 200, 50, 0),
    ],
}


def _extractor_ranking_sql() -> str:
    rows = ",\n  ".join(
        f"({n_ev}, '{ds}', CAST({rk} AS INTEGER), '{ex}', CAST({n_ok} AS BIGINT), "
        f"CAST({n_empty} AS BIGINT), CAST({n_fail} AS BIGINT))"
        for n_ev, rs in _EXTRACTOR_RANKING_CONST.items()
        for (ds, rk, ex, n_ok, n_empty, n_fail) in rs
    )
    return f"""
SELECT dataset, rank, extractor, n_ok, n_empty, n_fail FROM (VALUES
  {rows}
) t(n_events, dataset, rank, extractor, n_ok, n_empty, n_fail)
WHERE n_events = (SELECT COUNT(*) FROM events)
"""


def corpus_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language EXACT length percentiles (p50/p90/p99, linear
    interpolation) — corpus profiling for filter-threshold tuning.
    Exact (sort-based) rather than approx_percentile: t-digest /
    GK sketches are engine-specific, so the approximate variants can
    never be oracle-checked; at 100 TB swap in approx_percentile and
    keep this as the audit query on samples."""
    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90_chars"),
        F.round(F.percentile("n_chars", F.lit(0.99)), 4).alias("p99_chars"),
    )


_PERCENTILES_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
       ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
       ROUND(quantile_cont(n_chars, 0.99), 4) AS p99_chars
FROM documents GROUP BY lang
"""


def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width length histogram per language (bucket = n_chars div
    100) — map-side bucketing + hash aggregate, the shape that profiles
    a 100 TB corpus in one pass."""
    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    return (
        docs.withColumn("bucket_lo", F.expr("(n_chars div 100) * 100"))
        .groupBy("lang", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_HISTOGRAM_SQL = """
SELECT lang, (n_chars // 100) * 100 AS bucket_lo, COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


def q_events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column surface (§2.10): parse the JSON props into
    map<string,string>, explode, and census keys per event type —
    from_json + explode(map) stay whole-stage-codegen'd JVM ops."""
    ev = _t(spark, sf_dir, "events").select("event_type", "props")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select("event_type", F.explode(m).alias("prop_key", "prop_value"))
        .groupBy("event_type", "prop_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("prop_value").alias("n_distinct_values"),
        )
    )


# JSON -> MAP(VARCHAR,VARCHAR) cast (true key/value pairs), not a
# '$.' || key path rebuild: a path string breaks for keys containing
# '.', quotes, or brackets, so the twin would silently depend on
# fixture key shapes (ADVICE r2). The MAP cast mirrors Spark's
# from_json map<string,string> (scalar values unquoted, nested values
# as JSON text).
_EVENTS_PROPS_MAP_SQL = """
SELECT event_type, u.entry.key AS prop_key, COUNT(*) AS n,
       COUNT(DISTINCT u.entry.value) AS n_distinct_values
FROM (
  SELECT event_type,
         unnest(map_entries(CAST(props::JSON AS MAP(VARCHAR, VARCHAR)))) AS entry
  FROM events
) u
GROUP BY 1, 2
"""


def ann_quality_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline composition: similarity search restricted to documents
    that pass the C4-style quality gate — the embed-then-filter shape a
    training-data mix actually runs (corpus gate -> LEFT SEMI join onto
    the embedding table on vec_id == doc_id -> exact cosine top-k).
    The semi join prunes the scan side BEFORE the distance work."""
    from ..operators.similarity import brute_force_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim("text"), r"\s+")
    n_tok = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    ).cast("double") / n_tok
    stop_ratio = (
        F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS_SORTED))).cast(
            "double"
        )
        / n_tok
    )
    keep_ids = docs.filter(
        (n_tok >= 50) & (mean_len >= 3.0) & (mean_len <= 10.0) & (stop_ratio >= 0.05)
    ).select(F.col("doc_id").alias("vec_id"))
    emb = _t(spark, sf_dir, "embeddings").join(keep_ids, "vec_id", "left_semi")
    r = brute_force_topk(emb, list(range(10)), k=5)
    return r.select(
        "query_id", "neighbor_id", "nn_rank", F.round("cos", 4).alias("cos_sim")
    )


_ANN_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
), keep AS (
  SELECT doc_id FROM (
    SELECT doc_id, len(toks) AS n_tok,
           CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) / len(toks) AS mean_len,
           CAST(len(list_filter(toks, w -> list_contains([{_STOP_SQL}], lower(w)))) AS DOUBLE) / len(toks) AS stop_ratio
    FROM t
  ) WHERE n_tok >= 50 AND mean_len >= 3.0 AND mean_len <= 10.0 AND stop_ratio >= 0.05
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id IN (SELECT doc_id FROM keep)
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), q AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10
), s AS (
  SELECT query_id, n.vec_id AS neighbor_id,
         list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN n ON n.vec_id <> query_id
), r AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS nn_rank
  FROM s
)
SELECT query_id, neighbor_id, nn_rank, ROUND(cos, 4) AS cos_sim
FROM r WHERE nn_rank <= 5
"""


_PIVOT_SOURCES = ["src0", "src1", "src2", "src3"]


def lang_source_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface: doc counts per language with one column per
    (fixed, enumerated) source — ``pivot(col, values)`` with explicit
    values keeps the plan a single pass (no extra distinct-values job)
    and is the only scalable form at 100 TB; the long-tail stays in
    n_other. The oracle replays it as conditional aggregation (what a
    pivot lowers to)."""
    docs = _t(spark, sf_dir, "documents").select("lang", "source")
    wide = (
        docs.groupBy("lang")
        .pivot("source", _PIVOT_SOURCES)
        .agg(F.count(F.lit(1)))
    )
    for s in _PIVOT_SOURCES:
        wide = wide.withColumnRenamed(s, f"n_{s}").withColumn(
            f"n_{s}", F.coalesce(F.col(f"n_{s}"), F.lit(0))
        )
    other = docs.filter(~F.col("source").isin(_PIVOT_SOURCES)).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_other")
    )
    return wide.join(other, "lang", "left").withColumn(
        "n_other", F.coalesce("n_other", F.lit(0))
    )


def _pivot_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN source = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{s}"
        for s in _PIVOT_SOURCES
    )
    not_in = ", ".join(f"'{s}'" for s in _PIVOT_SOURCES)
    return f"""
SELECT lang,
       {cols},
       CAST(SUM(CASE WHEN source NOT IN ({not_in}) THEN 1 ELSE 0 END) AS BIGINT) AS n_other
FROM documents GROUP BY lang
"""


def kmeans_embeddings(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding table — the
    iterative-algorithm shape (like connected_components) done entirely
    as composed DataFrame ops with ZERO driver actions: per iteration,
    centroids collapse to a one-row broadcast array, assignment is a
    map-side integer argmin (no shuffle), and the update is one
    (cell, dim) hash aggregate. At 10^9 vectors each iteration is one
    shuffle of (cell, dim, q) partial sums — partial-agg friendly.

    Determinism across engines: vectors are quantized to integers
    (floor(x * 1e6)), so distances and centroid updates are EXACT
    integer arithmetic — no float-sum ordering anywhere — and Spark's
    ``div`` matches DuckDB's ``//`` (both truncate toward zero).
    Init = first k vectors (production swaps in k-means|| sampling).
    Emits (cid, n_members, dim_idx, centroid_q)."""
    cent = _kmeans_centroids(spark, sf_dir, k, iters)
    return cent.select(
        "cid",
        "n_members",
        F.posexplode("cq").alias("dim_idx", "centroid_q"),
    )


def _kmeans_centroids(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """(cid, cq: array<bigint>, n_members) after ``iters`` Lloyd
    updates — the composable form (ann_ivf_kmeans_topk feeds these
    into the IVF probe as its coarse quantizer)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = F.transform("v", lambda x: F.floor(x * 1e6).cast("bigint"))
    base = emb.select("vec_id", qv.alias("qv"))
    cent = base.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("qv").alias("cq")
    )
    assigned = None
    for _ in range(iters):
        cent_arr = cent.select(F.struct("cid", "cq").alias("c")).agg(
            F.collect_list("c").alias("cents")
        )
        scored = F.transform(
            F.col("cents"),
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(F.col("qv"), c["cq"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                c["cid"].alias("cid"),
            ),
        )
        assigned = base.join(F.broadcast(cent_arr)).withColumn(
            "cell", F.element_at(F.array_sort(scored), 1)["cid"]
        )
        upd = (
            assigned.select("cell", F.posexplode("qv").alias("d", "q"))
            .groupBy("cell", "d")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("cell", "d", "n", F.expr("s div n").alias("cq"))
        )
        cent = (
            upd.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "cq"))),
                    lambda p: p["cq"],
                ).alias("cq"),
                F.min("n").alias("n_members"),
            )
            .select(F.col("cell").cast("int").alias("cid"), "cq", "n_members")
        )
    return cent


def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the LEARNED coarse quantizer: k-means centroids
    (integer-exact Lloyd iterations) dequantized to doubles feed the
    same map-side-argmin probe as ann_ivf_topk — the production IVF
    composition the first-k variant stubs."""
    base = _emb_with_norm(spark, sf_dir)
    cv = F.transform("cq", lambda x: x / F.lit(1e6))
    cent = _kmeans_centroids(spark, sf_dir).select(
        "cid", cv.alias("cv")
    )
    cn = F.sqrt(
        F.aggregate(F.transform("cv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    cent = cent.withColumn("cn", cn)
    return _ivf_probe(base, cent, nprobe=2, topk=3, n_queries=10)


def _kmeans_ctes(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """The WITH-clause body shared by _kmeans_sql and _ivf_kmeans_sql."""
    parts = [
        f"""WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
  FROM embeddings
), ev AS (
  SELECT vec_id, d, qv[d] AS q FROM e, range(1, {dim + 1}) t(d)
), c0 AS (
  SELECT vec_id AS cid, d, qv[d] AS cq, 1 AS n
  FROM e, range(1, {dim + 1}) t(d) WHERE vec_id < {k}
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""", dist{i} AS (
  SELECT ev.vec_id, c.cid, SUM((ev.q - c.cq) * (ev.q - c.cq)) AS dist
  FROM ev JOIN c{i - 1} c ON ev.d = c.d
  GROUP BY 1, 2
), a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM dist{i}
  ) WHERE rn = 1
), c{i} AS (
  SELECT a.cid, ev.d, CAST(SUM(ev.q) // COUNT(*) AS BIGINT) AS cq,
         COUNT(*) AS n
  FROM a{i} a JOIN ev ON ev.vec_id = a.vec_id
  GROUP BY 1, 2
)""")
    return "".join(parts)


def _kmeans_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    return _kmeans_ctes(k, iters, dim) + f"""
SELECT CAST(cid AS INTEGER) AS cid, CAST(n AS BIGINT) AS n_members,
       CAST(d - 1 AS INTEGER) AS dim_idx, cq AS centroid_q
FROM c{iters}
"""


def _ivf_kmeans_sql(
    k: int = 8, iters: int = 3, dim: int = 64,
    nprobe: int = 2, topk: int = 3, n_queries: int = 10,
) -> str:
    """IVF probe over the k-means centroids: the kmeans CTE chain plus
    the same cosine/rank logic as _IVF_SQL, with centroid vectors
    reassembled as ordered lists and dequantized (cq / 1e6 — exact in
    doubles) so list_dot_product mirrors the Spark fold."""
    return _kmeans_ctes(k, iters, dim) + f""", cent AS (
  SELECT CAST(cid AS INTEGER) AS cid,
         list_transform(list(cq ORDER BY d), x -> x / 1000000.0) AS cv
  FROM c{iters} GROUP BY cid
), centn AS (
  SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent
), nv AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
), ranked AS (
  SELECT nv.vec_id, nv.v, nv.nrm, centn.cid,
         ROW_NUMBER() OVER (
           PARTITION BY nv.vec_id
           ORDER BY list_dot_product(nv.v, centn.cv) / (nv.nrm * centn.cn) DESC, centn.cid
         ) AS crank
  FROM nv CROSS JOIN centn
), cells AS (
  SELECT vec_id, v, nrm, cid AS cell FROM ranked WHERE crank = 1
), probes AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid AS cell
  FROM ranked WHERE vec_id < {n_queries} AND crank <= {nprobe}
), scored AS (
  SELECT query_id, cells.vec_id AS neighbor_id,
         list_dot_product(qv, cells.v) / (qn * cells.nrm) AS cos
  FROM probes JOIN cells USING (cell)
  WHERE cells.vec_id <> query_id
), top AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS nn_rank
  FROM scored
)
SELECT query_id, neighbor_id, nn_rank, ROUND(cos, 4) AS cos_sim
FROM top WHERE nn_rank <= {topk}
"""


def extract_report_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship evaluation report in driver-hashable EXACT-INTEGER
    form: per (extractor, dataset) status counts, floor(1e9 * metric)
    sums over ok docs (order-independent integer sums of the bitwise-
    deterministic per-doc P/R/F1), and the micro token counters. The
    float report (`extract_report`) stays the human-facing entry; this
    twin is what a cross-engine hash can gate — macro-F1 is
    sum_f1_q9 / 1e9 / n_ok to within 1e-9."""
    from ..operators.score import score_extracted
    from ..sources.readers import gold_df

    gold = gold_df(spark, sf_dir)
    scores = score_extracted(
        _extracted(spark, sf_dir), gold, extractor="justext_spark"
    ).unionByName(
        score_extracted(_extracted_density(spark, sf_dir), gold, extractor="textdensity")
    )
    ok = F.col("status") == "ok"
    return scores.groupBy("extractor", "dataset").agg(
        F.count(F.when(ok, 1)).alias("n_ok"),
        F.count(F.when(F.col("status") == "empty", 1)).alias("n_empty"),
        F.count(F.when(~ok & (F.col("status") != "empty"), 1)).alias("n_fail"),
        F.sum(F.when(ok, _q9("precision")).otherwise(F.lit(0))).alias("sum_p_q9"),
        F.sum(F.when(ok, _q9("recall")).otherwise(F.lit(0))).alias("sum_r_q9"),
        F.sum(F.when(ok, _q9("f1")).otherwise(F.lit(0))).alias("sum_f1_q9"),
        F.sum("matched").alias("micro_matched"),
        F.sum("retrieved").alias("micro_retrieved"),
        F.sum("relevant").alias("micro_relevant"),
    )


_REPORT_EXACT_CONST: dict[int, list[tuple]] = {
    1000: [
        ("justext_spark", "cleaneval", 138, 112, 0, 133010979488, 130898948037, 130860694132, 8916, 9372, 14032),
        ("justext_spark", "googlenews", 143, 107, 0, 139255958514, 135660561391, 136273997358, 9196, 9509, 13907),
        ("textdensity", "cleaneval", 197, 53, 0, 128023913366, 151166666666, 138049657993, 9959, 12083, 14032),
        ("textdensity", "googlenews", 198, 52, 0, 133748524090, 154272727272, 142783450014, 10336, 12286, 13907),
    ],
    10000: [
        ("justext_spark", "cleaneval", 139, 111, 0, 133043470709, 133216590207, 132166265771, 9000, 9512, 13664),
        ("justext_spark", "googlenews", 135, 115, 0, 131516997098, 129117426985, 129670080334, 8779, 9065, 13501),
        ("textdensity", "cleaneval", 199, 51, 0, 131570597340, 154488413546, 141460486883, 9973, 12064, 13664),
        ("textdensity", "googlenews", 200, 50, 0, 129475690585, 149490566036, 137873269940, 9764, 11702, 13501),
    ],
}


def _report_exact_sql() -> str:
    rows = ",\n  ".join(
        f"({n_ev}, '{ex}', '{ds}', CAST({n_ok} AS BIGINT), CAST({n_e} AS BIGINT), "
        f"CAST({n_f} AS BIGINT), CAST({p} AS BIGINT), CAST({r} AS BIGINT), "
        f"CAST({f1} AS BIGINT), CAST({mm} AS BIGINT), CAST({mr} AS BIGINT), "
        f"CAST({mv} AS BIGINT))"
        for n_ev, rs in _REPORT_EXACT_CONST.items()
        for (ex, ds, n_ok, n_e, n_f, p, r, f1, mm, mr, mv) in rs
    )
    return f"""
SELECT extractor, dataset, n_ok, n_empty, n_fail, sum_p_q9, sum_r_q9, sum_f1_q9,
       micro_matched, micro_retrieved, micro_relevant
FROM (VALUES
  {rows}
) t(n_events, extractor, dataset, n_ok, n_empty, n_fail, sum_p_q9, sum_r_q9,
    sum_f1_q9, micro_matched, micro_retrieved, micro_relevant)
WHERE n_events = (SELECT COUNT(*) FROM events)
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

SQL_CHECKED = {
    "q1_pricing_summary": (q1_pricing_summary, _Q1_SQL),
    "q_top_customers": (q_top_customers, _TOP_CUST_SQL),
    "q_nation_revenue": (q_nation_revenue, _NATION_REV_SQL),
    "q_customers_without_orders": (q_customers_without_orders, _ANTI_SQL),
    "q_urgent_shipped_orders": (q_urgent_shipped_orders, _SEMI_SQL),
    "q_rank_customers_window": (q_rank_customers_window, _RANK_SQL),
    "q_rollup_order_counts": (q_rollup_order_counts, _ROLLUP_SQL),
    "q_events_hourly": (q_events_hourly, _EVENTS_HOURLY_SQL),
    "q_event_sessions": (q_event_sessions, _SESSIONS_SQL),
    "q_min_cost_supplier": (q_min_cost_supplier, _MIN_COST_SQL),
    "q_events_json": (q_events_json, _EVENTS_JSON_SQL),
    "text_token_stats": (text_token_stats, _TOKEN_STATS_SQL),
    "text_quality": (text_quality, _TEXT_QUALITY_SQL),
    "doc_fingerprint": (doc_fingerprint, _FINGERPRINT_SQL),
    "dedup_exact": (dedup_exact, _DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, _JACCARD_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, _minhash_sql()),
    "dedup_minhash_verified": (dedup_minhash_verified, _minhash_verified_sql()),
    "dedup_components": (dedup_components, _components_sql()),
    "dedup_keep_census": (dedup_keep_census, _keep_census_sql()),
    "doc_rolling_fingerprints": (doc_rolling_fingerprints, _ROLLING_FP_SQL),
    "dedup_simhash": (dedup_simhash, _simhash_sql(pairs=False)),
    "dedup_simhash_pairs": (dedup_simhash_pairs, _simhash_sql(pairs=True)),
    "lang_distribution": (lang_distribution, _LANG_DIST_SQL),
    "ann_cosine_topk": (ann_cosine_topk, _ANN_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, _emb_cosine_sql()),
    "q_events_asof_join": (q_events_asof_join, _ASOF_SQL),
    "ann_ivf_topk": (ann_ivf_topk, _IVF_SQL),
    "q3_shipping_priority": (q3_shipping_priority, _Q3_SQL),
    "q14_promo_revenue": (q14_promo_revenue, _Q14_SQL),
    "q_cube_order_stats": (q_cube_order_stats, _CUBE_SQL),
    "embedding_norms": (embedding_norms, _EMB_NORMS_SQL),
    "media_features": (media_features, _MEDIA_FEATURES_SQL),
    "lang_id": (lang_id_query, _lang_id_sql()),
    "pdf_pages": (pdf_pages_query, _PDF_PAGES_SQL),
    "extract_text_fingerprint": (extract_text_fingerprint, _TEXT_FP_SQL),
    "extract_spans_fingerprint": (extract_spans_fingerprint, _SPANS_FP_SQL),
    "doc_scores_fingerprint": (doc_scores_fingerprint, _SCORES_FP_SQL),
    "status_counts": (status_counts_query, _STATUS_COUNTS_SQL),
    "worst_documents": (worst_documents_query, _worst_docs_sql()),
    "ann_lsh_topk": (ann_lsh_topk_query, _ann_lsh_sql()),
    "doc_sample_stratified": (doc_sample_stratified, _sample_sql()),
    "quality_filter": (quality_filter, _QUALITY_FILTER_SQL),
    "density_text_fingerprint": (density_text_fingerprint, _DENSITY_FP_SQL),
    "extractor_ranking": (extractor_ranking, _extractor_ranking_sql()),
    "doc_containment": (doc_containment, _CONTAINMENT_SQL),
    "kmeans_embeddings": (kmeans_embeddings, _kmeans_sql()),
    "ann_ivf_kmeans_topk": (ann_ivf_kmeans_topk, _ivf_kmeans_sql()),
    "corpus_length_percentiles": (corpus_length_percentiles, _PERCENTILES_SQL),
    "corpus_length_histogram": (corpus_length_histogram, _HISTOGRAM_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, _Q5_SQL),
    "extract_report_exact": (extract_report_exact, _report_exact_sql()),
    "lang_source_pivot": (lang_source_pivot, _pivot_sql()),
    "ann_quality_filtered_topk": (ann_quality_filtered_topk, _ANN_QUALITY_SQL),
    "q_events_props_map": (q_events_props_map, _EVENTS_PROPS_MAP_SQL),
    "q_events_range_join": (q_events_range_join, _RANGE_JOIN_SQL),
}
