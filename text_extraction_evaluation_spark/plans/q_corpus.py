"""Corpus text-stats + dedup tiers (exact, n-gram Jaccard,
MinHash-LSH, components, keep-list, winnowing containment, SimHash).

Split out of plans/queries.py (round 3)."""

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
    word_shingles_all,
)
from ..algo.stoplists import _SYNTH_STOPWORDS
from .common import (  # noqa: F401 — shared helpers + SQL fragments
    STOPWORDS_SORTED,
    _STOP_SQL,
    _dec,
    _docs_par,
    _t,
)


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
    oracle SQL. The cap is applied as a COUNT window over the shingle
    key, not a separate aggregate + anti-join: the window's exchange
    IS the shuffle the pair join needs anyway, so Catalyst's
    ReusedExchange evaluates the CPU-bound tokenize+shingle+explode
    lineage once instead of once per branch (r2-review finding). The
    fixture corpus has no hot shingles, so the cap is semantics-
    preserving there; tests/test_dedup.py plants a hot shingle and
    asserts the bounded pair count."""
    docs = _docs_par(spark, sf_dir)
    sh = docs.select(
        "doc_id", word_shingles(tokens_col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    inv = (
        sh.select("doc_id", F.explode("sh").alias("s"))
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .filter(F.col("df") <= NGRAM_MAX_DF)
        .drop("df")
    )
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


def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.8 pairs via PREFIX FILTERING (Chaudhuri,
    Ganti & Kaushik 2006; Xiao et al. 2008 PPJoin) — the LOSSLESS
    at-scale alternative to dedup_ngram_jaccard's df cap: instead of
    dropping hot shingles (changing the metric), index only each
    document's PREFIX — its L = n - ceil(0.8*n) + 1 globally RAREST
    shingles. The prefix-filter theorem guarantees two sets with
    Jaccard >= t share at least one prefix token, so the candidate
    equi-join over prefixes misses nothing, and because prefixes hold
    the rarest tokens first, bucket sizes shrink exactly where the
    naive index explodes. Candidates are then verified with the exact
    full-set Jaccard (array_intersect), so the output EQUALS the brute
    all-pairs twin bit for bit (asserted in tests/test_dedup.py).

    ceil is pure integer arithmetic ((4n + 4) div 5) — no float
    boundary to drift cross-engine. Shuffles: one shingle-key window
    (df), one doc-key window (prefix rank), the prefix equi-join, and
    the verify join — all keyed, no nested loop."""
    docs = _docs_par(spark, sf_dir)
    sh = docs.select(
        "doc_id", word_shingles(tokens_col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    inv = sh.select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s"))
    ranked = inv.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("s"))
    ).withColumn(
        "pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s"))
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.expr("(4 * n + 4) div 5") + 1
    ).select("doc_id", "s")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .distinct()
    )
    x = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    return (
        cand.join(x, "doc_id_a")
        .join(y, "doc_id_b")
        .filter(jac >= 0.8)
        .select("doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard"))
    )


_JACCARD_PREFIX_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS sl
  FROM t WHERE len(w) >= 3
), inv AS (
  SELECT doc_id, unnest(sl) AS s FROM sh
), dft AS (
  SELECT s, COUNT(*) AS df FROM inv GROUP BY s
), ranked AS (
  SELECT inv.doc_id, inv.s,
         ROW_NUMBER() OVER (PARTITION BY inv.doc_id ORDER BY dft.df, inv.s) AS pos
  FROM inv JOIN dft USING (s)
), sizes AS (
  SELECT doc_id, len(sl) AS n FROM sh
), prefix AS (
  SELECT r.doc_id, r.s
  FROM ranked r JOIN sizes z USING (doc_id)
  WHERE r.pos <= z.n - ((4 * z.n + 4) // 5) + 1
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM prefix a JOIN prefix b ON a.s = b.s AND a.doc_id < b.doc_id
), v AS (
  SELECT c.doc_id_a, c.doc_id_b,
         len(list_intersect(x.sl, y.sl)) AS inter,
         len(x.sl) AS na, len(y.sl) AS nb
  FROM cand c JOIN sh x ON x.doc_id = c.doc_id_a
              JOIN sh y ON y.doc_id = c.doc_id_b
)
SELECT doc_id_a, doc_id_b,
       ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
FROM v WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8
"""


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
    both the join and the size terms — as a COUNT window over the
    fingerprint key, whose exchange the pair join reuses
    (ReusedExchange: the sketch lineage evaluates once, r2-review
    finding). The oracle SQL applies the identical cap, so the check
    stays exact over the capped sketch universe."""
    from ..operators.textstats import rolling_fingerprints

    fps = (
        rolling_fingerprints(_docs_par(spark, sf_dir), window=5, keep_mod=8)
        .withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("df") <= CONTAINMENT_MAX_DF)
        .drop("df")
    )
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


# Token-span exact-substring dedup (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better" — the ExactSubstr tier).
# 50 tokens in the paper; 15 keeps fixture docs (10-99 tokens) in range.
DUP_SPAN_L = 15


def _dup_span_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, p) of every L-token window whose content hash
    occurs >= 2 times corpus-wide (any repeat counts, same-doc
    included — the paper's rule). Scale shape: window hashes are pure
    map-side (slice+zip shingles, explode factor = tokens/doc), the
    dup set is ONE map-side-combinable hash aggregate, and flagging is
    a hash equi-join back — there is NO position-pair join anywhere,
    so a window repeated k times costs O(k) rows, never O(k^2)."""
    L = DUP_SPAN_L
    t = _docs_par(spark, sf_dir).select(
        "doc_id", tokens_col("text").alias("w")
    )
    pos = t.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.posexplode(word_shingles_all(F.col("w"), L)).alias("p0", "sh"),
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("p0") + 1).alias("p"),
        F.md5("sh").alias("h"),
    )
    dup = (
        pos.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )
    return pos.join(dup.select("h"), "h").select("doc_id", "n_tokens", "p")


def _dup_spans(flagged: DataFrame) -> DataFrame:
    """Merge flagged windows into MAXIMAL duplicated spans per doc:
    interval union via a running max of window ends (a new span starts
    where a window clears everything before it). The window is
    per-doc — bounded by document length, parallel across docs."""
    L = DUP_SPAN_L
    wn = Window.partitionBy("doc_id").orderBy("p")
    prev_end = F.max(F.col("p") + (L - 1)).over(
        wn.rowsBetween(Window.unboundedPreceding, -1)
    )
    s = flagged.withColumn(
        "ns",
        F.when(prev_end.isNull() | (F.col("p") > prev_end), 1).otherwise(0),
    ).withColumn("span_id", F.sum("ns").over(wn))
    return s.groupBy("doc_id", "n_tokens", "span_id").agg(
        F.min("p").alias("s"), (F.max("p") + (L - 1)).alias("e")
    )


def dup_span_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr detection census: per affected document, how many
    maximal duplicated token spans it carries and what fraction of its
    tokens they cover — the measure-before-cut stage of span-level
    dedup (doc-level minhash and line-level dedup live in their own
    entries; this is the granularity between them)."""
    per = _dup_spans(_dup_span_flagged(spark, sf_dir))
    return (
        per.groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.col("dup_tokens").cast("double") / F.col("n_tokens"), 6
            ),
        )
    )


_DUP_SPAN_CENSUS_SQL = f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
pos AS (
  SELECT doc_id, len(w) AS n_tokens, p,
         md5(array_to_string(w[p:p+{DUP_SPAN_L - 1}], ' ')) AS h
  FROM d, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(w) - {DUP_SPAN_L - 1}, 0))) AS p
  ) _
),
dup AS (SELECT h FROM pos GROUP BY h HAVING count(*) >= 2),
f AS (SELECT doc_id, n_tokens, p FROM pos JOIN dup USING (h)),
m AS (
  SELECT doc_id, n_tokens, p,
         max(p + {DUP_SPAN_L - 1}) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_end
  FROM f
),
s AS (
  SELECT doc_id, n_tokens, p,
         CASE WHEN prev_end IS NULL OR p > prev_end THEN 1 ELSE 0 END AS ns
  FROM m
),
sp AS (
  SELECT doc_id, n_tokens, p,
         sum(ns) OVER (PARTITION BY doc_id ORDER BY p) AS span_id
  FROM s
),
per AS (
  SELECT doc_id, n_tokens, span_id,
         min(p) AS sp_s, max(p) + {DUP_SPAN_L - 1} AS sp_e
  FROM sp GROUP BY doc_id, n_tokens, span_id
)
SELECT doc_id, n_tokens,
       CAST(count(*) AS BIGINT) AS n_dup_spans,
       CAST(sum(sp_e - sp_s + 1) AS BIGINT) AS dup_tokens,
       round(CAST(sum(sp_e - sp_s + 1) AS DOUBLE) / n_tokens, 6) AS dup_frac
FROM per GROUP BY doc_id, n_tokens
"""


def dup_span_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr cleaning: drop every duplicated span's tokens from
    every document and pin the cleaned corpus byte-for-byte (md5 of
    the space-joined kept tokens). Policy: ALL occurrences are
    removed (the drop-all variant Lee et al. note performs on par
    with keep-one, and the only policy with no cross-document
    coordination — keep-one needs a global canonical occurrence per
    span, i.e. one more aggregate). Per-doc span lists ride a
    collect_list per doc (bounded by doc length), token filtering is
    a JVM higher-order lambda — no Python in the loop."""
    spans = (
        _dup_spans(_dup_span_flagged(spark, sf_dir))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct(F.col("s"), F.col("e"))).alias("spans"))
    )
    t = _docs_par(spark, sf_dir).select(
        "doc_id", tokens_col("text").alias("w")
    )
    j = t.join(spans, "doc_id", "left").withColumn(
        "spans",
        F.coalesce("spans", F.array().cast("array<struct<s:int,e:int>>")),
    )
    idx = F.transform(
        F.col("w"),
        lambda x, i: F.struct((i + 1).alias("i"), x.alias("t")),
    )
    kept = F.filter(
        idx,
        lambda st: ~F.exists(
            F.col("spans"),
            lambda sp: (sp["s"] <= st["i"]) & (st["i"] <= sp["e"]),
        ),
    )
    return j.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.transform(kept, lambda st: st["t"]).alias("kt"),
    ).select(
        "doc_id",
        "n_tokens",
        F.size("kt").alias("n_kept"),
        F.md5(F.concat_ws(" ", "kt")).alias("clean_fp"),
    )


_DUP_SPAN_CLEAN_SQL = f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
pos AS (
  SELECT doc_id, p, md5(array_to_string(w[p:p+{DUP_SPAN_L - 1}], ' ')) AS h
  FROM d, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(w) - {DUP_SPAN_L - 1}, 0))) AS p
  ) _
),
dup AS (SELECT h FROM pos GROUP BY h HAVING count(*) >= 2),
f AS (SELECT doc_id, p FROM pos JOIN dup USING (h)),
m AS (
  SELECT doc_id, p,
         max(p + {DUP_SPAN_L - 1}) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_end
  FROM f
),
s AS (
  SELECT doc_id, p,
         CASE WHEN prev_end IS NULL OR p > prev_end THEN 1 ELSE 0 END AS ns
  FROM m
),
sp AS (
  SELECT doc_id, p, sum(ns) OVER (PARTITION BY doc_id ORDER BY p) AS span_id
  FROM s
),
per AS (
  SELECT doc_id, span_id, min(p) AS sp_s, max(p) + {DUP_SPAN_L - 1} AS sp_e
  FROM sp GROUP BY doc_id, span_id
),
cov AS (
  SELECT doc_id, unnest(generate_series(sp_s, sp_e)) AS i FROM per
),
tok AS (
  SELECT doc_id, i, w[i] AS t
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) _
),
kept AS (
  SELECT tok.doc_id, tok.i, tok.t
  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.i
  WHERE cov.i IS NULL
),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(t, ' ' ORDER BY i) AS ct
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, len(d.w) AS n_tokens,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       md5(coalesce(a.ct, '')) AS clean_fp
FROM d LEFT JOIN agg a USING (doc_id)
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


def dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup ANALYSIS report: the near-dup cluster-SIZE distribution —
    how many duplicate groups of each size the corpus holds, with the
    doc mass they account for. The standard post-dedup diagnostic: a
    long tail of giant clusters means template spam (act upstream);
    mostly pairs means organic re-posts. Composes the components
    output with two bounded aggregates — (component) then (size) —
    both map-side-combining; nothing here grows with corpus size
    beyond the component table itself."""
    comp = dedup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )


def _cluster_hist_sql() -> str:
    return f"""
WITH comp AS ({_components_sql()}),
sizes AS (
  SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY 1
)
SELECT cluster_size, COUNT(*) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
FROM sizes GROUP BY 1
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


def dedup_keep_best_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup removal with the PRODUCTION survivor policy: within
    each connected component keep the highest-value member — here the
    longest document (n_chars, doc_id tiebreak) — instead of
    `dedup_keep_census`'s min-id. Real pipelines keep the best copy
    (longest text, highest quality score, freshest crawl); this query
    proves the survivor policy is a pluggable ranking, not baked into
    the component machinery. Census per language: total / kept /
    dropped, plus the char mass the policy preserved.

    Scale shape: identical to `dedup_keep_census` up to the component
    table; the policy adds one ranking window PARTITIONED BY COMPONENT
    (components are tiny — bounded by near-dup cluster size) and the
    same tiny drop-list broadcast join."""
    from ..operators.dedup import connected_components, verified_near_dup_pairs

    docs = _docs_par(spark, sf_dir)
    pairs = verified_near_dup_pairs(docs, threshold=0.8)
    comp = connected_components(pairs)
    members = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    drops = (
        members.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") > 1)
        .select("doc_id", F.lit(1).alias("dropped"))
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .join(F.broadcast(drops), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                (F.coalesce("dropped", F.lit(0)) == 0).cast("bigint")
            ).alias("n_kept"),
            F.sum(F.coalesce("dropped", F.lit(0))).alias("n_dropped"),
            F.sum(
                F.when(F.coalesce("dropped", F.lit(0)) == 0, F.col("n_chars"))
                .otherwise(0)
                .cast("bigint")
            ).alias("kept_chars"),
        )
    )


def _keep_best_census_sql() -> str:
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
ranked AS (
  SELECT c.doc_id,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.doc_id) AS rk
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
),
drops AS (SELECT doc_id FROM ranked WHERE rk > 1)
SELECT d.lang,
       COUNT(*) AS n_total,
       CAST(COUNT(*) FILTER (WHERE dr.doc_id IS NULL) AS BIGINT) AS n_kept,
       CAST(COUNT(dr.doc_id) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN d.n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
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


# BM25 retrieval constants (Robertson et al.; the standard defaults).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 5


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval over an inverted index — the lexical
    search primitive data pipelines use for RAG curation and
    decontamination lookups. Query terms are picked deterministically
    from the corpus itself (document-frequency ranks 11-15: high-df
    but below the stopword head), so the fixture needs no external
    query set.

    Scale shape: term frequencies and document lengths come out of ONE
    corpus explode + (doc_id, term) hash aggregate that carries dl
    through the same shuffle (no separate dl join); the query-term
    table (5 rows) broadcasts onto the postings, so scoring touches
    only the candidate postings, never the full index; corpus-level N
    and sum(dl) ride as a one-row broadcast. The final top-k window
    partitions by query id over candidate rows only.

    Cross-engine determinism: tf/df/dl/N are exact integers; the one
    transcendental (idf's ln) is quantized to integer micro-nats
    before any ranking (same convention as lm_perplexity_score); the
    remaining arithmetic is identically-ordered double ops from exact
    integers, so scores are bitwise equal and the (score desc, doc_id)
    rank cannot flap."""
    docs = _docs_par(spark, sf_dir)
    tok = tokens_col("text")
    exploded = docs.select(
        "doc_id", F.size(tok).alias("dl"), F.explode(tok).alias("term")
    )
    tf = exploded.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    stats = tf.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    wq = Window.orderBy(F.desc("df"), F.asc("term"))
    qterms = (
        df_.withColumn("r", F.row_number().over(wq))
        .filter((F.col("r") >= 11) & (F.col("r") <= 15))
        .select((F.col("r") - 10).cast("int").alias("qid"), "term", "df")
    )
    cand = tf.join(F.broadcast(qterms), "term").join(F.broadcast(stats))
    idf_q6 = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        * 1e6
    ).cast("bigint")
    dlratio = (F.col("dl") * F.col("n_docs")) / F.col("sum_dl")
    score = (idf_q6 / F.lit(1e6)) * (
        F.col("tf") * F.lit(BM25_K1 + 1.0)
    ) / (
        F.col("tf")
        + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dlratio)
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("doc_id"))
    return (
        cand.withColumn("s", score)
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "qid",
            "term",
            "doc_id",
            "tf",
            F.round("s", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


_BM25_SQL = f"""
WITH tokd AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok FROM documents
), e AS (
  SELECT doc_id, len(tok) AS dl, unnest(tok) AS term FROM tokd
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
  FROM e GROUP BY 1, 2
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl
  FROM (SELECT doc_id, MIN(dl) AS dl FROM tf GROUP BY 1)
), dfx AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), qterms AS (
  SELECT CAST(r - 10 AS INTEGER) AS qid, term, df FROM (
    SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS r FROM dfx
  ) WHERE r BETWEEN 11 AND 15
), cand AS (
  SELECT q.qid, q.term, q.df, tf.doc_id, tf.tf, tf.dl,
         s.n_docs, s.sum_dl
  FROM tf JOIN qterms q USING (term) CROSS JOIN stats s
), scored AS (
  SELECT qid, term, doc_id, tf,
         (CAST(ROUND(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
               AS BIGINT) / 1e6)
         * (tf * {BM25_K1 + 1.0})
         / (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
            * ((dl * n_docs) / CAST(sum_dl AS DOUBLE)))) AS s
  FROM cand
)
SELECT qid, term, doc_id, CAST(tf AS BIGINT) AS tf,
       ROUND(s, 6) AS score, rank
FROM (
  SELECT qid, term, doc_id, tf, s,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, doc_id)
              AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {BM25_TOPK}
"""


# BPE pair census: report the top-N merge candidates of the FIRST
# merge iteration. Subsequent BPE iterations run the identical plan
# over re-segmented words, so this is the inner loop of distributed
# tokenizer training.
BPE_TOP_PAIRS = 30


def bpe_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training, step 1 (Sennrich et al.
    2016): collapse the corpus to a word-frequency table, then count
    adjacent character pairs weighted by word frequency — the merge
    statistics the first BPE iteration maximizes over.

    Scale shape: the corpus-sized work is ONE word hash-aggregate with
    map-side combine (the word vocabulary is tiny relative to the
    corpus, so partial aggregation collapses almost everything before
    the shuffle — the same reason word-count scales). Pair explosion
    runs over the *vocabulary*, not the corpus; the final ranking
    window orders a character-bigram table bounded by alphabet^2 rows,
    so the global window is safe at any corpus size.

    Emits (pair, n_occ, n_forms, rank) for the top
    ``BPE_TOP_PAIRS`` pairs; ties break on the pair string so the
    ranking is deterministic across engines."""
    docs = _docs_par(spark, sf_dir)
    words = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("word")
    )
    wc = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.length("word") >= 2)
    )
    pair = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.length("word") - 1),
            lambda i: F.col("word").substr(i, F.lit(2)),
        )
    )
    pairs = wc.select("word", "n", pair.alias("pair"))
    agg = pairs.groupBy("pair").agg(
        F.sum("n").alias("n_occ"),
        F.count_distinct("word").alias("n_forms"),
    )
    w = Window.orderBy(F.desc("n_occ"), F.asc("pair"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BPE_TOP_PAIRS)
        .select("pair", "n_occ", "n_forms", F.col("rank").cast("int").alias("rank"))
    )


_BPE_PAIR_SQL = f"""
WITH w AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
  FROM documents
), wc AS (
  SELECT word, COUNT(*) AS n FROM w GROUP BY 1 HAVING length(word) >= 2
), p AS (
  SELECT word, n, substr(word, i, 2) AS pair
  FROM (
    SELECT word, n, unnest(generate_series(1, length(word) - 1)) AS i
    FROM wc
  )
), agg AS (
  SELECT pair, SUM(n) AS n_occ, COUNT(DISTINCT word) AS n_forms
  FROM p GROUP BY 1
)
SELECT pair, n_occ, n_forms, rank FROM (
  SELECT pair, CAST(n_occ AS BIGINT) AS n_occ,
         CAST(n_forms AS BIGINT) AS n_forms,
         CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, pair) AS INTEGER) AS rank
  FROM agg
) WHERE rank <= {BPE_TOP_PAIRS}
"""


def readability_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability profiling per language: sentence/word/syllable
    counts and the Flesch reading-ease score — the classic
    text-difficulty gate a curation mix applies next to the C4/Gopher
    heuristics (e.g. keep a target band, or stratify the mix by it).

    Syllables are approximated as vowel-group runs ``[aeiouy]+`` (the
    standard cheap estimator; a space or consonant breaks the run, so
    the text-level count equals the per-word sum). Flesch is computed
    at the LANGUAGE level from exact BIGINT sums —
    ``206.835 - 1.015*(W/S) - 84.6*(Y/W)`` — one fixed IEEE expression
    over exact integers, so it cannot drift with aggregation order or
    engine.

    Scale shape: all three counters are map-side JVM regex/array
    expressions folded by one (lang) hash aggregate with map-side
    combine; no shuffle of text, no window, no join."""
    docs = _docs_par(spark, sf_dir)
    sentences = F.size(
        F.filter(
            F.split("text", r"[.!?]+"),
            lambda x: F.length(F.trim(x)) > 0,
        )
    ).cast("bigint")
    words = F.size(tokens_col("text")).cast("bigint")
    syllables = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
    ).cast("bigint")
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(sentences).alias("n_sentences"),
        F.sum(words).alias("n_words"),
        F.sum(syllables).alias("n_syllables"),
    )
    s = F.greatest("n_sentences", F.lit(1)).cast("double")
    w = F.greatest("n_words", F.lit(1)).cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / s)
        - F.lit(84.6) * (F.col("n_syllables").cast("double") / w)
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.round(flesch, 6).alias("flesch"),
    )


_READABILITY_SQL = """
WITH c AS (
  SELECT lang,
         CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                              x -> trim(x) <> '')) AS BIGINT) AS s,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y
  FROM documents
), agg AS (
  SELECT lang, COUNT(*) AS n_docs, SUM(s) AS n_sentences,
         SUM(w) AS n_words, SUM(y) AS n_syllables
  FROM c GROUP BY 1
)
SELECT lang, n_docs,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       ROUND(206.835
             - 1.015 * (CAST(n_words AS DOUBLE)
                        / CAST(GREATEST(n_sentences, 1) AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE)
                       / CAST(GREATEST(n_words, 1) AS DOUBLE)), 6) AS flesch
FROM agg
"""


# Count-min sketch (Cormode & Muthukrishnan 2005) dimensions: depth
# (independent hash rows) x width (buckets per row). 4x512 keeps the
# counter table at 2048 rows — broadcastable — while still showing
# real collision overestimates on the fixture vocabulary.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOPK = 20


def _cms_bucket(c: Column, i: int) -> Column:
    """Row-``i`` bucket for a term: md5 position family (engine-
    portable, same convention as the Bloom ``bloom_positions_md5``)."""
    return F.pmod(
        md5_int(F.concat(c, F.lit(f"#cms{i}"))), F.lit(CMS_WIDTH)
    )


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter census through a count-min sketch: build the
    DEPTH x WIDTH counter table distributed, then report the sketch
    estimate next to the exact count for the top-``CMS_TOPK`` terms —
    the overestimate column is the sketch's collision error, which the
    CM guarantee bounds by eps*N with probability 1-delta.

    Scale shape: the corpus-sized stage is the term hash-aggregate
    (map-side combine -> vocabulary). Counter build then explodes the
    VOCABULARY by depth (4 rows/term) into a bounded groupBy — the
    counter table is at most DEPTH*WIDTH rows regardless of corpus
    size, exactly the property that makes CMS the streaming/merge-
    friendly frequency sketch (counters merge by +, the same
    associative combine a 1000-executor partial agg performs). Probes
    equi-join the 20 query terms against the broadcast counter table
    and take min over depth. The top-k window is a global sort over
    the vocabulary table, not the corpus."""
    docs = _docs_par(spark, sf_dir)
    words = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("term")
    )
    tf = (
        words.filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    depth_structs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("i"),
                    _cms_bucket(F.col("term"), i).alias("b"),
                )
                for i in range(CMS_DEPTH)
            ]
        )
    ).alias("ib")
    counters = (
        tf.select("n", depth_structs)
        .groupBy(F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    top = (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= CMS_TOPK)
    )
    probes = top.select("term", "n", "rank", depth_structs).select(
        "term", "n", "rank", F.col("ib.i").alias("i"), F.col("ib.b").alias("b")
    )
    return (
        probes.join(F.broadcast(counters), ["i", "b"])
        .groupBy("term", "n", "rank")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "term",
            F.col("n").alias("true_n"),
            "cms_est",
            (F.col("cms_est") - F.col("n")).alias("overestimate"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


_CMS_IDS = ", ".join(str(i) for i in range(CMS_DEPTH))

_CMS_SQL = f"""
WITH w AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT term, COUNT(*) AS n FROM w WHERE term <> '' GROUP BY 1
), ids AS (
  SELECT unnest([{_CMS_IDS}]) AS i
), cells AS (
  SELECT n, i,
         ('0x' || substr(md5(term || '#cms' || i), 1, 15))::BIGINT
           % {CMS_WIDTH} AS b
  FROM tf CROSS JOIN ids
), counters AS (
  SELECT i, b, SUM(n) AS cnt FROM cells GROUP BY 1, 2
), top AS (
  SELECT term, n, rank FROM (
    SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rank
    FROM tf
  ) WHERE rank <= {CMS_TOPK}
), probes AS (
  SELECT term, n, rank, i,
         ('0x' || substr(md5(term || '#cms' || i), 1, 15))::BIGINT
           % {CMS_WIDTH} AS b
  FROM top CROSS JOIN ids
)
SELECT term, CAST(n AS BIGINT) AS true_n, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - n AS BIGINT) AS overestimate, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT term, n, rank, MIN(cnt) AS cms_est
  FROM probes JOIN counters USING (i, b) GROUP BY 1, 2, 3
)
"""


# Full BPE training loop: how many merge rules to learn. Each
# iteration is one vocabulary-sized aggregate, so the unrolled DuckDB
# twin stays readable at this depth while still exercising the
# iterate-merge-resegment dynamics (the first merged symbol feeds the
# pair statistics of iteration 2, etc.).
BPE_MERGE_ITERS = 4


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): run
    ``BPE_MERGE_ITERS`` full merge iterations — count adjacent symbol
    pairs weighted by word frequency, adopt the argmax pair as a merge
    rule, re-segment the vocabulary, repeat — and emit the learned
    merge table ``(it, left_sym, right_sym, merged, n_occ)``.

    This extends ``bpe_pair_census`` (the single-iteration census)
    into the actual training loop. Scale shape: the ONLY corpus-sized
    stage is the initial word-frequency hash-aggregate (map-side
    combine collapses the corpus to its vocabulary before the
    shuffle). Every iteration after that runs over the *vocabulary*
    table: one pair aggregate + a bounded global top-1
    (TakeOrderedAndProject) + a broadcast ONE-ROW cross-join that
    applies the merge (it shows as BroadcastNestedLoopJoin in the
    plan, but with a single-row build side that is the O(n)
    attach-a-scalar pattern used throughout this registry, not a
    quadratic join). No driver actions — the whole K-deep loop is a
    single lazy plan.

    The merge application is a plain string replace over a
    bracket-delimited segmentation (``<l><o><w>`` + rule ``l+o`` ->
    ``<lo><w>``): delimiters make the replace boundary-safe and
    non-overlapping occurrences resolve left-to-right greedily,
    identically in Spark's ``replace`` and DuckDB's — so the twin is
    the exact same string algorithm, not a reimplementation.
    Vocabulary is restricted to ``^[a-z]{2,}$`` words so symbols can
    never contain the ``<>`` delimiters. All counts are exact BIGINTs;
    argmax ties break on the pair string."""
    merges, _seg = _bpe_learn(spark, sf_dir)
    return merges.select(
        "it",
        "left_sym",
        "right_sym",
        F.concat("left_sym", "right_sym").alias("merged"),
        "n_occ",
    )


def _bpe_learn(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Shared BPE training loop: returns (merge table, final
    vocabulary segmentation carrying the original ``word`` column) so
    the encode census can join documents back onto the learned
    segmentation without re-deriving it."""
    docs = _docs_par(spark, sf_dir)
    words = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("word")
    )
    wc = (
        words.filter(F.col("word").rlike("^[a-z]{2,}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    seg = wc.select(
        "word", F.regexp_replace("word", "(.)", "<$1>").alias("seg"), "n"
    )
    merges = None
    for it in range(1, BPE_MERGE_ITERS + 1):
        syms = F.regexp_extract_all(F.col("seg"), F.lit("<([^>]*)>"), 1)
        length = F.greatest(F.size(syms) - 1, F.lit(0))
        pair = F.explode(
            F.zip_with(
                F.slice(syms, 1, length),
                F.slice(syms, 2, length),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        )
        agg = (
            seg.select("n", pair.alias("pair"))
            .groupBy("pair")
            .agg(F.sum("n").alias("n_occ"))
        )
        best = (
            agg.orderBy(F.desc("n_occ"), F.asc("pair"))
            .limit(1)
            .select(
                F.lit(it).cast("int").alias("it"),
                F.split("pair", " ").getItem(0).alias("left_sym"),
                F.split("pair", " ").getItem(1).alias("right_sym"),
                "n_occ",
            )
        )
        merges = best if merges is None else merges.unionByName(best)
        seg = (
            seg.crossJoin(
                F.broadcast(best.select("left_sym", "right_sym"))
            )
            .withColumn(
                "seg",
                F.replace(
                    F.col("seg"),
                    F.concat(
                        F.lit("<"), "left_sym", F.lit("><"),
                        "right_sym", F.lit(">"),
                    ),
                    F.concat(
                        F.lit("<"), "left_sym", "right_sym", F.lit(">")
                    ),
                ),
            )
            .select("word", "seg", "n")
        )
    return merges, seg


def _bpe_chain_sql() -> str:
    """Shared unrolled DuckDB WITH-prefix of the BPE training loop:
    the identical segment-string algorithm, one (pairs, best, reseg)
    CTE triple per merge iteration, carrying ``word`` through so the
    encode census can join back onto the final segmentation."""
    parts = [
        """WITH w AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
  FROM documents
), wc AS (
  SELECT word, COUNT(*) AS n FROM w
  WHERE regexp_matches(word, '^[a-z]{2,}$') GROUP BY 1
), s0 AS (
  SELECT word, regexp_replace(word, '(.)', '<\\1>', 'g') AS seg, n FROM wc
)"""
    ]
    for it in range(1, BPE_MERGE_ITERS + 1):
        prev = f"s{it - 1}"
        parts.append(
            f""", p{it} AS (
  SELECT p[1] || ' ' || p[2] AS pair, n FROM (
    SELECT unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS p, n
    FROM (SELECT regexp_extract_all(seg, '<([^>]*)>', 1) AS syms, n
          FROM {prev})
  )
), b{it} AS (
  SELECT {it} AS it, split_part(pair, ' ', 1) AS left_sym,
         split_part(pair, ' ', 2) AS right_sym, n_occ
  FROM (
    SELECT pair, SUM(n) AS n_occ FROM p{it} GROUP BY 1
    ORDER BY n_occ DESC, pair LIMIT 1
  )
), s{it} AS (
  SELECT word, replace(seg, '<' || b.left_sym || '><' || b.right_sym || '>',
                 '<' || b.left_sym || b.right_sym || '>') AS seg, n
  FROM {prev}, b{it} b
)"""
        )
    return "".join(parts)


def _bpe_train_sql() -> str:
    union = " UNION ALL ".join(
        f"SELECT * FROM b{i}" for i in range(1, BPE_MERGE_ITERS + 1)
    )
    return (
        _bpe_chain_sql()
        + f"""
SELECT CAST(it AS INTEGER) AS it, left_sym, right_sym,
       left_sym || right_sym AS merged, CAST(n_occ AS BIGINT) AS n_occ
FROM ({union})"""
    )


def bpe_encode_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode the corpus with the merge table
    ``bpe_train_merges`` learns and report the per-language token
    budget — words, characters, BPE tokens, and the chars-per-token
    compression ratio (the number that decides how many documents fit
    a training run's token budget).

    Scale shape: encoding does NOT re-run the merges over the corpus —
    the final vocabulary segmentation (already materialized by the
    training loop, vocabulary-sized) broadcasts onto the corpus's
    (lang, word) aggregate, so the corpus-sized work is one word
    hash-aggregate plus a BroadcastHashJoin; tokens-per-word is a
    delimiter count on the segmentation string. This is exactly how a
    100 TB encode pass runs: tiny trained tokenizer shipped to every
    executor, applied map-side."""
    _merges, seg = _bpe_learn(spark, sf_dir)
    vocab = seg.select(
        "word",
        (
            F.length("seg")
            - F.length(F.replace(F.col("seg"), F.lit("<"), F.lit("")))
        ).cast("bigint").alias("n_tok"),
    )
    docs = _docs_par(spark, sf_dir)
    wl = (
        docs.select(
            "lang",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("word"),
        )
        .filter(F.col("word").rlike("^[a-z]{2,}$"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = (
        wl.join(F.broadcast(vocab), "word")
        .groupBy("lang")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.length("word")).alias("n_chars"),
            F.sum(F.col("n") * F.col("n_tok")).alias("n_bpe_tokens"),
        )
    )
    return agg.select(
        "lang",
        "n_words",
        "n_chars",
        "n_bpe_tokens",
        F.round(
            F.col("n_chars").cast("double") / F.col("n_bpe_tokens"), 6
        ).alias("chars_per_token"),
    )


def _bpe_encode_sql() -> str:
    last = f"s{BPE_MERGE_ITERS}"
    return (
        _bpe_chain_sql()
        + f""", vocab AS (
  SELECT word, length(seg) - length(replace(seg, '<', '')) AS n_tok
  FROM {last}
), wl AS (
  SELECT lang, word, COUNT(*) AS n FROM (
    SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
    FROM documents
  ) WHERE regexp_matches(word, '^[a-z]{{2,}}$') GROUP BY 1, 2
)
SELECT lang, CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(SUM(n * length(word)) AS BIGINT) AS n_chars,
       CAST(SUM(n * n_tok) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(n * length(word)) AS DOUBLE) / SUM(n * n_tok), 6)
         AS chars_per_token
FROM wl JOIN vocab USING (word)
GROUP BY lang"""
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-5 terms per language by corpus-summed tf-idf — the
    keyword/vocabulary profiling step of a training-data mix report.

    Cross-engine exactness: idf is the INTEGER-quantized variant
    ``idf_e6 = (N_docs * 1e6) DIV df`` (a pure inverse-document-
    frequency ratio, no transcendental log whose last ulp could differ
    between engines), so every score is an exact BIGINT sum.

    Scale shape: one explode -> (doc, term) hash aggregate for tf, one
    (term) aggregate for df, then an EQUI-join of tf onto the df table
    on the term key — at 100 TB the term dictionary is itself large, so
    this is a plain shuffle join (NOT a broadcast; AQE may still elect
    one at small scale). N_docs rides in as a broadcast one-row
    aggregate, never a driver action (it shows as a
    BroadcastNestedLoopJoin in the plan, but with a single-row build
    side that is an O(n) map-side attach — the same pattern as
    dedup_exact's offset). The final top-5 is a per-lang ranking window
    over the (lang, term) aggregate — tie-broken on the term for
    determinism."""
    docs = _docs_par(spark, sf_dir)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = docs.select(
        "doc_id", "lang", F.explode(tokens_col("text")).alias("term")
    ).select("doc_id", "lang", F.lower("term").alias("term"))
    tf = toks.groupBy("doc_id", "lang", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_tbl, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "idf_e6",
            F.expr("(n_docs * CAST(1000000 AS BIGINT)) DIV df"),
        )
        .groupBy("lang", "term")
        .agg(F.sum(F.col("tf") * F.col("idf_e6")).alias("score_e6"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score_e6"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 5)
        .select("lang", "term", "score_e6", "term_rank")
    )


_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, lang, lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS term
  FROM documents
), tf AS (
  SELECT doc_id, lang, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT lang, term,
         CAST(SUM(tf * ((SELECT COUNT(*) FROM documents) * 1000000 // df)) AS BIGINT)
           AS score_e6
  FROM tf JOIN df USING (term)
  GROUP BY 1, 2
)
SELECT lang, term, score_e6, term_rank
FROM (
  SELECT lang, term, score_e6,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score_e6 DESC, term) AS term_rank
  FROM scored
)
WHERE term_rank <= 5
"""


# TextRank (Mihalcea & Tarau 2004) constants: the published damping
# d = 0.85 as the exact integer pair 85/100; ranks live in micro-units
# so the whole power iteration is BIGINT-exact in both engines.
TEXTRANK_ITERS = 5
TEXTRANK_SCALE = 1_000_000
TEXTRANK_TOPK = 25


def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: weighted PageRank over the token
    co-occurrence graph (Mihalcea & Tarau 2004). Nodes = lowercased
    corpus vocabulary, edges = adjacent-token pairs (symmetrized,
    weight = adjacency count, self-loops dropped), 5 damped power
    iterations, top-25 keywords. This is the iterative
    graph-centrality family in its text-native form — the identical
    operator shape runs host-level PageRank over a crawl's link graph
    (``outlink_path_census`` builds those edges); only the edge
    derivation differs.

    Scale shape: edges are one explode -> (u, v) hash aggregate with
    map-side combine; the out-weight rides a window over the SAME u
    partitioning (exchange reused, no second shuffle). Each iteration
    is one rank⋈edges equi-join on the node key plus one (v) hash
    aggregate — the canonical distributed PageRank step: at web scale
    the rank table is vocabulary/host-sized, so the join shuffles both
    sides on the node key (a production run persists ``edges``
    bucketed by u so only ranks move per iteration; here the unrolled
    lineage keeps the query a pure DataFrame composition with zero
    driver actions, like ``kmeans_embeddings``). The final top-k is a
    distributed TakeOrdered, then a rank window over only the
    surviving k rows.

    Determinism: ranks are BIGINT micro-units; each edge contribution
    is ``(w * r) DIV outw`` and the damped update is
    ``0.15*SCALE + (85 * sum) DIV 100`` — truncating integer division
    and order-independent BIGINT sums in both engines. Every node of
    the symmetrized graph has >= 1 in-edge, so the per-iteration
    aggregate covers the whole node set and no outer join is needed."""
    docs = _docs_par(spark, sf_dir)
    from .q_lm import _bigram_structs

    adj = (
        docs.select(
            F.explode(_bigram_structs(tokens_col(F.lower(F.col("text"))))).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .filter(F.col("w1") != F.col("w2"))
    )
    sym = adj.select(F.col("w1").alias("u"), F.col("w2").alias("v")).unionAll(
        adj.select(F.col("w2").alias("u"), F.col("w1").alias("v"))
    )
    edges = (
        sym.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("outw", F.sum("w").over(Window.partitionBy("u")))
    )
    base = 15 * TEXTRANK_SCALE // 100
    ranks = (
        edges.select("u")
        .distinct()
        .withColumn("r", F.lit(TEXTRANK_SCALE).cast("bigint"))
    )
    for _ in range(TEXTRANK_ITERS):
        contrib = edges.join(ranks, "u").select(
            "v", F.expr("(w * r) DIV outw").alias("c")
        )
        ranks = (
            contrib.groupBy("v")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("v").alias("u"),
                F.expr(f"CAST({base} + (85 * s) DIV 100 AS BIGINT)").alias("r"),
            )
        )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    top = (
        ranks.join(deg, "u")
        .orderBy(F.desc("r"), F.asc("u"))
        .limit(TEXTRANK_TOPK)
    )
    wtop = Window.orderBy(F.desc("r"), F.asc("u"))
    return top.select(
        F.col("u").alias("token"),
        "degree",
        F.col("r").alias("score_q6"),
        F.row_number().over(wtop).alias("kw_rank"),
    )


def _textrank_sql(
    iters: int = TEXTRANK_ITERS,
    scale: int = TEXTRANK_SCALE,
    topk: int = TEXTRANK_TOPK,
) -> str:
    base = 15 * scale // 100
    step = (
        "SELECT e.v AS u, CAST({base} + (85 * SUM((e.w * r.r) // e.outw)) // 100"
        " AS BIGINT) AS r FROM edges e JOIN r{i} r USING (u) GROUP BY e.v"
    )
    iter_ctes = ",\n".join(
        f"r{i + 1} AS ({step.format(base=base, i=i)})" for i in range(iters)
    )
    return f"""
WITH t AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
), bg AS (
  SELECT unnest([{{'w1': w[i], 'w2': w[i+1]}} for i in range(1, len(w))]) AS b
  FROM t WHERE len(w) >= 2
), adj AS (
  SELECT b.w1 AS w1, b.w2 AS w2 FROM bg WHERE b.w1 <> b.w2
), sym AS (
  SELECT w1 AS u, w2 AS v FROM adj
  UNION ALL
  SELECT w2 AS u, w1 AS v FROM adj
), edges AS (
  SELECT u, v, COUNT(*) AS w, SUM(COUNT(*)) OVER (PARTITION BY u) AS outw
  FROM sym GROUP BY u, v
), r0 AS (
  SELECT DISTINCT u, CAST({scale} AS BIGINT) AS r FROM edges
),
{iter_ctes},
deg AS (SELECT u, COUNT(*) AS degree FROM edges GROUP BY u)
SELECT token, degree, score_q6, kw_rank FROM (
  SELECT r.u AS token, d.degree AS degree, r.r AS score_q6,
         ROW_NUMBER() OVER (ORDER BY r.r DESC, r.u) AS kw_rank
  FROM r{iters} r JOIN deg d USING (u)
)
WHERE kw_rank <= {topk}
"""


# Decontamination: 8-token shingles (the n-gram length common in
# published decontamination pipelines — long enough that shared
# shingles imply copying, not phrase reuse).
DECONTAM_SHINGLE_N = 8
DECONTAM_MAX_DF = 256


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training-corpus documents whose
    8-token shingles collide with the held-out benchmark split — the
    train/test-leak check every serious pretraining mix runs. Here the
    'benchmark' is the googlenews half of the fixture corpus (sources
    src10..src19) and the 'training corpus' is the rest; the fixture's
    planted cross-source near-dups make the answer non-empty.

    Scale shape: both sides explode to (doc_id, shingle) and meet in a
    shingle EQUI-join — the shuffle carries sketches, never documents.
    The same hot-key df cap as dedup_ngram_jaccard (> DECONTAM_MAX_DF
    docs ⇒ boilerplate, dropped from index AND size terms via a COUNT
    window over the shingle key, exchange-reused by the join) bounds
    the worst key at O(k) instead of O(k^2); standard decontamination
    drops ultra-common n-grams for the same reason. Output: one row per contaminated corpus doc with
    the hit counts and the contaminated fraction of its shingles."""
    docs = _docs_par(spark, sf_dir)
    is_bench = F.substring("source", 4, 10).cast("int") >= 10
    sh = docs.select(
        "doc_id",
        is_bench.alias("is_bench"),
        word_shingles(tokens_col("text"), n=DECONTAM_SHINGLE_N).alias("sh"),
    ).filter(F.size("sh") > 0)
    inv = (
        sh.select("doc_id", "is_bench", F.explode("sh").alias("s"))
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .filter(F.col("df") <= DECONTAM_MAX_DF)
        .drop("df")
    )
    corpus = inv.filter(~F.col("is_bench")).select("doc_id", "s")
    bench = inv.filter(F.col("is_bench")).select(
        F.col("doc_id").alias("bench_doc_id"), "s"
    )
    sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        corpus.join(bench, "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_hits"),
            F.countDistinct("bench_doc_id").alias("n_bench_docs"),
        )
    )
    contamination = F.round(
        F.col("n_hits").cast("double") / F.col("n_shingles"), 6
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id", "n_shingles", "n_hits", "n_bench_docs",
        contamination.alias("contamination"),
    )


_DECONTAM_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(substr(source, 4) AS INT) >= 10 AS is_bench,
         regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
), sh AS (
  SELECT doc_id, is_bench,
         list_distinct([array_to_string(w[i:i+{DECONTAM_SHINGLE_N - 1}], ' ')
                        for i in range(1, len(w) - {DECONTAM_SHINGLE_N - 2})]) AS sl
  FROM t WHERE len(w) >= {DECONTAM_SHINGLE_N}
), inv AS (
  SELECT doc_id, is_bench, unnest(sl) AS s FROM sh
), cold AS (
  SELECT s FROM inv GROUP BY s HAVING COUNT(*) <= {DECONTAM_MAX_DF}
), inv2 AS (
  SELECT inv.doc_id, inv.is_bench, inv.s FROM inv JOIN cold USING (s)
), corpus AS (
  SELECT doc_id, s FROM inv2 WHERE NOT is_bench
), bench AS (
  SELECT doc_id AS bench_doc_id, s FROM inv2 WHERE is_bench
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id
), hits AS (
  SELECT doc_id, COUNT(DISTINCT s) AS n_hits,
         COUNT(DISTINCT bench_doc_id) AS n_bench_docs
  FROM corpus JOIN bench USING (s)
  GROUP BY doc_id
)
SELECT h.doc_id, n_shingles, n_hits, n_bench_docs,
       ROUND(CAST(n_hits AS DOUBLE) / n_shingles, 6) AS contamination
FROM hits h JOIN sizes USING (doc_id)
"""


def decontamination_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination DELIVERABLE: the census's sibling clean
    pass (same pairing as dup_span_census/clean and line_dedup
    census/clean) — drop every training document with ANY benchmark
    shingle hit and pin the surviving corpus per language: doc count,
    dropped count, kept token budget, and a fingerprint SUM over the
    kept texts, so the driver compare certifies the exact surviving
    byte-set, not just its size.

    Scale shape: the contaminated id set (tiny — hits only) comes from
    the census plan and meets the training corpus in a LEFT join on
    doc_id; the census is one (lang) hash aggregate. Text never
    shuffles — the fingerprint collapses map-side."""
    contaminated = benchmark_decontamination(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("hit")
    )
    docs = _docs_par(spark, sf_dir)
    is_bench = F.substring("source", 4, 10).cast("int") >= 10
    train = docs.filter(~is_bench).select("doc_id", "lang", "text")
    tagged = train.join(contaminated, "doc_id", "left").withColumn(
        "hit", F.coalesce("hit", F.lit(False))
    )
    fp = F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast("bigint")
    n_tok = F.size(tokens_col("text")).cast("bigint")
    return tagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("hit").cast("bigint")).alias("n_dropped"),
        F.sum(F.when(~F.col("hit"), n_tok).otherwise(F.lit(0))).alias(
            "kept_tokens"
        ),
        F.sum(F.when(~F.col("hit"), fp).otherwise(F.lit(0))).alias(
            "kept_fp_sum"
        ),
    )


_DECONTAM_CLEAN_SQL = f"""
WITH contaminated AS (
  SELECT doc_id FROM ({_DECONTAM_SQL})
), train AS (
  SELECT doc_id, lang, text FROM documents
  WHERE CAST(substr(source, 4) AS INT) < 10
), tagged AS (
  SELECT t.lang, t.text, c.doc_id IS NOT NULL AS hit
  FROM train t LEFT JOIN contaminated c USING (doc_id)
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN NOT hit
                THEN len(string_split_regex(trim(text), '\\s+'))
                ELSE 0 END) AS BIGINT) AS kept_tokens,
       CAST(SUM(CASE WHEN NOT hit
                THEN ('0x' || substr(md5(text), 1, 12))::BIGINT
                ELSE 0 END) AS BIGINT) AS kept_fp_sum
FROM tagged
GROUP BY lang
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE overlap matrix: for every source pair, how many
    distinct 8-token shingles they share — the mix-design view of
    contamination (doc-level flags live in benchmark_decontamination).
    Two sources with heavy overlap should not both enter the training
    mix at full weight; this is the table that decides it.

    Scale shape: the corpus collapses to DISTINCT (source, shingle)
    rows first (map-side-combining aggregate), so the shingle
    equi-self-join fans out at most #sources rows per shingle — the
    join blowup is bounded by the SOURCE count (~20), never document
    frequency, making the worst key O(#sources²) regardless of corpus
    size."""
    docs = _docs_par(spark, sf_dir)
    sh = docs.select(
        "source",
        word_shingles(tokens_col("text"), n=DECONTAM_SHINGLE_N).alias("sh"),
    ).filter(F.size("sh") > 0)
    inv = sh.select("source", F.explode("sh").alias("s")).distinct()
    a, b = inv.alias("a"), inv.alias("b")
    return (
        a.join(b, "s")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


_OVERLAP_SQL = f"""
WITH t AS (
  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
), sh AS (
  SELECT source,
         list_distinct([array_to_string(w[i:i+{DECONTAM_SHINGLE_N - 1}], ' ')
                        for i in range(1, len(w) - {DECONTAM_SHINGLE_N - 2})]) AS sl
  FROM t WHERE len(w) >= {DECONTAM_SHINGLE_N}
), inv AS (
  SELECT DISTINCT source, unnest(sl) AS s FROM sh
)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
FROM inv a JOIN inv b USING (s)
WHERE a.source < b.source
GROUP BY 1, 2
"""


def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter (Rae et al. 2021 §A1.1): per-doc
    duplicate-n-gram and top-token fractions, the second quality gate
    (after the C4-style ``quality_filter``) every pretraining corpus
    runs to drop boilerplate-looping and keyboard-mash pages.

    Metrics: fraction of tokens that are the single most frequent
    token, and the duplicate fraction of positional 2-grams / 3-grams
    (1 - distinct/total). The flag uses PURE-INTEGER threshold rules
    (top-token > 20%, dup-2gram > 50%, dup-3gram > 20%, compared as
    ``cnt * k > n`` products) so no float boundary can flap between
    engines.

    Scale shape: entirely map-side — every metric is a higher-order
    array expression over the doc's own token array (no explode, no
    shuffle, whole-stage codegen). The top-token count is
    O(distinct · n) per row, the right trade versus an explode +
    (doc, term) hash-aggregate until docs reach ~10^5 tokens; the
    docstring of ``tfidf_top_terms`` shows the aggregate shape for
    corpus-level term stats."""
    docs = _docs_par(spark, sf_dir)
    w = tokens_col("text")
    n = F.size(w)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda x: F.size(F.filter(w, lambda y: y == x)),
        )
    )
    sh2 = word_shingles_all(w, 2)
    sh3 = word_shingles_all(w, 3)
    total2, total3 = F.size(sh2), F.size(sh3)
    dup2 = total2 - F.size(F.array_distinct(sh2))
    dup3 = total3 - F.size(F.array_distinct(sh3))
    frac = lambda c, tot: F.when(  # noqa: E731
        tot > 0, F.round(c.cast("double") / tot, 6)
    ).otherwise(F.lit(0.0))
    repetitive = (
        (top_cnt * 5 > n) | (dup2 * 2 > total2) | (dup3 * 5 > total3)
    ).cast("int")
    return docs.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        top_cnt.alias("top_token_cnt"),
        dup2.alias("dup_2gram_cnt"),
        dup3.alias("dup_3gram_cnt"),
        frac(top_cnt, n).alias("top_token_frac"),
        frac(dup2, total2).alias("dup_2gram_frac"),
        frac(dup3, total3).alias("dup_3gram_frac"),
        repetitive.alias("repetitive"),
    )


_REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
), sh AS (
  SELECT doc_id, lang, w, len(w) AS n,
         [array_to_string(w[i:i+1], ' ')
          FOR i IN range(1, GREATEST(len(w) - 0, 1))] AS sh2,
         [array_to_string(w[i:i+2], ' ')
          FOR i IN range(1, GREATEST(len(w) - 1, 1))] AS sh3
  FROM t
), m AS (
  SELECT doc_id, lang, n,
         list_max(list_transform(list_distinct(w),
                                 x -> len(list_filter(w, y -> y = x)))) AS top_cnt,
         len(sh2) AS total2, len(sh2) - len(list_distinct(sh2)) AS dup2,
         len(sh3) AS total3, len(sh3) - len(list_distinct(sh3)) AS dup3
  FROM sh
)
SELECT doc_id, lang, n AS n_tokens, top_cnt AS top_token_cnt,
       dup2 AS dup_2gram_cnt, dup3 AS dup_3gram_cnt,
       CASE WHEN n > 0 THEN ROUND(CAST(top_cnt AS DOUBLE) / n, 6) ELSE 0.0 END
         AS top_token_frac,
       CASE WHEN total2 > 0 THEN ROUND(CAST(dup2 AS DOUBLE) / total2, 6) ELSE 0.0 END
         AS dup_2gram_frac,
       CASE WHEN total3 > 0 THEN ROUND(CAST(dup3 AS DOUBLE) / total3, 6) ELSE 0.0 END
         AS dup_3gram_frac,
       CAST(top_cnt * 5 > n OR dup2 * 2 > total2 OR dup3 * 5 > total3 AS INT)
         AS repetitive
FROM m
"""


# Mixture cap: no cell may be up-weighted past 5 epochs (the standard
# repetition ceiling in published pretraining-mix recipes).
MIXTURE_MAX_WEIGHT_E6 = 5_000_000


# Temperature for the tau-scaled sampling plan (the multilingual-LM
# convention, e.g. XLM-R's tau=0.7: upsample small sources toward —
# but not all the way to — uniform).
MIX_TAU_TENTHS = 7
# Documents drawn per epoch by the planned sampler.
MIX_EPOCH_DOC_BUDGET = 10_000


def mixture_temperature_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling plan: per-source draw probabilities
    p_s ∝ (tokens_s / total)^tau with tau=0.7 and the integer document
    budget each source gets per epoch — the standard multilingual-mix
    rule (between proportional tau=1 and uniform tau=0) turned into a
    loader-ready plan.

    Cross-engine determinism: ratio^tau goes through the module's ln
    convention — one ln on an exact-integer ratio, quantized to
    micro-nats, scaled by tau IN THE SAME double expression, then one
    exp floored to 1e-9 units. Normalization and the per-source budget
    are pure BIGINT arithmetic over those quantized weights (no double
    sum anywhere), so partial-aggregation order cannot drift.

    Scale shape: one source-grain token census (map-side combine), a
    one-row broadcast total, and arithmetic over the tiny source
    table. Output is one row per source at any corpus scale."""
    docs = _docs_par(spark, sf_dir)
    cells = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col("text"))).cast("bigint").alias("n_tokens"),
    )
    total = cells.agg(F.sum("n_tokens").alias("total_tokens"))
    t_e6 = F.round(
        F.log(F.col("n_tokens").cast("double") / F.col("total_tokens"))
        * (MIX_TAU_TENTHS / 10.0)
        * 1e6
    ).cast("bigint")
    w_e9 = F.floor(
        F.lit(1e9) * F.exp(F.col("t_e6").cast("double") / 1e6)
    ).cast("bigint")
    weighted = (
        cells.join(F.broadcast(total))
        .withColumn("t_e6", t_e6)
        .withColumn("w_e9", w_e9)
    )
    wtot = weighted.agg(F.sum("w_e9").alias("w_total"))
    return (
        weighted.join(F.broadcast(wtot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "w_e9",
            F.expr("(w_e9 * CAST(1000000 AS BIGINT)) DIV w_total").alias(
                "share_e6"
            ),
            F.expr(
                f"({MIX_EPOCH_DOC_BUDGET} * w_e9) DIV w_total"
            ).alias("epoch_docs"),
        )
    )


_MIX_TEMP_SQL = f"""
WITH cells AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), total AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM cells),
weighted AS (
  SELECT source, n_docs, n_tokens,
         CAST(FLOOR(1e9 * exp(
           CAST(ROUND(ln(CAST(n_tokens AS DOUBLE) / total_tokens)
                      * {MIX_TAU_TENTHS / 10.0} * 1e6) AS BIGINT)
           / 1e6)) AS BIGINT) AS w_e9
  FROM cells CROSS JOIN total
), wtot AS (SELECT CAST(SUM(w_e9) AS BIGINT) AS w_total FROM weighted)
SELECT source, n_docs, n_tokens, w_e9,
       (w_e9 * CAST(1000000 AS BIGINT)) // w_total AS share_e6,
       ({MIX_EPOCH_DOC_BUDGET} * w_e9) // w_total AS epoch_docs
FROM weighted CROSS JOIN wtot
"""


def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning: per (lang, source) token census plus the
    sampling weight that would equalize every cell's token share in
    the final mixture, capped at 5 epochs — the step that turns corpus
    profiling into a sampling plan for the data loader.

    Integer-quantized on both engines: ``share_e6`` is the cell's
    token share in micro-units (BIGINT DIV), ``weight_e6`` the
    up/down-sampling multiplier ``target/share`` in micro-units.

    Scale shape: one (lang, source) hash aggregate over a map-side
    token count; the corpus totals ride in as a one-row broadcast
    aggregate (never a driver action). Output is one row per cell —
    tiny at any corpus scale."""
    docs = _docs_par(spark, sf_dir)
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col("text"))).cast("bigint").alias("n_tokens"),
    )
    totals = cells.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    share_e6 = F.expr("(n_tokens * CAST(1000000 AS BIGINT)) DIV total_tokens")
    raw_w = F.expr(
        "((CAST(1000000 AS BIGINT) DIV n_cells) * CAST(1000000 AS BIGINT))"
        " DIV ((n_tokens * CAST(1000000 AS BIGINT)) DIV total_tokens)"
    )
    return (
        cells.join(F.broadcast(totals))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            share_e6.alias("share_e6"),
            F.least(raw_w, F.lit(MIXTURE_MAX_WEIGHT_E6)).alias("weight_e6"),
            (raw_w > MIXTURE_MAX_WEIGHT_E6).cast("int").alias("capped"),
        )
    )


_MIXTURE_SQL = f"""
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY 1, 2
), totals AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_cells
  FROM cells
)
SELECT lang, source, n_docs, n_tokens,
       (n_tokens * 1000000) // total_tokens AS share_e6,
       LEAST(((1000000 // n_cells) * 1000000)
               // ((n_tokens * 1000000) // total_tokens),
             {MIXTURE_MAX_WEIGHT_E6}) AS weight_e6,
       CAST(((1000000 // n_cells) * 1000000)
              // ((n_tokens * 1000000) // total_tokens)
            > {MIXTURE_MAX_WEIGHT_E6} AS INT) AS capped
FROM cells CROSS JOIN totals
"""


# Shard packing: target bytes (chars) per output shard, and the range
# width of the prefix-sum buckets (both mirrored in the oracle).
SHARD_TARGET_CHARS = 8192
SHARD_PREFIX_BUCKET = 64


def doc_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output sharding: assign documents (in deterministic
    doc_id order) to consecutive shards of ~SHARD_TARGET_CHARS each —
    the running-total bin-packing that decides output file boundaries
    when writing a corpus back out. Emits the per-shard census
    (doc count, chars, id range).

    Scale shape — DISTRIBUTED PREFIX SUM, not a global window: a
    single `SUM() OVER (ORDER BY doc_id)` puts the whole corpus in ONE
    window task. Instead: (1) an intra-bucket running sum windowed by
    doc_id-range bucket (parallel across buckets), (2) bucket
    subtotals prefix-summed in a tiny per-bucket window (rows =
    #buckets), (3) broadcast the offsets back. Three narrow shuffles,
    no single-task stage. The DuckDB oracle computes the NAIVE global
    cumsum, so the check proves the two-phase decomposition equals the
    sequential semantics."""
    docs = _docs_par(spark, sf_dir).select(
        "doc_id", F.col("n_chars").cast("bigint").alias("c")
    )
    b = (F.col("doc_id") / SHARD_PREFIX_BUCKET).cast("bigint")
    d = docs.withColumn("b", b)
    win_intra = (
        Window.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("run", F.sum("c").over(win_intra))
    totals = d.groupBy("b").agg(F.sum("c").alias("bt"))
    win_b = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn(
        "off", F.sum("bt").over(win_b) - F.col("bt")
    ).select("b", "off")
    cum = F.col("off") + F.col("run")
    shard = F.expr(
        f"(off + run - CAST(1 AS BIGINT)) DIV {SHARD_TARGET_CHARS}"
    )
    assigned = d.join(F.broadcast(offsets), "b").select(
        "doc_id", "c", cum.alias("cum_chars"), shard.alias("shard_id")
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("c").alias("shard_chars"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


_SHARD_SQL = f"""
WITH cum AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS c,
         SUM(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_chars
  FROM documents
)
SELECT CAST((cum_chars - 1) // {SHARD_TARGET_CHARS} AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(c) AS BIGINT) AS shard_chars,
       MIN(doc_id) AS first_doc_id,
       MAX(doc_id) AS last_doc_id
FROM cum GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Positional phrase search (n-way posting intersection)
# ---------------------------------------------------------------------------

# Fixed probe phrases (two bigrams + one trigram). Constant by design —
# the operator is the POSITIONAL INTERSECTION machinery, not the query
# set; a phrase absent from a given corpus reports 0, it does not
# vanish from the result.
PHRASES = [
    ("order", "fast"),
    ("part", "filter"),
    ("part", "filter", "hash"),
]


def phrase_search_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional inverted index: for each
    probe phrase, the documents and occurrence count where its words
    appear CONSECUTIVELY — the positional-postings intersection every
    search/dedup stack needs beyond bag-of-words (bm25_topk) matching.

    Plan: postings (term, doc_id, pos) from one posexplode, filtered
    map-side to the (tiny, constant) phrase vocabulary BEFORE anything
    shuffles; a phrase of k words is a chain of k-1 equi-joins on
    (doc_id, pos + offset) over those filtered postings. Every phrase
    is reported, zero matches included (left join from the phrase dim).

    Scale shape: the term filter cuts the posting stream to the probe
    terms' document frequency; the intersection joins carry only those
    postings, keyed on (doc_id, pos) — no text, no full-index shuffle."""
    docs = _docs_par(spark, sf_dir)
    all_terms = sorted({t for p in PHRASES for t in p})
    postings = (
        docs.select(
            "doc_id", F.posexplode(tokens_col("text")).alias("pos", "w")
        )
        .filter(F.col("w").isin(all_terms))
    )
    per_phrase = []
    for phrase in PHRASES:
        m = postings.filter(F.col("w") == phrase[0]).select(
            "doc_id", F.col("pos").alias("p0")
        )
        for i, term in enumerate(phrase[1:], start=1):
            nxt = postings.filter(F.col("w") == term).select(
                F.col("doc_id").alias("d"), F.col("pos").alias("p")
            )
            m = m.join(
                nxt,
                (m.doc_id == nxt.d) & (nxt.p == F.col("p0") + i),
            ).select("doc_id", "p0")
        per_phrase.append(
            m.agg(
                F.count_distinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_occurrences"),
            ).select(
                F.lit(" ".join(phrase)).alias("phrase"),
                "n_docs",
                "n_occurrences",
            )
        )
    return reduce(DataFrame.unionAll, per_phrase)


def _phrase_sql() -> str:
    parts = []
    for phrase in PHRASES:
        k = len(phrase)
        conds = " AND ".join(
            f"w[i + {j}] = '{t}'" for j, t in enumerate(phrase)
        )
        parts.append(f"""
SELECT '{" ".join(phrase)}' AS phrase,
       COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM (
  SELECT doc_id, unnest(range(1, len(w) - {k - 2})) AS i
  FROM (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
    FROM documents
  ) WHERE len(w) >= {k}
) s JOIN (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
) d USING (doc_id)
WHERE {conds}""")
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# Vocabulary growth (Heaps' law) — tokenizer/vocab sizing signal
# ---------------------------------------------------------------------------

# Docs per growth checkpoint. 50 gives 10 checkpoints on the 500-doc
# fixtures and 100 at sf0.1; at corpus scale the bucket would be a
# crawl segment, not a doc_id range.
VOCAB_BUCKET_DOCS = 50


def vocab_growth_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: for each checkpoint of
    ``VOCAB_BUCKET_DOCS`` documents (in doc_id order), how many token
    TYPES appear for the first time, plus the cumulative type and
    token counts — the curve that sizes a tokenizer vocabulary and
    predicts how much new text still buys new vocabulary.

    Scale shape: "first time" is not a sequential scan — each type's
    first occurrence is ``min(doc_id)`` per token, one hash aggregate
    with map-side combine over the exploded tokens (the only wide
    stage that touches token-grain data). Everything after collapses
    to one row per checkpoint: the cumulative window runs over a
    bucket-count-sized table (thousands of rows at petabyte scale),
    so the unpartitioned window is safe."""
    docs = _docs_par(spark, sf_dir)
    tok = tokens_col("text")
    bucket = F.expr(f"doc_id DIV {VOCAB_BUCKET_DOCS}")
    per_bucket = docs.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tok)).cast("bigint").alias("n_tokens"),
    )
    first_seen = (
        docs.select(bucket.alias("b"), F.explode(tok).alias("w"))
        .groupBy("w")
        .agg(F.min("b").alias("first_bucket"))
        .groupBy(F.col("first_bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    win = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = per_bucket.join(first_seen, "bucket", "left").select(
        "bucket",
        "n_docs",
        "n_tokens",
        F.coalesce("new_types", F.lit(0)).cast("bigint").alias("new_types"),
    )
    return joined.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "new_types",
        F.sum("new_types").over(win).cast("bigint").alias("cum_types"),
        F.sum("n_tokens").over(win).cast("bigint").alias("cum_tokens"),
    )


_VOCAB_GROWTH_SQL = f"""
WITH toks AS (
  SELECT doc_id // {VOCAB_BUCKET_DOCS} AS b,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), per_bucket AS (
  SELECT doc_id // {VOCAB_BUCKET_DOCS} AS bucket, COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY 1
), first_seen AS (
  SELECT first_bucket AS bucket, COUNT(*) AS new_types
  FROM (SELECT w, MIN(b) AS first_bucket FROM toks GROUP BY w)
  GROUP BY 1
), joined AS (
  SELECT p.bucket, p.n_docs, p.n_tokens,
         CAST(COALESCE(f.new_types, 0) AS BIGINT) AS new_types
  FROM per_bucket p LEFT JOIN first_seen f USING (bucket)
)
SELECT bucket, n_docs, n_tokens, new_types,
       CAST(SUM(new_types) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_types,
       CAST(SUM(n_tokens) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens
FROM joined
"""


# ---------------------------------------------------------------------------
# Unigram entropy — repetitive/gibberish detector
# ---------------------------------------------------------------------------

# Docs whose unigram entropy falls below this many micro-nats are
# counted as "low entropy" (repetitive boilerplate / keyword stuffing).
# ~3 nats ~ a 20-word effective vocabulary.
LOW_ENTROPY_E6 = 3_000_000


def token_entropy_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram-entropy census: each document's token
    distribution entropy H = sum c_i/n * ln(n/c_i) (nats), averaged
    per source, plus the count of low-entropy (repetitive) documents.
    Low unigram entropy is the classic cheap gibberish/keyword-stuffing
    signal that complements ``quality_repetition``'s n-gram ratios.

    Cross-engine determinism: the one ``ln`` per (doc, type) is taken
    on an exact-integer ratio ``n/c_i`` and quantized to micro-nats
    (module convention, see plans.q_lm); per-doc entropy is the exact
    BIGINT ``sum(c_i * term_e6) DIV n`` and per-source results are
    exact BIGINT sums, so no aggregation-order drift is possible.

    Scale shape: two token-grain exchanges — the (doc_id, token) type
    count (hash aggregate with map-side combine) and the doc_id window
    that co-locates a document's types for its total n — then one
    row-per-doc collapse and a per-source rollup. No joins, nothing
    broadcast."""
    docs = _docs_par(spark, sf_dir)
    counts = (
        docs.select(
            "doc_id", "source", F.explode(tokens_col("text")).alias("w")
        )
        .groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    term_e6 = F.round(
        F.log(
            F.sum("c").over(Window.partitionBy("doc_id")).cast("double")
            / F.col("c")
        )
        * 1e6
    ).cast("bigint")
    per_doc = (
        counts.withColumn("term_e6", term_e6)
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("term_e6")).alias("wsum"),
        )
        .select(
            "source",
            F.expr("wsum DIV n").alias("entropy_e6"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("entropy_e6") < LOW_ENTROPY_E6).cast("bigint")).alias(
            "n_low_entropy"
        ),
        F.sum("entropy_e6").alias("sum_entropy_e6"),
        F.round(
            F.sum("entropy_e6").cast("double") / 1e6 / F.count(F.lit(1)), 6
        ).alias("avg_entropy_nats"),
    )


_ENTROPY_SQL = f"""
WITH counts AS (
  SELECT doc_id, source, w, COUNT(*) AS c
  FROM (
    SELECT doc_id, source,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
    FROM documents
  )
  GROUP BY 1, 2, 3
), terms AS (
  SELECT doc_id, source, c,
         CAST(ROUND(ln(CAST(SUM(c) OVER (PARTITION BY doc_id) AS DOUBLE) / c)
                    * 1e6) AS BIGINT) AS term_e6
  FROM counts
), per_doc AS (
  SELECT source, SUM(c * term_e6) // SUM(c) AS entropy_e6
  FROM terms GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN entropy_e6 < {LOW_ENTROPY_E6} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_entropy,
       CAST(SUM(entropy_e6) AS BIGINT) AS sum_entropy_e6,
       ROUND(CAST(SUM(entropy_e6) AS DOUBLE) / 1e6 / COUNT(*), 6)
         AS avg_entropy_nats
FROM per_doc GROUP BY source
"""


# Relevance rule for the BM25 evaluation: a document is relevant to a
# query term iff it contains the term at least REL_MIN_TF times — a
# deterministic corpus-derived judgment set, so the fixture needs no
# external qrels.
REL_MIN_TF = 2


def bm25_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality EVALUATION for the BM25 ranker: MRR over the
    registered bm25_topk rankings against the deterministic tf-based
    relevance rule — the same evaluate-the-approximation discipline as
    ann_ivf_recall, turned on lexical search. Reports, per query, the
    corpus-wide relevant-doc count, the first relevant rank inside the
    top-k (0 if none), and its reciprocal.

    Scale shape: the ranking side is the already-bounded bm25_topk
    output (k rows per query); relevance tf>=2 is read off the tf
    column those rows already carry. The corpus-wide n_relevant pass
    explodes tokens once and drops every non-query term with a
    broadcast semi-ish inner join BEFORE the (doc, term) aggregate, so
    the count costs one pruned map + one tiny aggregate."""
    ranked = bm25_topk(spark, sf_dir)
    qt = ranked.select("qid", "term").distinct()
    docs = _docs_par(spark, sf_dir)
    tok = tokens_col("text")
    occ = (
        docs.select("doc_id", F.explode(tok).alias("term"))
        .join(F.broadcast(qt), "term")
        .groupBy("qid", "term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    nrel = occ.filter(F.col("tf") >= REL_MIN_TF).groupBy("qid", "term").agg(
        F.count(F.lit(1)).alias("n_relevant")
    )
    first = (
        ranked.filter(F.col("tf") >= REL_MIN_TF)
        .groupBy("qid")
        .agg(F.min("rank").alias("first_rel_rank"))
    )
    rank0 = F.coalesce("first_rel_rank", F.lit(0)).cast("int")
    return (
        nrel.join(first, "qid", "left")
        .select(
            "qid",
            "term",
            F.col("n_relevant").cast("bigint").alias("n_relevant"),
            rank0.alias("first_rel_rank"),
            F.when(rank0 > 0, F.round(F.lit(1.0) / rank0, 6))
            .otherwise(F.lit(0.0))
            .alias("reciprocal_rank"),
        )
    )


def _bm25_mrr_sql() -> str:
    return f"""
WITH b AS ({_BM25_SQL}),
qt AS (
  SELECT DISTINCT qid, term FROM b
), e AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
), occ AS (
  SELECT qt.qid, qt.term, e.doc_id, COUNT(*) AS tf
  FROM e JOIN qt USING (term)
  GROUP BY 1, 2, 3
), nrel AS (
  SELECT qid, term, COUNT(*) AS n_relevant
  FROM occ WHERE tf >= {REL_MIN_TF} GROUP BY 1, 2
), first AS (
  SELECT qid, MIN(rank) AS first_rel_rank
  FROM b WHERE tf >= {REL_MIN_TF} GROUP BY qid
)
SELECT n.qid, n.term, CAST(n.n_relevant AS BIGINT) AS n_relevant,
       CAST(COALESCE(f.first_rel_rank, 0) AS INTEGER) AS first_rel_rank,
       CASE WHEN COALESCE(f.first_rel_rank, 0) > 0
            THEN ROUND(1.0 / f.first_rel_rank, 6) ELSE 0.0 END
         AS reciprocal_rank
FROM nrel n LEFT JOIN first f USING (qid)
"""


# Near-dup threshold grid (permille): the sweep answers "how many
# pairs/docs does each candidate Jaccard cutoff implicate" in ONE pass
# over the LSH candidate set — the tuning table that otherwise costs
# one full dedup run per threshold. Integer permille (floored) keeps
# the cutoff comparison exact in both engines.
SWEEP_THRESHOLDS_PERMILLE = [500, 600, 700, 800, 900]


def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity census for near-dup dedup: verify every
    MinHash-LSH candidate pair ONCE with exact 3-gram Jaccard, then
    count surviving pairs and implicated documents at each cutoff in
    SWEEP_THRESHOLDS_PERMILLE.

    Scale shape: the expensive parts (signature pass, candidate join,
    exact verification) run exactly once; the sweep itself is a
    map-side explode of a 5-element filtered literal array over the
    tiny verified-pair set — no join against the threshold grid, no
    re-run per cutoff. Zero-pair thresholds still appear (broadcast
    left join from the literal grid).

    Cross-engine determinism: the cutoff compares floored integer
    permille ((inter*1000) div union) against integer thresholds — no
    float boundary can disagree between engines."""
    from ..operators.dedup import candidate_pairs, minhash_band_rows

    docs = _docs_par(spark, sf_dir)
    cands = candidate_pairs(minhash_band_rows(docs))
    sh = docs.select(
        "doc_id", word_shingles(tokens_col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    union = (F.size("sh_a") + F.size("sh_b")).cast("bigint") - inter
    scored = (
        cands.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            inter.alias("inter"),
            union.alias("uni"),
        )
        .select(
            "doc_id_a", "doc_id_b", F.expr("(inter * 1000) div uni").alias("jac_m")
        )
    )
    th_arr = F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS_PERMILLE])
    pairs_th = scored.select(
        "doc_id_a",
        "doc_id_b",
        F.explode(
            F.filter(th_arr, lambda t: F.col("jac_m") >= t)
        ).alias("threshold_permille"),
    )
    n_pairs = pairs_th.groupBy("threshold_permille").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    n_docs = (
        pairs_th.select(
            "threshold_permille",
            F.explode(F.array("doc_id_a", "doc_id_b")).alias("d"),
        )
        .groupBy("threshold_permille")
        .agg(F.countDistinct("d").alias("n_docs"))
    )
    grid = spark.range(1).select(
        F.explode(th_arr).alias("threshold_permille")
    )
    return (
        grid.join(F.broadcast(n_pairs), "threshold_permille", "left")
        .join(F.broadcast(n_docs), "threshold_permille", "left")
        .select(
            F.col("threshold_permille").cast("int").alias("threshold_permille"),
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
        )
    )


def _threshold_sweep_sql() -> str:
    grid = ", ".join(str(t) for t in SWEEP_THRESHOLDS_PERMILLE)
    return f"""
WITH cand AS ({_minhash_sql()}),
tt AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh2 AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
  FROM tt WHERE len(w) >= 3
), scored AS (
  SELECT c.doc_id_a, c.doc_id_b,
         (CAST(len(list_intersect(a.s, b.s)) AS BIGINT) * 1000)
           // (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac_m
  FROM cand c
  JOIN sh2 a ON a.doc_id = c.doc_id_a
  JOIN sh2 b ON b.doc_id = c.doc_id_b
), th AS (
  SELECT unnest([{grid}]) AS threshold_permille
), pth AS (
  SELECT t.threshold_permille, s.doc_id_a, s.doc_id_b
  FROM th t JOIN scored s ON s.jac_m >= t.threshold_permille
), np AS (
  SELECT threshold_permille, COUNT(*) AS n_pairs FROM pth GROUP BY 1
), nd AS (
  SELECT threshold_permille, COUNT(DISTINCT d) AS n_docs
  FROM (
    SELECT threshold_permille, unnest([doc_id_a, doc_id_b]) AS d FROM pth
  ) GROUP BY 1
)
SELECT CAST(t.threshold_permille AS INTEGER) AS threshold_permille,
       CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(nd.n_docs, 0) AS BIGINT) AS n_docs
FROM th t
LEFT JOIN np ON np.threshold_permille = t.threshold_permille
LEFT JOIN nd ON nd.threshold_permille = t.threshold_permille
"""


# LSH banding grid: every (bands x rows) factorization of the 16-hash
# signature. Fewer, wider bands (2x8) = high precision / low recall;
# many narrow bands (8x2) = the opposite. The sweep prices each
# operating point from ONE signature pass.
BANDING_CONFIGS = [(2, 8), (4, 4), (8, 2)]


def dedup_banding_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH BANDING tuning table: bucket occupancy and candidate
    pair/doc counts for each (bands x rows) split of the same 16-hash
    signature — the b/r operating-point sweep that otherwise costs one
    LSH indexing run per configuration (the sibling of
    dedup_threshold_sweep, which tunes the verify cutoff).

    Scale shape: the CPU-bound part (shingle, md5, 16 xor-min
    signatures) runs ONCE; all three configurations' band keys come
    out of a single map-side explode of a literal struct array over
    the signature row. Candidates are an equi-join on
    (cfg, band, band_key) — the same bounded-occupancy shape as
    candidate_pairs, never all-pairs. Bucket census and pair census
    share the band-key exchange.

    Cross-engine determinism: band keys are md5 of comma-joined exact
    BIGINT signature values; every output is an exact count."""
    docs = _docs_par(spark, sf_dir)
    sh = docs.select(
        "doc_id", word_shingles(tokens_col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    hs = sh.select("doc_id", F.transform("sh", md5_int).alias("h"))
    # NOTE: the xor lambda must take exactly ONE parameter — pyspark
    # passes (element, index) to two-parameter transform lambdas, so a
    # captured-seed default argument would silently become the index
    sig = hs.select(
        "doc_id",
        *[
            F.array_min(
                F.transform("h", lambda x: x.bitwiseXOR(F.lit(seed)))
            ).alias(f"s{i}")
            for i, seed in enumerate(MINHASH_SEEDS)
        ],
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(f"{b}x{r}").alias("cfg"),
                F.lit(i).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"s{i * r + j}").cast("string")
                            for j in range(r)
                        ],
                    )
                ).alias("band_key"),
            )
            for b, r in BANDING_CONFIGS
            for i in range(b)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", "bk.cfg", "bk.band", "bk.band_key"
    )
    buckets = bands.groupBy("cfg", "band", "band_key").agg(
        F.count(F.lit(1)).alias("n")
    )
    occupancy = buckets.groupBy("cfg").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("n") >= 2).cast("bigint")).alias("n_buckets_multi"),
    )
    a, b_ = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.cfg") == F.col("b.cfg"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.cfg").alias("cfg"),
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    n_pairs = pairs.groupBy("cfg").agg(F.count(F.lit(1)).alias("n_pairs"))
    n_docs = (
        pairs.select("cfg", F.explode(F.array("doc_id_a", "doc_id_b")).alias("d"))
        .groupBy("cfg")
        .agg(F.countDistinct("d").alias("n_docs_in_pairs"))
    )
    return (
        occupancy.join(F.broadcast(n_pairs), "cfg", "left")
        .join(F.broadcast(n_docs), "cfg", "left")
        .select(
            "cfg",
            F.col("n_buckets").cast("bigint").alias("n_buckets"),
            F.col("n_buckets_multi").cast("bigint").alias("n_buckets_multi"),
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs_in_pairs", F.lit(0))
            .cast("bigint")
            .alias("n_docs_in_pairs"),
        )
    )


def _banding_sweep_sql() -> str:
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(h, x -> xor(x, {seed}::BIGINT))) AS s{i}"
        for i, seed in enumerate(MINHASH_SEEDS)
    )
    band_selects = "\n  UNION ALL\n".join(
        "SELECT doc_id, '{cfg}' AS cfg, {i} AS band, md5({key}) AS band_key FROM sig".format(
            cfg=f"{b}x{r}",
            i=i,
            key=" || ',' || ".join(f"s{i * r + j}::VARCHAR" for j in range(r)),
        )
        for b, r in BANDING_CONFIGS
        for i in range(b)
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
), buckets AS (
  SELECT cfg, band, band_key, COUNT(*) AS n FROM bands GROUP BY 1, 2, 3
), occupancy AS (
  SELECT cfg, COUNT(*) AS n_buckets,
         SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS n_buckets_multi
  FROM buckets GROUP BY cfg
), pairs AS (
  SELECT DISTINCT a.cfg, a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bands a JOIN bands b
    ON a.cfg = b.cfg AND a.band = b.band AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
), np AS (
  SELECT cfg, COUNT(*) AS n_pairs FROM pairs GROUP BY cfg
), nd AS (
  SELECT cfg, COUNT(DISTINCT d) AS n_docs_in_pairs
  FROM (SELECT cfg, unnest([doc_id_a, doc_id_b]) AS d FROM pairs) GROUP BY cfg
)
SELECT o.cfg, CAST(o.n_buckets AS BIGINT) AS n_buckets,
       CAST(o.n_buckets_multi AS BIGINT) AS n_buckets_multi,
       CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(nd.n_docs_in_pairs, 0) AS BIGINT) AS n_docs_in_pairs
FROM occupancy o
LEFT JOIN np ON np.cfg = o.cfg
LEFT JOIN nd ON nd.cfg = o.cfg
"""


# Stopword-discovery shape: top-K tokens by document frequency per
# language — the data-driven way the jusText stoplists would be built
# for a language that ships without one.
STOPWORD_DISCOVERY_TOPK = 15


def stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven stopword discovery: rank each language's tokens by
    document frequency and keep the top K, flagging membership in the
    frozen synthetic stoplist (the list jusText classification actually
    uses) — the audit that says whether the shipped stoplist matches
    the corpus the classifier runs on.

    Scale shape: array_distinct BEFORE explode bounds the shuffle at
    one row per (doc, distinct token); the (lang, token) hash aggregate
    map-side combines; the ranking window runs over the
    vocabulary-sized aggregate, never over token occurrences."""
    docs = _docs_par(spark, sf_dir)
    df_ = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.array_distinct(tokens_col("text"))).alias("token"),
        )
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("df"), F.asc("token"))
    return (
        df_.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= STOPWORD_DISCOVERY_TOPK)
        .select(
            "lang",
            F.col("rank").cast("int").alias("rank"),
            "token",
            F.col("df").cast("bigint").alias("df"),
            F.col("token")
            .isin(*STOPWORDS_SORTED)
            .cast("boolean")
            .alias("in_stoplist"),
        )
    )


_STOPWORD_DISCOVERY_SQL = f"""
WITH e AS (
  SELECT doc_id, lang,
         unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS token
  FROM documents
), dfx AS (
  SELECT lang, token, COUNT(*) AS df FROM e GROUP BY 1, 2
), ranked AS (
  SELECT lang, token, df,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY df DESC, token) AS rank
  FROM dfx
)
SELECT lang, CAST(rank AS INTEGER) AS rank, token, CAST(df AS BIGINT) AS df,
       token IN ({_STOP_SQL}) AS in_stoplist
FROM ranked WHERE rank <= {STOPWORD_DISCOVERY_TOPK}
"""


# -- module registry (merged into plans.queries.SQL_CHECKED) ----------------
QSAMP_MOD = 16  # 1/16 deterministic hash-sample rate


def quantile_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-vs-exact percentile AUDIT — the companion
    corpus_length_percentiles' docstring promises: at 100 TB you
    estimate quantiles from a sample (or an engine-specific sketch)
    because a full sort-based percentile shuffles the corpus; this
    query computes BOTH the exact per-language p50/p90/p99 and the
    same percentiles over a deterministic 1/16 md5 hash-sample, and
    reports the absolute errors. On the big cluster you keep the
    sample column and drop the exact one; the audit row is how you
    decide the sample rate is safe.

    Scale shape: sample membership is a map-side hash test (no RNG
    state, reproducible across engines and runs); the sampled
    percentile's sort touches 1/16 of the rows. Exact and sampled
    aggregates share one lang shuffle (same grouping key, one
    aggregate over conditional inputs)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    in_samp = (
        md5_int(F.concat(F.lit("qsamp:"), F.col("doc_id").cast("string")))
        % QSAMP_MOD
        == 0
    )
    samp_chars = F.when(in_samp, F.col("n_chars"))

    def pair(p: float, name: str) -> list:
        return [
            F.round(F.percentile("n_chars", F.lit(p)), 4).alias(f"{name}_exact"),
            F.round(F.percentile(samp_chars, F.lit(p)), 4).alias(f"{name}_samp"),
        ]

    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(in_samp.cast("bigint")).alias("n_sampled"),
        *pair(0.5, "p50"),
        *pair(0.9, "p90"),
        *pair(0.99, "p99"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_sampled",
        "p50_exact",
        "p50_samp",
        "p90_exact",
        "p90_samp",
        F.round(F.abs(F.col("p50_samp") - F.col("p50_exact")), 4).alias("p50_err"),
        F.round(F.abs(F.col("p90_samp") - F.col("p90_exact")), 4).alias("p90_err"),
        F.round(F.abs(F.col("p99_samp") - F.col("p99_exact")), 4).alias("p99_err"),
    )


_QSAMP_AUDIT_SQL = f"""
WITH d AS (
  SELECT lang, n_chars,
         ('0x' || substr(md5('qsamp:' || doc_id), 1, 15))::BIGINT % {QSAMP_MOD} = 0
           AS in_samp
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN in_samp THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       ROUND(quantile_cont(n_chars, 0.5), 4) AS p50_exact,
       ROUND(quantile_cont(CASE WHEN in_samp THEN n_chars END, 0.5), 4)
         AS p50_samp,
       ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_exact,
       ROUND(quantile_cont(CASE WHEN in_samp THEN n_chars END, 0.9), 4)
         AS p90_samp,
       ROUND(ABS(ROUND(quantile_cont(CASE WHEN in_samp THEN n_chars END, 0.5), 4)
                 - ROUND(quantile_cont(n_chars, 0.5), 4)), 4) AS p50_err,
       ROUND(ABS(ROUND(quantile_cont(CASE WHEN in_samp THEN n_chars END, 0.9), 4)
                 - ROUND(quantile_cont(n_chars, 0.9), 4)), 4) AS p90_err,
       ROUND(ABS(ROUND(quantile_cont(CASE WHEN in_samp THEN n_chars END, 0.99), 4)
                 - ROUND(quantile_cont(n_chars, 0.99), 4)), 4) AS p99_err
FROM d GROUP BY lang
"""


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def table_profile_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS per-column data profiler over the documents table —
    the ANALYZE/data-quality census every ingestion run materializes
    before trusting a new drop: per column, null count, exact distinct
    count, lexicographic min/max of the string form, and mean
    string-form length. All 5 columns profile in a SINGLE aggregate
    row (25 agg expressions share one scan; count_distinct expands to
    the standard two-phase distinct aggregate), which is then turned
    into one row per column with ``unpivot``-style struct explode —
    the profile never rescans the table per column, the property that
    matters when the table is 100 TB.

    Determinism: min/max compare the raw strings binary-wise in both
    engines; mean length is an exact-integer sum over a fixed count,
    rounded to 4dp."""
    docs = _t(spark, sf_dir, "documents")

    def metrics(c: str):
        s = F.col(c).cast("string")
        return F.struct(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("bigint")).alias("n_null"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.min(s).alias("min_s"),
            F.max(s).alias("max_s"),
            F.round(F.avg(F.length(s)), 4).alias("avg_len"),
        )

    one = docs.agg(F.array(*[metrics(c) for c in _PROFILE_COLS]).alias("m"))
    return one.select(F.explode("m").alias("p")).select("p.*")


def _profile_sql() -> str:
    parts = [
        f"""
SELECT '{c}' AS column, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_s,
       MAX(CAST({c} AS VARCHAR)) AS max_s,
       ROUND(AVG(LENGTH(CAST({c} AS VARCHAR))), 4) AS avg_len
FROM documents"""
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality calibration: for every LSH candidate pair, the
    MinHash Jaccard ESTIMATE (matching signature components / 16)
    side-by-side with the EXACT 3-gram Jaccard — the measurement that
    justifies the banding thresholds dedup_banding_sweep tunes. All
    three outputs are exact integers (ppm via BIGINT div), so the twin
    check cannot flap on float summation.

    Scale shape: signatures are computed once per doc (linear pass),
    candidates come from the banded equi-join (never all-pairs), and
    both the signature table and the shingle sets join back onto the
    candidate list by doc id — candidate-bounded work, the same
    discipline as dedup_minhash_verified."""
    docs = _docs_par(spark, sf_dir)
    sh = docs.select(
        "doc_id", word_shingles(tokens_col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    hs = sh.select("doc_id", "sh", F.transform("sh", md5_int).alias("h"))
    # single-arg lambda, seed via closure: a 2-arg lambda would be read
    # by F.transform as (element, INDEX) and xor with the position
    sig = hs.select("doc_id", "sh", *[
        F.array_min(
            F.transform("h", lambda x: x.bitwiseXOR(F.lit(seed)))
        ).alias(f"s{i}")
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

    cand = candidate_pairs(bands)
    n_sig = len(MINHASH_SEEDS)
    a = sig.select(
        F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(n_sig)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(n_sig)],
    )
    j = cand.join(a, "doc_id_a").join(b, "doc_id_b")
    matches = reduce(
        operator.add,
        [(F.col(f"a{i}") == F.col(f"b{i}")).cast("bigint") for i in range(n_sig)],
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    union = (F.size("sh_a") + F.size("sh_b")).cast("bigint") - inter
    return (
        j.select(
            "doc_id_a",
            "doc_id_b",
            matches.alias("sig_matches"),
            inter.alias("n_inter"),
            union.alias("n_union"),
        )
        .withColumn("est_ppm", F.expr(f"sig_matches * 1000000L div {n_sig}"))
        .withColumn("jaccard_ppm", F.expr("n_inter * 1000000L div n_union"))
        .withColumn("err_ppm", F.abs(F.col("est_ppm") - F.col("jaccard_ppm")))
    )


def _minhash_calibration_sql() -> str:
    n_sig = len(MINHASH_SEEDS)
    cand = _minhash_sql()
    match_terms = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(n_sig)
    )
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(h, x -> xor(x, {seed}::BIGINT))) AS s{i}"
        for i, seed in enumerate(MINHASH_SEEDS)
    )
    return f"""
WITH cand AS ({cand}),
tt AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), shc AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
  FROM tt WHERE len(w) >= 3
), hsc AS (
  SELECT doc_id, s, list_transform(s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h FROM shc
), sigc AS (
  SELECT doc_id, s,
    {sig_exprs}
  FROM hsc
), m AS (
  SELECT c.doc_id_a, c.doc_id_b,
         CAST({match_terms} AS BIGINT) AS sig_matches,
         CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter,
         CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS BIGINT)
           AS n_union
  FROM cand c
  JOIN sigc sa ON sa.doc_id = c.doc_id_a
  JOIN sigc sb ON sb.doc_id = c.doc_id_b
)
SELECT doc_id_a, doc_id_b, sig_matches, n_inter, n_union,
       sig_matches * 1000000 // {n_sig} AS est_ppm,
       n_inter * 1000000 // n_union AS jaccard_ppm,
       abs(sig_matches * 1000000 // {n_sig} - n_inter * 1000000 // n_union)
         AS err_ppm
FROM m
"""


TRIGRAM_QUERY = "merge sort"  # fixed probe, non-empty at every fixture SF


def trigram_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-accelerated substring search: build a character-trigram
    posting list over the corpus, intersect the postings of the query
    string's trigrams (a doc must hold ALL of them — countDistinct ==
    n_query_trigrams), then verify the surviving candidates with one
    real ``contains`` probe. This is the standard trigram-index LIKE
    acceleration (pg_trgm / code-search style): the full scan touches
    every byte of every document, the index path touches only the
    posting lists plus the (tiny) candidate set — at 100 TB the
    posting table is built once and amortized across queries, and the
    verify step reads ~0.001% of the corpus. The oracle is the direct
    full-scan LIKE, so the check proves the index path EXACT (trigram
    intersection can only over-generate; verification closes it)."""
    docs = _docs_par(spark, sf_dir).select("doc_id", "text")
    q = TRIGRAM_QUERY
    q_grams = sorted({q[i : i + 3] for i in range(len(q) - 2)})
    # posting list build: explode distinct char-trigrams per doc,
    # pre-filtered to the query's grams (a stored index would skip the
    # filter; pruning here keeps the fixture query self-contained)
    grams = F.array_distinct(
        F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
    )
    postings = docs.select(
        "doc_id", F.explode(grams).alias("gram")
    ).filter(F.col("gram").isin(*q_grams))
    cands = (
        postings.groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hit"))
        .filter(F.col("n_hit") == len(q_grams))
        .select("doc_id")
    )
    verified = docs.join(F.broadcast(cands), "doc_id").filter(
        F.col("text").contains(q)
    )
    return verified.select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars")
    )


def _trigram_search_sql() -> str:
    q = TRIGRAM_QUERY.replace("'", "''")
    return f"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
WHERE contains(text, '{q}')
"""


def source_length_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped closed-form OLS — per source, the least-squares slope
    and intercept of n_chars on token count, the shape of every
    per-segment trend fit in an analytics engine. The normal equations
    run on EXACT integer sums (x and y are integers, so Σx, Σy, Σxy,
    Σx² are BIGINTs accumulated associatively — one map-side-combining
    aggregate, no float summation-order drift); the final slope =
    (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) is emitted as numerator/denominator
    plus a q6 integer quotient, so both engines agree bit-for-bit."""
    docs = _t(spark, sf_dir, "documents").select("source", "text", "n_chars")
    x = F.size(tokens_col("text")).cast("bigint")
    y = F.col("n_chars").cast("bigint")
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    return agg.select(
        "source",
        "n",
        F.expr("n * sxy - sx * sy").alias("slope_num"),
        F.expr("n * sxx - sx * sx").alias("slope_den"),
        F.expr("(n * sxy - sx * sy) * 1000000L div (n * sxx - sx * sx)").alias(
            "slope_q6"
        ),
        # intercept = (sy - slope*sx)/n, in the same q6 fixed point
        F.expr(
            "(sy * 1000000L - ((n * sxy - sx * sy) * 1000000L"
            " div (n * sxx - sx * sx)) * sx) div n"
        ).alias("intercept_q6"),
    )


_LENGTH_TREND_SQL = """
WITH t AS (
  SELECT source,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS x,
         CAST(n_chars AS BIGINT) AS y
  FROM documents
), a AS (
  SELECT source, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM t GROUP BY source
)
SELECT source, n,
       n * sxy - sx * sy AS slope_num,
       n * sxx - sx * sx AS slope_den,
       (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS slope_q6,
       (sy * 1000000 - ((n * sxy - sx * sy) * 1000000
          // (n * sxx - sx * sx)) * sx) // n AS intercept_q6
FROM a
"""


def source_median_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (lower median on even counts — a fixed,
    engine-independent tie rule) of document length per source, via
    one ranking window over (n_chars, doc_id) and the row at
    position ceil(n/2). The global exact-percentile query covers the
    corpus; this is the grouped variant every mixture report needs.
    At scale the window partitions by source — bounded by the largest
    source, not the corpus."""
    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    ranked = docs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("source"))
    )
    return (
        ranked.filter(F.expr("rn = (n + 1) div 2"))
        .select(
            "source",
            F.col("n_chars").alias("median_chars"),
            F.col("n").alias("n_docs"),
        )
    )


_MEDIAN_CHARS_SQL = """
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source, n_chars AS median_chars, CAST(n AS BIGINT) AS n_docs
FROM r WHERE rn = (n + 1) // 2
"""


def source_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics: the 5%-trimmed mean of document
    length per source — drop the ⌊n/20⌋ shortest and longest docs (by
    the (n_chars, doc_id) total order, so the trim set is exact and
    engine-independent) and integer-average the rest. The outlier-
    resistant summary a corpus mix report quotes next to the plain
    mean; emitted as exact BIGINTs (sum div count)."""
    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    ranked = docs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("source"))
    )
    kept = ranked.filter(
        F.expr("rn > n div 20 AND rn <= n - (n div 20)")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_chars").cast("bigint")).alias("sum_chars"),
        F.expr("sum(cast(n_chars as bigint)) div count(1)").alias(
            "trimmed_mean_chars"
        ),
    )


_TRIMMED_MEAN_SQL = """
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS trimmed_mean_chars
FROM r WHERE rn > n // 20 AND rn <= n - (n // 20)
GROUP BY source
"""


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-bounded fuzzy matching: Levenshtein distance over the
    first 64 characters for every MinHash-LSH candidate pair — the
    character-level second opinion next to the token-level Jaccard
    verify (catches small in-word edits Jaccard's word shingles
    miss). Spark's levenshtein() and DuckDB's levenshtein() are the
    same classic integer DP, so the twin is exact. The O(64^2) DP runs
    ONLY on LSH candidates — never all pairs — the same discipline as
    every verification join here."""
    from ..operators.dedup import candidate_pairs, minhash_band_rows

    docs = _docs_par(spark, sf_dir)
    cand = candidate_pairs(minhash_band_rows(docs))
    pfx = docs.select(
        "doc_id", F.substring("text", 1, 64).alias("p")
    )
    a = pfx.select(F.col("doc_id").alias("doc_id_a"), F.col("p").alias("p_a"))
    b = pfx.select(F.col("doc_id").alias("doc_id_b"), F.col("p").alias("p_b"))
    return (
        cand.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.levenshtein("p_a", "p_b").cast("bigint").alias("prefix_edit_dist"),
            (F.levenshtein("p_a", "p_b") <= 8).alias("near_identical_prefix"),
        )
    )


def _edit_distance_sql() -> str:
    return f"""
WITH cand AS ({_minhash_sql()}),
pfx AS (
  SELECT doc_id, substr(text, 1, 64) AS p FROM documents
)
SELECT c.doc_id_a, c.doc_id_b,
       CAST(levenshtein(a.p, b.p) AS BIGINT) AS prefix_edit_dist,
       levenshtein(a.p, b.p) <= 8 AS near_identical_prefix
FROM cand c
JOIN pfx a ON a.doc_id = c.doc_id_a
JOIN pfx b ON b.doc_id = c.doc_id_b
"""


def token_source_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index aggregation: for each sufficiently frequent token,
    a 20-bit presence bitmap over the src0..src19 sources built with
    bit_or(1 << src_id) — the roaring-bitmap-style set representation
    that makes cross-segment membership tests one integer AND at query
    time. array_distinct before the explode bounds the shuffle at
    distinct (token, source) pairs; the bitmap aggregate is map-side
    combining (bit_or is associative)."""
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select(
        F.explode(F.array_distinct(tokens_col("text"))).alias("token"),
        F.substring("source", 4, 2).cast("int").alias("src_id"),
    ).distinct()
    bm = toks.groupBy("token").agg(
        F.expr("bit_or(cast(pow(2, src_id) as bigint))").alias("source_bitmap"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return bm.filter(F.col("n_sources") >= 10).select(
        "token",
        "source_bitmap",
        "n_sources",
        F.expr("bit_count(source_bitmap)").cast("bigint").alias("popcount"),
    )


_TOKEN_BITMAP_SQL = """
WITH t AS (
  SELECT DISTINCT token,
         CAST(substr(source, 4, 2) AS INTEGER) AS src_id
  FROM (
    SELECT source, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
             AS token
    FROM documents
  )
), bm AS (
  SELECT token,
         CAST(bit_or(CAST(pow(2, src_id) AS BIGINT)) AS BIGINT) AS source_bitmap,
         COUNT(*) AS n_sources
  FROM t GROUP BY token
)
SELECT token, source_bitmap, n_sources,
       CAST(bit_count(source_bitmap) AS BIGINT) AS popcount
FROM bm WHERE n_sources >= 10
"""


_REGISTRY = {
    "dedup_edit_distance": (dedup_edit_distance, _edit_distance_sql()),
    "token_source_bitmap": (token_source_bitmap, _TOKEN_BITMAP_SQL),
    "source_trimmed_mean": (source_trimmed_mean, _TRIMMED_MEAN_SQL),
    "source_length_trend": (source_length_trend, _LENGTH_TREND_SQL),
    "source_median_chars": (source_median_chars, _MEDIAN_CHARS_SQL),
    "trigram_index_search": (trigram_index_search, _trigram_search_sql()),
    "dedup_minhash_calibration": (
        dedup_minhash_calibration,
        _minhash_calibration_sql(),
    ),
    "quantile_sample_audit": (quantile_sample_audit, _QSAMP_AUDIT_SQL),
    "table_profile_census": (table_profile_census, _profile_sql()),
    "text_token_stats": (text_token_stats, _TOKEN_STATS_SQL),
    "text_quality": (text_quality, _TEXT_QUALITY_SQL),
    "doc_fingerprint": (doc_fingerprint, _FINGERPRINT_SQL),
    "dedup_exact": (dedup_exact, _DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, _JACCARD_SQL),
    "dedup_jaccard_prefix": (dedup_jaccard_prefix, _JACCARD_PREFIX_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, _minhash_sql()),
    "dedup_minhash_verified": (dedup_minhash_verified, _minhash_verified_sql()),
    "dedup_components": (dedup_components, _components_sql()),
    "dedup_keep_census": (dedup_keep_census, _keep_census_sql()),
    "dedup_keep_best_census": (dedup_keep_best_census, _keep_best_census_sql()),
    "dup_span_census": (dup_span_census, _DUP_SPAN_CENSUS_SQL),
    "dup_span_clean": (dup_span_clean, _DUP_SPAN_CLEAN_SQL),
    "doc_rolling_fingerprints": (doc_rolling_fingerprints, _ROLLING_FP_SQL),
    "dedup_simhash": (dedup_simhash, _simhash_sql(pairs=False)),
    "dedup_simhash_pairs": (dedup_simhash_pairs, _simhash_sql(pairs=True)),
    "lang_distribution": (lang_distribution, _LANG_DIST_SQL),
    "doc_containment": (doc_containment, _CONTAINMENT_SQL),
    "tfidf_top_terms": (tfidf_top_terms, _TFIDF_SQL),
    "textrank_keywords": (textrank_keywords, _textrank_sql()),
    "bpe_pair_census": (bpe_pair_census, _BPE_PAIR_SQL),
    "bpe_train_merges": (bpe_train_merges, _bpe_train_sql()),
    "heavy_hitters_cms": (heavy_hitters_cms, _CMS_SQL),
    "bpe_encode_census": (bpe_encode_census, _bpe_encode_sql()),
    "readability_census": (readability_census, _READABILITY_SQL),
    "bm25_topk": (bm25_topk, _BM25_SQL),
    "benchmark_decontamination": (benchmark_decontamination, _DECONTAM_SQL),
    "decontamination_clean": (decontamination_clean, _DECONTAM_CLEAN_SQL),
    "dedup_cluster_histogram": (dedup_cluster_histogram, _cluster_hist_sql()),
    "source_overlap_matrix": (source_overlap_matrix, _OVERLAP_SQL),
    "quality_repetition": (quality_repetition, _REPETITION_SQL),
    "corpus_mixture_weights": (corpus_mixture_weights, _MIXTURE_SQL),
    "doc_shard_assignment": (doc_shard_assignment, _SHARD_SQL),
    "vocab_growth_census": (vocab_growth_census, _VOCAB_GROWTH_SQL),
    "token_entropy_census": (token_entropy_census, _ENTROPY_SQL),
    "phrase_search_census": (phrase_search_census, _phrase_sql()),
    "mixture_temperature_plan": (mixture_temperature_plan, _MIX_TEMP_SQL),
    "dedup_threshold_sweep": (dedup_threshold_sweep, _threshold_sweep_sql()),
    "stopword_discovery": (stopword_discovery, _STOPWORD_DISCOVERY_SQL),
    "bm25_mrr_eval": (bm25_mrr_eval, _bm25_mrr_sql()),
    "dedup_banding_sweep": (dedup_banding_sweep, _banding_sweep_sql()),
}
