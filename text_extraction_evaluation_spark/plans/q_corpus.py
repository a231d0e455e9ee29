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


_REGISTRY = {
    "dedup_edit_distance": (dedup_edit_distance, _edit_distance_sql()),
    "source_trimmed_mean": (source_trimmed_mean, _TRIMMED_MEAN_SQL),
    "source_length_trend": (source_length_trend, _LENGTH_TREND_SQL),
    "source_median_chars": (source_median_chars, _MEDIAN_CHARS_SQL),
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
    "dedup_cluster_histogram": (dedup_cluster_histogram, _cluster_hist_sql()),
    "dedup_threshold_sweep": (dedup_threshold_sweep, _threshold_sweep_sql()),
    "dedup_banding_sweep": (dedup_banding_sweep, _banding_sweep_sql()),
}
