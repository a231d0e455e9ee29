"""LM-based training-mix curation: the two published selection stages
that sit between corpus hygiene and the final pretraining mix —

* **CCNet-style perplexity scoring** (Wenzek et al. 2020): score every
  document with an n-gram language model trained on a trusted
  reference subset; downstream mixes keep the low-perplexity head or
  stratify on it.
* **DSIR importance weights** (Xie et al. 2023): hashed-n-gram
  importance ratio log(p_target/p_raw) per document — the weight that
  resamples a raw crawl toward a target domain.

Plus the stages that grew around them: perplexity terciles
(ppl_bucket_census), fastText-shaped classifier inference
(quality_classifier_score), a SUPERVISED linear-probe training loop
(linear_probe_train — least-squares GD, integer-exact), GPT-style
sequence packing, and the 5-stage curation funnel.

Same contract as the other plans.q_* modules: each DataFrame plan has
a DuckDB twin with identically aliased columns.

Cross-engine determinism: the only transcendental is ``ln``, and it is
applied once per (count-ratio) term and immediately quantized to
integer micro-nats (``ROUND(ln(...) * 1e6)`` as BIGINT). Both engines
compute the same IEEE double ratio from exact integer counts, so the
inputs to ``ln`` are bit-identical; a 1-ulp libm difference flips the
rounded integer only when the value sits within ~1e-9 of a .5
boundary. Per-document results are exact BIGINT sums of those
quantized terms (aggregation-order independent); the reported
``avg``/``ppl`` doubles are derived from the integer sums by fixed
arithmetic, so they cannot drift with partial-aggregation topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import md5_int, tokens_col
from .common import _STOP_SQL, _docs_par

# Reference subset: a deterministic ~1/7 slice of the corpus stands in
# for the trusted LM training set (CCNet uses Wikipedia). Mirrored
# verbatim in every SQL twin.
REF_MOD = 7

# DSIR hashed-feature space (Xie et al. use 10k buckets; 4096 keeps
# the fixture's per-bucket counts dense enough to be interesting).
DSIR_BUCKETS = 4096


def _bigram_structs(tok):
    """Positional (w1, w2) bigrams as an array of structs — slice+zip
    (O(n) per row) rather than per-index element_at (O(n^2)); see
    functions.text.word_shingles_all for the measured rationale."""
    length = F.greatest(F.size(tok) - 1, F.lit(0))
    pre = F.slice(tok, 1, length)
    suf = F.slice(tok, 2, length)
    return F.zip_with(
        pre, suf, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )


def _corpus_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    return docs.select(
        "doc_id",
        "lang",
        F.explode(_bigram_structs(tokens_col("text"))).alias("bg"),
    ).select("doc_id", "lang", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def lm_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity scoring: train a Laplace-smoothed bigram
    LM on the reference slice (doc_id % 7 == 0), score EVERY document
    with mean negative log-likelihood per bigram and its exp
    (perplexity). P(w2|w1) = (C(w1 w2) + 1) / (C(w1 ·) + V), V = the
    reference's distinct-token vocabulary.

    Scale shape: the LM is a bounded artifact — its size tracks the
    REFERENCE vocabulary, not the corpus — so both count tables ride
    as broadcasts (CCNet ships its wiki LM to every worker the same
    way) and the scoring join is map-side. The bigram explode keeps
    each document's rows in one partition, so the per-doc aggregate
    collapses map-side and the only shuffle carries one row per
    document. Counts are exact integers; the single ln per bigram is
    quantized to micro-nats and summed as BIGINT (module docstring)."""
    bg = _corpus_bigrams(spark, sf_dir)
    ref = bg.filter(F.col("doc_id") % REF_MOD == 0)
    lm = ref.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = lm.groupBy("w1").agg(F.sum("c2").alias("c1"))
    docs = _docs_par(spark, sf_dir)
    vocab = (
        docs.filter(F.col("doc_id") % REF_MOD == 0)
        .select(F.explode(tokens_col("text")).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    nll_e6 = F.round(
        F.log(
            (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
            / (F.coalesce(F.col("c2"), F.lit(0)) + 1)
        )
        * 1e6
    ).cast("bigint")
    scored = (
        bg.join(F.broadcast(lm), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(vocab))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("c2").isNull().cast("bigint")).alias("n_oov"),
            F.sum(nll_e6).alias("sum_nll_e6"),
        )
    )
    # Truncating integer division BEFORE the float cast: sum_nll_e6 is
    # a micro-nat BIGINT and n_bigrams an exact count, so the quotient
    # in micro-nats is engine-exact, and /1e6 is then a single IEEE op
    # on identical inputs. (A ROUND(x, 6) here hit an exact decimal tie
    # at sf0.1 — 81578244/24 = 3399093.5 µnats — where Spark and DuckDB
    # legitimately disagree; integer truncation has no tie to disagree
    # on. Values are non-negative: ln((c1+v)/(c2+1)) >= 0 since
    # c1 >= c2 and v >= 1.)
    avg_nll = F.expr("sum_nll_e6 DIV n_bigrams").cast("double") / F.lit(1e6)
    return scored.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "n_oov",
        "sum_nll_e6",
        avg_nll.alias("avg_nll"),
        F.round(F.exp(avg_nll), 3).alias("ppl"),
        (F.col("doc_id") % REF_MOD == 0).alias("is_ref"),
    )


_BIGRAM_CTE = """
t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
), bg AS (
  SELECT doc_id, lang, unnest([{'w1': w[i], 'w2': w[i+1]}
                               for i in range(1, len(w))]) AS b
  FROM t WHERE len(w) >= 2
), bgf AS (
  SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM bg
)
"""

_PPL_SQL = f"""
WITH {_BIGRAM_CTE},
ref AS (SELECT * FROM bgf WHERE doc_id % {REF_MOD} = 0),
lm AS (SELECT w1, w2, COUNT(*) AS c2 FROM ref GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(c2) AS c1 FROM lm GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT tok) AS v FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents WHERE doc_id % {REF_MOD} = 0
  )
),
scored AS (
  SELECT doc_id, lang,
         COUNT(*) AS n_bigrams,
         SUM(CASE WHEN lm.c2 IS NULL THEN 1 ELSE 0 END) AS n_oov,
         SUM(CAST(ROUND(ln(CAST(COALESCE(ctx.c1, 0) + v AS DOUBLE)
                            / (COALESCE(lm.c2, 0) + 1)) * 1e6) AS BIGINT))
           AS sum_nll_e6
  FROM bgf
  LEFT JOIN lm USING (w1, w2)
  LEFT JOIN ctx USING (w1)
  CROSS JOIN vocab
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_bigrams,
       CAST(n_oov AS BIGINT) AS n_oov,
       CAST(sum_nll_e6 AS BIGINT) AS sum_nll_e6,
       CAST(sum_nll_e6 // n_bigrams AS DOUBLE) / 1e6 AS avg_nll,
       ROUND(exp(CAST(sum_nll_e6 // n_bigrams AS DOUBLE) / 1e6), 3)
         AS ppl,
       doc_id % {REF_MOD} = 0 AS is_ref
FROM scored
"""


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hash every bigram
    into a fixed feature space, estimate Laplace-smoothed feature
    distributions for the TARGET slice (the reference subset) and the
    RAW remainder, and give each document the log importance weight
    sum_f count_f(doc) * ln(p_target(f) / p_raw(f)). Documents whose
    weight is high look like the target domain and get up-sampled in
    the published recipe.

    Scale shape: the feature space is fixed (4096 buckets), so the
    per-feature log-ratio table is a one-row-per-bucket broadcast —
    scoring is a map-side join + per-doc aggregate that collapses
    map-side (same shuffle story as lm_perplexity_score). The ratio
    ((ct+1)(Nr+B)) / ((cr+1)(Nt+B)) is built from exact integer
    products (< 2^53, exact in doubles) before the single quantized
    ln per bucket."""
    bg = _corpus_bigrams(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.pmod(md5_int(F.concat_ws(" ", "w1", "w2")), F.lit(DSIR_BUCKETS)).alias(
            "f"
        ),
    )
    is_target = F.col("doc_id") % REF_MOD == 0
    feats = bg.groupBy("f").agg(
        F.sum(is_target.cast("bigint")).alias("ct"),
        F.sum((~is_target).cast("bigint")).alias("cr"),
    )
    totals = feats.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    lr_e6 = F.round(
        F.log(
            ((F.col("ct") + 1) * (F.col("nr") + DSIR_BUCKETS)).cast("double")
            / ((F.col("cr") + 1) * (F.col("nt") + DSIR_BUCKETS))
        )
        * 1e6
    ).cast("bigint")
    ratio = feats.join(F.broadcast(totals)).select("f", lr_e6.alias("lr_e6"))
    scored = (
        bg.join(F.broadcast(ratio), "f", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce(F.col("lr_e6"), F.lit(0))).alias("log_weight_e6"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_feats",
        "log_weight_e6",
        F.round(F.col("log_weight_e6").cast("double") / 1e6, 6).alias(
            "log_weight"
        ),
        (F.col("doc_id") % REF_MOD == 0).alias("is_target"),
    )


_DSIR_SQL = f"""
WITH {_BIGRAM_CTE},
feat AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(w1 || ' ' || w2), 1, 15))::BIGINT
           % {DSIR_BUCKETS} AS f
  FROM bgf
),
counts AS (
  SELECT f,
         SUM(CASE WHEN doc_id % {REF_MOD} = 0 THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN doc_id % {REF_MOD} = 0 THEN 0 ELSE 1 END) AS cr
  FROM feat GROUP BY f
),
totals AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM counts),
ratio AS (
  SELECT f,
         CAST(ROUND(ln(CAST((ct + 1) * (nr + {DSIR_BUCKETS}) AS DOUBLE)
                       / ((cr + 1) * (nt + {DSIR_BUCKETS}))) * 1e6) AS BIGINT)
           AS lr_e6
  FROM counts CROSS JOIN totals
),
scored AS (
  SELECT doc_id, lang, COUNT(*) AS n_feats,
         SUM(COALESCE(lr_e6, 0)) AS log_weight_e6
  FROM feat LEFT JOIN ratio USING (f)
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_feats,
       CAST(log_weight_e6 AS BIGINT) AS log_weight_e6,
       ROUND(CAST(log_weight_e6 AS DOUBLE) / 1e6, 6) AS log_weight,
       doc_id % {REF_MOD} = 0 AS is_target
FROM scored
"""


def ppl_bucket_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's final cut: split each language's documents into
    perplexity terciles (head / middle / tail) and report the
    per-(lang, bucket) census — doc count, token mass, and the
    integer NLL range — the table a mix planner reads to decide which
    buckets feed the training mix.

    Determinism: ntile runs over (avg_nll, doc_id) — the rounded
    double is identical cross-engine (derived from exact integer sums,
    module docstring) and doc_id breaks ties totally.

    Scale shape: the per-doc scoring is `lm_perplexity_score`'s
    broadcast plan; the tercile window partitions BY LANGUAGE — wide
    corpora have few languages, so at 100 TB this is the one stage
    CCNet itself does per-language on a sample: cut thresholds come
    from a per-lang sample or the exact-percentile pattern
    (`corpus_length_percentiles`), never a single global sort. The
    fixture-exact ntile keeps the oracle sharp; the census output is
    O(langs * 3) rows either way."""
    scored = lm_perplexity_score(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    bucketed = scored.withColumn("tercile", F.ntile(3).over(w)).withColumn(
        "bucket",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.col("tercile"),
        ),
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").alias("n_bigrams"),
        F.min("sum_nll_e6").alias("min_nll_e6"),
        F.max("sum_nll_e6").alias("max_nll_e6"),
    )


_PPL_BUCKET_SQL = f"""
WITH scored AS ({_PPL_SQL}),
b AS (
  SELECT lang, n_bigrams, sum_nll_e6,
         NTILE(3) OVER (PARTITION BY lang ORDER BY avg_nll, doc_id)
           AS tercile
  FROM scored
)
SELECT lang,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
       CAST(MIN(sum_nll_e6) AS BIGINT) AS min_nll_e6,
       CAST(MAX(sum_nll_e6) AS BIGINT) AS max_nll_e6
FROM b GROUP BY lang, bucket
"""


# Sequence packing: context-window token budget and the shard fan-out
# of the pre-training writer. Shard count scales with the cluster at
# 100 TB (thousands); 8 keeps the fixture's per-shard streams long
# enough to cross many sequence boundaries.
PACK_SEQ_LEN = 512
PACK_SHARDS = 8


def pack_coordinates(docs: DataFrame) -> DataFrame:
    """Core of `sequence_packing`, reusable over any document set
    (the curation job packs the CURATED survivors, not the raw
    corpus): docs must carry (doc_id, text)."""
    h = md5_int(F.col("doc_id").cast("string"))
    d = docs.select(
        "doc_id",
        F.size(tokens_col("text")).cast("bigint").alias("n_tokens"),
        h.alias("h"),
    ).withColumn("shard", F.pmod(F.col("h"), F.lit(PACK_SHARDS)))
    win = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum", F.sum("n_tokens").over(win))
    start = F.col("cum") - F.col("n_tokens")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr(f"(cum - n_tokens) DIV {PACK_SEQ_LEN}").alias("seq_idx"),
        (start % PACK_SEQ_LEN).alias("seq_offset"),
        (
            F.expr(f"(cum - CAST(1 AS BIGINT)) DIV {PACK_SEQ_LEN}")
            > F.expr(f"(cum - n_tokens) DIV {PACK_SEQ_LEN}")
        ).alias("spans_boundary"),
    )


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the last hop before tokens hit the trainer:
    documents are globally shuffled (hash order), fanned out to
    shards, and packed CONTIGUOUSLY into fixed-token-budget sequences
    (GPT-style concat-and-chunk: a document may span a sequence
    boundary; ``spans_boundary`` counts those). Emits each document's
    (shard, sequence, offset) coordinate — the index a random-access
    training loader needs.

    Determinism: the "shuffle" is md5(doc_id) — a reproducible
    permutation, same property a seeded epoch shuffle gives the
    trainer. Both the shard fan-out and the intra-shard order derive
    from it.

    Scale shape: one hash-partition shuffle to shards, then the
    running token sum is a window PER SHARD — parallel across shards,
    bounded per task by corpus/#shards (shard count scales with the
    cluster; `doc_shard_assignment` shows the bucket-decomposed prefix
    sum if even one shard's stream outgrows a task). No global
    single-task window anywhere."""
    return pack_coordinates(_docs_par(spark, sf_dir))


_PACK_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents
), c AS (
  SELECT doc_id, n_tokens, h % {PACK_SHARDS} AS shard,
         SUM(n_tokens) OVER (PARTITION BY h % {PACK_SHARDS}
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d
)
SELECT doc_id, shard, n_tokens,
       CAST((cum - n_tokens) // {PACK_SEQ_LEN} AS BIGINT) AS seq_idx,
       CAST((cum - n_tokens) % {PACK_SEQ_LEN} AS BIGINT) AS seq_offset,
       (cum - 1) // {PACK_SEQ_LEN} > (cum - n_tokens) // {PACK_SEQ_LEN}
         AS spans_boundary
FROM c
"""


def c4_quality_keep(w) -> "F.Column":
    """`quality_filter`'s exact C4-style keep rule as a map-side
    expression over a token array (shared by the funnel query and the
    curation job)."""
    from .common import STOPWORDS_SORTED

    n_tok = F.size(w)
    mean_len = F.aggregate(
        w, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
    ).cast("double") / n_tok
    stop_ratio = (
        F.size(F.filter(w, lambda t: F.lower(t).isin(*STOPWORDS_SORTED))).cast(
            "double"
        )
        / n_tok
    )
    return (
        (n_tok >= 50)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (stop_ratio >= 0.05)
    )


def gopher_repetition_pass(w) -> "F.Column":
    """`quality_repetition`'s pure-integer pass rule as a map-side
    expression over a token array (shared by the funnel query and the
    curation job)."""
    from ..functions.text import word_shingles_all

    n_tok = F.size(w)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(w), lambda x: F.size(F.filter(w, lambda y: y == x))
        )
    )
    sh2, sh3 = word_shingles_all(w, 2), word_shingles_all(w, 3)
    total2, total3 = F.size(sh2), F.size(sh3)
    dup2 = total2 - F.size(F.array_distinct(sh2))
    dup3 = total3 - F.size(F.array_distinct(sh3))
    return ~((top_cnt * 5 > n_tok) | (dup2 * 2 > total2) | (dup3 * 5 > total3))


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE declarative plan — the
    DataComp/RefinedWeb-style funnel every pretraining corpus walks,
    with the per-stage census (docs in / out / dropped) that data
    reports publish:

      1. exact_dedup — keep the min doc_id per exact text
      2. quality    — C4 heuristic gate (`quality_filter`'s rule)
      3. repetition — Gopher integer rules (`quality_repetition`)
      4. near_dup   — MinHash-LSH → verified Jaccard → connected
                      components, drop non-minimum members
      5. ppl_tail   — drop the per-language perplexity tail tercile

    Stage artifacts that are corpus-level statistics (the near-dup
    component graph, the perplexity tercile cuts) are computed over
    the FULL corpus and applied as filters — exactly how production
    pipelines stage them (dedup runs once corpus-wide; CCNet's cuts
    come from the corpus distribution), and what keeps the funnel a
    pure conjunction: each stage's census is the count of docs passing
    flags 1..k, so n_in(k) == n_out(k-1) by construction.

    Scale shape: every flag is a column — one text-key window (same
    shuffle class as `dedup_exact`), the broadcast near-dup drop list
    (tiny: only docs IN a dup component), the broadcast tercile table
    (from `lm_perplexity_score`'s broadcast plan), and map-side
    quality/repetition expressions. The census is a single one-row
    aggregate stacked to 5 rows — no per-stage corpus passes."""
    from ..operators.dedup import connected_components, verified_near_dup_pairs

    docs = _docs_par(spark, sf_dir)
    w = tokens_col("text")

    # stage 1: exact dedup
    f1 = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("text"))
    # stages 2-3: map-side rules shared with the curation job
    f2 = c4_quality_keep(w)
    f3 = gopher_repetition_pass(w)

    base = docs.select(
        "doc_id",
        f1.alias("f1"),
        f2.alias("f2"),
        f3.alias("f3"),
    )

    # stage 4: corpus-wide near-dup component drop list (broadcast)
    pairs = verified_near_dup_pairs(docs, threshold=0.8)
    drops = (
        connected_components(pairs)
        .filter(F.col("doc_id") != F.col("component"))
        .select("doc_id", F.lit(True).alias("dropped"))
    )

    # stage 5: per-lang perplexity tercile (3 == tail), full corpus
    scored = lm_perplexity_score(spark, sf_dir)
    terc = scored.select(
        "doc_id",
        F.ntile(3)
        .over(Window.partitionBy("lang").orderBy("avg_nll", "doc_id"))
        .alias("tercile"),
    )

    flags = (
        base.join(F.broadcast(drops), "doc_id", "left")
        .join(F.broadcast(terc), "doc_id", "left")
        .select(
            "f1",
            "f2",
            "f3",
            F.coalesce(~F.col("dropped"), F.lit(True)).alias("f4"),
            F.coalesce(F.col("tercile") != 3, F.lit(True)).alias("f5"),
        )
    )
    b = lambda c: c.cast("bigint")  # noqa: E731
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(b(F.col("f1"))).alias("n1"),
        F.sum(b(F.col("f1") & F.col("f2"))).alias("n2"),
        F.sum(b(F.col("f1") & F.col("f2") & F.col("f3"))).alias("n3"),
        F.sum(b(F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4"))).alias(
            "n4"
        ),
        F.sum(
            b(F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4") & F.col("f5"))
        ).alias("n5"),
    )
    return agg.select(
        F.expr(
            "stack(5,"
            " CAST(1 AS BIGINT), 'exact_dedup', n0, n1,"
            " CAST(2 AS BIGINT), 'quality',     n1, n2,"
            " CAST(3 AS BIGINT), 'repetition',  n2, n3,"
            " CAST(4 AS BIGINT), 'near_dup',    n3, n4,"
            " CAST(5 AS BIGINT), 'ppl_tail',    n4, n5)"
            " AS (stage_ord, stage, n_in, n_out)"
        )
    ).withColumn("n_dropped", F.col("n_in") - F.col("n_out"))


def _funnel_sql() -> str:
    from .q_corpus import _minhash_verified_sql
    from .common import _STOP_SQL

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
drops AS (SELECT doc_id FROM comp WHERE doc_id <> component),
scored AS ({_PPL_SQL}),
terc AS (
  SELECT doc_id,
         NTILE(3) OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS tercile
  FROM scored
),
base AS (
  SELECT doc_id, lang,
         regexp_split_to_array(trim(text), '\\s+') AS w,
         MIN(doc_id) OVER (PARTITION BY text) AS min_id
  FROM documents
),
m AS (
  SELECT doc_id, min_id, w, len(w) AS n,
         CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
           / len(w) AS mean_len,
         CAST(len(list_filter(w, t -> list_contains([{_STOP_SQL}], lower(t))))
              AS DOUBLE) / len(w) AS stop_ratio,
         list_max(list_transform(list_distinct(w),
                                 x -> len(list_filter(w, y -> y = x)))) AS top_cnt,
         [array_to_string(w[i:i+1], ' ')
          FOR i IN range(1, GREATEST(len(w) - 0, 1))] AS sh2,
         [array_to_string(w[i:i+2], ' ')
          FOR i IN range(1, GREATEST(len(w) - 1, 1))] AS sh3
  FROM base
),
flags AS (
  SELECT m.doc_id,
         (m.doc_id = m.min_id) AS f1,
         (n >= 50 AND mean_len >= 3.0 AND mean_len <= 10.0
          AND stop_ratio >= 0.05) AS f2,
         NOT (top_cnt * 5 > n
              OR (len(sh2) - len(list_distinct(sh2))) * 2 > len(sh2)
              OR (len(sh3) - len(list_distinct(sh3))) * 5 > len(sh3)) AS f3,
         (d.doc_id IS NULL) AS f4,
         COALESCE(t.tercile <> 3, TRUE) AS f5
  FROM m
  LEFT JOIN drops d ON d.doc_id = m.doc_id
  LEFT JOIN terc t ON t.doc_id = m.doc_id
),
agg AS (
  SELECT COUNT(*) AS n0,
         SUM(CAST(f1 AS BIGINT)) AS n1,
         SUM(CAST(f1 AND f2 AS BIGINT)) AS n2,
         SUM(CAST(f1 AND f2 AND f3 AS BIGINT)) AS n3,
         SUM(CAST(f1 AND f2 AND f3 AND f4 AS BIGINT)) AS n4,
         SUM(CAST(f1 AND f2 AND f3 AND f4 AND f5 AS BIGINT)) AS n5
  FROM flags
)
SELECT stage_ord, stage, CAST(n_in AS BIGINT) AS n_in,
       CAST(n_out AS BIGINT) AS n_out,
       CAST(n_in - n_out AS BIGINT) AS n_dropped FROM (
  SELECT CAST(1 AS BIGINT) AS stage_ord, 'exact_dedup' AS stage,
         n0 AS n_in, n1 AS n_out FROM agg
  UNION ALL SELECT CAST(2 AS BIGINT), 'quality',    n1, n2 FROM agg
  UNION ALL SELECT CAST(3 AS BIGINT), 'repetition', n2, n3 FROM agg
  UNION ALL SELECT CAST(4 AS BIGINT), 'near_dup',   n3, n4 FROM agg
  UNION ALL SELECT CAST(5 AS BIGINT), 'ppl_tail',   n4, n5 FROM agg
)
"""


# -- module registry (merged into plans.queries.SQL_CHECKED) ----------------
# ---------------------------------------------------------------------------
# fastText-shaped quality classifier inference (hashed linear model)
# ---------------------------------------------------------------------------

# Hashed feature space for the linear classifier (unigrams + bigrams
# -> buckets). Weights are integer-quantized per-mille so the per-doc
# sum is exact under any aggregation order.
QC_BUCKETS = 2048
QC_WEIGHT_SPAN = 1000  # wq in [-1000, 1000] ~ weight in [-1, 1]


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier INFERENCE in the fastText shape used
    by the GPT-3/LLaMA/CCNet curation pipelines: hash unigram+bigram
    features into a fixed bucket space, sum the buckets' weights, and
    squash to a [0,1] quality score (documents below the gate are
    dropped or downsampled by the mix builder).

    The weight table here is a frozen deterministic stand-in (weight
    of bucket b = md5-derived integer in [-1000, 1000] per-mille) —
    the sandbox has no trained model, and the operator's substance is
    the INFERENCE plan: at 100 TB this is a pure map-only pass — token
    split, per-feature hash, and the weight fold all happen inside one
    projection with ZERO shuffle and zero Python; a trained model
    swaps in as a broadcast weight array without changing the plan.

    Cross-engine determinism: weights are integers, the per-doc sum is
    an exact BIGINT fold in array order, and the label gate compares
    the integer sum (never the float score); the sigmoid is computed
    once from the exact mean and rounded to 6dp."""
    docs = _docs_par(spark, sf_dir)
    tok = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    length = F.greatest(F.size(tok) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(tok, 1, length),
        F.slice(tok, 2, length),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    feats = F.concat(tok, bigrams)
    wq = F.transform(
        feats,
        lambda f: F.pmod(
            md5_int(
                F.concat(
                    F.lit("w#"),
                    F.pmod(md5_int(f), F.lit(QC_BUCKETS)).cast("string"),
                )
            ),
            F.lit(2 * QC_WEIGHT_SPAN + 1),
        )
        - F.lit(QC_WEIGHT_SPAN),
    )
    w_sum = F.aggregate(
        wq, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    out = docs.select(
        "doc_id",
        "lang",
        F.size(feats).alias("n_feats"),
        w_sum.alias("w_sum_q"),
    )
    mean = F.col("w_sum_q") / (F.col("n_feats") * F.lit(float(QC_WEIGHT_SPAN)))
    return out.select(
        "doc_id",
        "lang",
        "n_feats",
        "w_sum_q",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean)), 6).alias("score"),
        F.when(F.col("w_sum_q") >= 0, F.lit("good"))
        .otherwise(F.lit("low"))
        .alias("label"),
    )


_QC_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         string_split_regex(trim(lower(text)), '\\s+') AS tok
  FROM documents
), f AS (
  SELECT doc_id, lang, unnest(tok) AS feat FROM t
  UNION ALL
  SELECT doc_id, lang, tok[i] || ' ' || tok[i + 1] AS feat
  FROM (
    SELECT doc_id, lang, tok,
           unnest(generate_series(1, greatest(len(tok) - 1, 0))) AS i
    FROM t
  )
), w AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('w#' || CAST(
              ('0x' || substr(md5(feat), 1, 15))::BIGINT % {QC_BUCKETS}
          AS VARCHAR)), 1, 15))::BIGINT % {2 * QC_WEIGHT_SPAN + 1}
           - {QC_WEIGHT_SPAN} AS wq
  FROM f
), s AS (
  SELECT doc_id, lang, COUNT(*) AS n_feats, SUM(wq) AS w_sum_q
  FROM w GROUP BY 1, 2
)
SELECT doc_id, lang, CAST(n_feats AS INTEGER) AS n_feats,
       CAST(w_sum_q AS BIGINT) AS w_sum_q,
       ROUND(1.0 / (1.0 + exp(-(w_sum_q / (n_feats * {QC_WEIGHT_SPAN}.0)))), 6)
         AS score,
       CASE WHEN w_sum_q >= 0 THEN 'good' ELSE 'low' END AS label
FROM s
"""


# ---------------------------------------------------------------------------
# Distributed supervised training: linear probe by least-squares GD
# ---------------------------------------------------------------------------

PROBE_BUCKETS = 64
PROBE_ITERS = 3
# Step divisor for the MEAN gradient. Stability needs 1/LR_DIV below
# 2/lambda_max(XtX/N); with ~100-token docs over 64 buckets lambda_max
# of the per-doc-normalized Gram is ~1e4, so 1e5 gives ~20x margin —
# and because the gradient is the MEAN over docs, the bound (hence
# this constant) is scale-invariant in corpus size.
PROBE_LR_DIV = 100_000
PROBE_TOPK = 10


def _tdiv(c, d: int):
    """Truncating integer division as a column expression —
    ``(c - c % d) / d`` with both engines' dividend-signed ``%``, so it
    matches DuckDB's ``//`` on negatives (both truncate toward zero)."""
    return ((c - c % F.lit(d)) / F.lit(d)).cast("bigint")


def linear_probe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPERVISED distributed training, the fourth training loop next
    to k-means (unsupervised), BPE (tokenizer), and PCA (spectral): a
    linear probe ``is-English?`` on hashed unigram-count features,
    fit by full-batch least-squares gradient descent — the trainable
    twin of ``quality_classifier_score``'s fixed-weight inference.
    Emits the top-|weight| feature buckets after ``PROBE_ITERS`` steps.

    Scale shape per iteration: predictions are one (doc) aggregate of
    the sparse feature rows joined to the ONE-ROW broadcast weight
    vector; the gradient is one (bucket) aggregate (64 keys) of
    feature×residual products; the update folds map-side into the next
    one-row weight array. No driver actions, no dense matrix — the
    feature matrix stays sparse (doc, bucket, count) rows throughout,
    exactly how a 10^9-doc probe fit runs.

    Determinism: counts, labels (micro-units), products, and sums are
    exact BIGINTs; the only divisions are truncating integer divs
    (mean gradient, then learning-rate step), identical in both
    engines — the whole trajectory is integer-exact."""
    docs = _docs_par(spark, sf_dir)
    y = (F.col("lang") == "en").cast("bigint").alias("y")
    words = docs.select(
        "doc_id", y, F.explode(tokens_col("text")).alias("w")
    ).filter(F.col("w") != "")
    bucket = F.pmod(
        md5_int(F.concat(F.col("w"), F.lit("#probe"))), F.lit(PROBE_BUCKETS)
    )
    feats = (
        words.groupBy("doc_id", bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("x"), F.min("y").alias("y"))
    )
    nd = feats.agg(F.count_distinct("doc_id").alias("n"))
    w_row = spark.range(1).select(
        F.array(*[F.lit(0).cast("bigint")] * PROBE_BUCKETS).alias("wv")
    )
    for _ in range(PROBE_ITERS):
        pred = (
            feats.crossJoin(F.broadcast(w_row))
            .withColumn(
                "t", F.col("x") * F.element_at("wv", F.col("b").cast("int") + 1)
            )
            .groupBy("doc_id")
            .agg(F.sum("t").alias("yhat"), F.min("y").alias("y"))
        )
        resid = pred.select(
            "doc_id", (F.col("yhat") - F.col("y") * F.lit(1_000_000)).alias("r")
        )
        g = (
            feats.join(resid, "doc_id")
            .groupBy("b")
            .agg(F.sum(F.col("x") * F.col("r")).alias("gs"))
            .crossJoin(F.broadcast(nd))
            .select("b", F.expr("gs div n").alias("gm"))
        )
        gmap = g.agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "gm"))
            ).alias("gmap")
        )
        w_row = w_row.crossJoin(F.broadcast(gmap)).select(
            F.transform(
                F.sequence(F.lit(0), F.lit(PROBE_BUCKETS - 1)),
                lambda i: F.element_at("wv", i.cast("int") + 1)
                - _tdiv(
                    F.coalesce(
                        F.element_at("gmap", i.cast("bigint")),
                        F.lit(0).cast("bigint"),
                    ),
                    PROBE_LR_DIV,
                ),
            ).alias("wv")
        )
    wt = w_row.select(F.posexplode("wv").alias("b", "wt"))
    rw = Window.orderBy(F.abs("wt").desc(), F.asc("b"))
    return (
        wt.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= PROBE_TOPK)
        .select(
            F.col("b").cast("int").alias("bucket"),
            "wt",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _probe_sql(
    iters: int = PROBE_ITERS,
    buckets: int = PROBE_BUCKETS,
    lr_div: int = PROBE_LR_DIV,
) -> str:
    parts = [
        f"""WITH wtok AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents
), feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(w || '#probe'), 1, 15))::BIGINT % {buckets} AS b,
         COUNT(*) AS x, MIN(y) AS y
  FROM wtok WHERE w <> '' GROUP BY 1, 2
), nd AS (
  SELECT COUNT(DISTINCT doc_id) AS n FROM feats
), w0 AS (
  SELECT d AS b, CAST(0 AS BIGINT) AS wt FROM range(0, {buckets}) t(d)
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""", pred{i} AS (
  SELECT f.doc_id, CAST(SUM(f.x * w.wt) AS BIGINT) AS yhat, MIN(f.y) AS y
  FROM feats f JOIN w{i - 1} w USING (b) GROUP BY 1
), g{i} AS (
  SELECT f.b,
         CAST(SUM(f.x * (p.yhat - p.y * 1000000)) AS BIGINT) // n AS gm
  FROM feats f JOIN pred{i} p USING (doc_id), nd
  GROUP BY f.b, nd.n
), w{i} AS (
  SELECT w.b, w.wt - COALESCE(g.gm, 0) // {lr_div} AS wt
  FROM w{i - 1} w LEFT JOIN g{i} g USING (b)
)""")
    parts.append(f"""
SELECT CAST(b AS INTEGER) AS bucket, CAST(wt AS BIGINT) AS wt,
       CAST(ROW_NUMBER() OVER (ORDER BY abs(wt) DESC, b) AS INTEGER) AS rank
FROM w{iters}
QUALIFY rank <= {PROBE_TOPK}""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Quality x perplexity contingency — do the two filters agree?
# ---------------------------------------------------------------------------


def quality_ppl_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-agreement audit: the 2x2 contingency between the
    C4-style quality gate and the perplexity signal (doc NLL below
    the corpus mean = 'head'). A mix designer reads this table to see
    whether the heuristic gate and the LM gate select the same
    documents or complement each other — the standard sanity check
    before stacking both in a funnel.

    'Below the corpus mean' is decided by EXACT integer cross-
    multiplication — sum_nll_e6 * total_bigrams < total_nll_e6 *
    n_bigrams — through DECIMAL(38,0)/HUGEINT, so no double division
    exists and no quantization boundary can disagree across engines.
    Scope: documents with at least one bigram (the only ones the LM
    scores), same as lm_perplexity_score.

    Scale shape: reuses the lm_perplexity_score plan (broadcast LM);
    the corpus total is a one-row broadcast; the quality flag is
    map-side over the token array; one 4-row hash aggregate ends it."""
    scored = lm_perplexity_score(spark, sf_dir).select(
        "doc_id", "n_bigrams", "sum_nll_e6"
    )
    tot = scored.agg(
        F.sum("sum_nll_e6").cast("decimal(38,0)").alias("tot_nll"),
        F.sum("n_bigrams").cast("decimal(38,0)").alias("tot_bg"),
    )
    docs = _docs_par(spark, sf_dir)
    w = tokens_col("text")
    flags = docs.select(
        "doc_id",
        c4_quality_keep(w).alias("quality_pass"),
        F.size(w).cast("bigint").alias("n_tokens"),
    )
    ppl_head = (
        F.col("sum_nll_e6").cast("decimal(38,0)") * F.col("tot_bg")
        < F.col("tot_nll") * F.col("n_bigrams").cast("decimal(38,0)")
    )
    return (
        scored.join(flags, "doc_id")
        .crossJoin(F.broadcast(tot))
        .groupBy("quality_pass", ppl_head.alias("ppl_head"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


_CONTINGENCY_SQL = f"""
WITH scored_full AS ({_PPL_SQL}),
scored AS (SELECT doc_id, n_bigrams, sum_nll_e6 FROM scored_full),
tot AS (
  SELECT CAST(SUM(sum_nll_e6) AS HUGEINT) AS tot_nll,
         CAST(SUM(n_bigrams) AS HUGEINT) AS tot_bg
  FROM scored
),
flags AS (
  SELECT doc_id,
         (len(w) >= 50
          AND CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
              / len(w) >= 3.0
          AND CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
              / len(w) <= 10.0
          AND CAST(len(list_filter(w, t -> list_contains([{{stop}}],
                                                         lower(t))))
              AS DOUBLE) / len(w) >= 0.05) AS quality_pass,
         CAST(len(w) AS BIGINT) AS n_tokens
  FROM (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
    FROM documents
  )
)
SELECT quality_pass,
       (CAST(sum_nll_e6 AS HUGEINT) * tot_bg
        < tot_nll * CAST(n_bigrams AS HUGEINT)) AS ppl_head,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM scored JOIN flags USING (doc_id) CROSS JOIN tot
GROUP BY 1, 2
""".replace("{stop}", _STOP_SQL)


# ---------------------------------------------------------------------------
# Collocation mining: top bigrams by lift
# ---------------------------------------------------------------------------

# Bigrams below this corpus count are noise for association ranking.
LIFT_MIN_COUNT = 5
LIFT_TOP_K = 30


def bigram_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the top-``LIFT_TOP_K`` bigrams by lift
    P(w1 w2) / (P(w1) P(w2)) among bigrams seen at least
    ``LIFT_MIN_COUNT`` times — the classic multi-word-expression /
    tokenizer-merge-candidate signal (PMI without the ln, so the
    score itself stays integer-exact).

    Cross-engine determinism: lift is computed as the exact-integer
    ratio (n_xy * N) / (n_x * n_y) — at oracle scale both products are
    exact BIGINTs < 2^53, so their double quotient is identical IEEE
    rounding in both engines — then floored to micro-units. Ties
    broken on (w1, w2), so the top-k SET is total-order deterministic.
    (Beyond ~2^53 total tokens the quotient is merely deterministic
    per engine, which is all the ranking itself needs.)

    Scale shape: unigram and bigram counts are hash aggregates with
    map-side combine; the min-count filter shrinks the candidate set
    by orders of magnitude BEFORE any join, and the survivors (not
    the vocabulary-sized unigram table) are the broadcast side of the
    two count lookups. The final top-k is an order-limit (TakeOrdered),
    never a full sort."""
    bg = _corpus_bigrams(spark, sf_dir)
    uni = (
        _docs_par(spark, sf_dir)
        .select(F.explode(tokens_col("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = uni.agg(F.sum("c").cast("bigint").alias("n"))
    surv = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= LIFT_MIN_COUNT)
    )
    c1 = uni.join(
        F.broadcast(surv.select("w1").distinct()),
        uni.w == F.col("w1"),
    ).select("w1", F.col("c").alias("n_x"))
    c2 = uni.join(
        F.broadcast(surv.select("w2").distinct()),
        uni.w == F.col("w2"),
    ).select("w2", F.col("c").alias("n_y"))
    lift_e6 = F.floor(
        F.lit(1e6)
        * (F.col("n_xy") * F.col("n")).cast("double")
        / (F.col("n_x") * F.col("n_y")).cast("double")
    ).cast("bigint")
    return (
        surv.join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n_total))
        .select("w1", "w2", "n_xy", "n_x", "n_y", lift_e6.alias("lift_e6"))
        .orderBy(F.desc("lift_e6"), "w1", "w2")
        .limit(LIFT_TOP_K)
    )


_LIFT_SQL = f"""
WITH {_BIGRAM_CTE},
uni AS (
  SELECT w1 AS w, COUNT(*) AS c FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w1
    FROM documents
  ) GROUP BY 1
),
total AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
surv AS (
  SELECT w1, w2, COUNT(*) AS n_xy FROM bgf GROUP BY 1, 2
  HAVING COUNT(*) >= {LIFT_MIN_COUNT}
)
SELECT s.w1, s.w2, CAST(s.n_xy AS BIGINT) AS n_xy,
       CAST(u1.c AS BIGINT) AS n_x, CAST(u2.c AS BIGINT) AS n_y,
       CAST(FLOOR(1e6 * CAST(s.n_xy * t.n AS DOUBLE)
                  / CAST(u1.c * u2.c AS DOUBLE)) AS BIGINT) AS lift_e6
FROM surv s
JOIN uni u1 ON u1.w = s.w1
JOIN uni u2 ON u2.w = s.w2
CROSS JOIN total t
ORDER BY lift_e6 DESC, s.w1, s.w2
LIMIT {LIFT_TOP_K}
"""


# Retrieval-passage chunking: fixed-size overlapping token windows —
# the RAG-ingest sibling of sequence_packing's training-side chunking.
# Stride < window, so consecutive chunks overlap by WINDOW - STRIDE
# tokens (context preserved across chunk boundaries).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def passage_chunk_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-chunking census for retrieval ingest: each document is
    split into CHUNK_TOKENS-token windows starting every CHUNK_STRIDE
    tokens (final short tail kept); reports per language the document/
    chunk counts, total chunk tokens vs source tokens, and the storage
    expansion the overlap costs — the index-sizing table for a RAG
    corpus build.

    Scale shape: chunk starts and per-chunk lengths are pure array
    math on the token count (sequence + transform + aggregate) — NO
    explode, NO shuffle; the only exchange is the tiny per-language
    census aggregate. At 100 TB the actual chunk-text emission would
    explode the same starts array map-side; this census prices that
    job without running it.

    Cross-engine determinism: all counts are exact integers; the one
    double (expansion_ratio) is a single fixed division of two exact
    BIGINT sums, rounded for display."""
    docs = _docs_par(spark, sf_dir)
    tok = tokens_col("text")
    per_doc = docs.select(
        "lang",
        F.size(tok).alias("n_tokens"),
        F.sequence(
            F.lit(0),
            F.greatest(F.size(tok) - 1, F.lit(0)),
            F.lit(CHUNK_STRIDE),
        ).alias("starts"),
    ).select(
        "lang",
        "n_tokens",
        F.size("starts").alias("n_chunks"),
        F.aggregate(
            F.transform(
                "starts",
                lambda s: F.least(F.lit(CHUNK_TOKENS), F.col("n_tokens") - s),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("chunk_tokens"),
    )
    total_chunk = F.sum("chunk_tokens").cast("bigint")
    total_doc = F.sum("n_tokens").cast("bigint")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").cast("bigint").alias("n_chunks"),
        total_chunk.alias("sum_chunk_tokens"),
        total_doc.alias("sum_doc_tokens"),
        F.round(total_chunk.cast("double") / total_doc, 6).alias(
            "expansion_ratio"
        ),
    )


_CHUNK_SQL = f"""
WITH t AS (
  SELECT lang, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
), per_doc AS (
  SELECT lang, n_tokens,
         len(range(0, greatest(n_tokens, 1), {CHUNK_STRIDE})) AS n_chunks,
         list_sum(list_transform(
           range(0, greatest(n_tokens, 1), {CHUNK_STRIDE}),
           s -> least({CHUNK_TOKENS}, n_tokens - s)
         )) AS chunk_tokens
  FROM t
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
       CAST(SUM(chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_doc_tokens,
       ROUND(CAST(SUM(chunk_tokens) AS DOUBLE) / SUM(n_tokens), 6)
         AS expansion_ratio
FROM per_doc GROUP BY lang
"""


_REGISTRY = {
    "lm_perplexity_score": (lm_perplexity_score, _PPL_SQL),
    "passage_chunk_census": (passage_chunk_census, _CHUNK_SQL),
    "bigram_lift_topk": (bigram_lift_topk, _LIFT_SQL),
    "quality_ppl_contingency": (quality_ppl_contingency, _CONTINGENCY_SQL),
    "linear_probe_train": (linear_probe_train, _probe_sql()),
    "dsir_importance_weights": (dsir_importance_weights, _DSIR_SQL),
    "ppl_bucket_census": (ppl_bucket_census, _PPL_BUCKET_SQL),
    "quality_classifier_score": (quality_classifier_score, _QC_SQL),
    "sequence_packing": (sequence_packing, _PACK_SQL),
    "curation_funnel": (curation_funnel, _funnel_sql()),
}
