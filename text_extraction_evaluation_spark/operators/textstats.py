"""Text-analysis operators: language-ID, rolling-hash fingerprints,
token stats — the corpus-profiling layer of a training-data pipeline.

Language-ID is a character-n-gram profile scorer (the classic Cavnar &
Trenkle shape): per-language trigram profiles are frozen constants,
scoring runs in an Arrow-vectorized kernel. On the synthetic benchmark
corpus all `lang` labels share one vocabulary, so the detector's
*accuracy* is untestable there — the tests pin behavior on real
multilingual sample sentences instead, and the corpus query simply
profiles agreement between declared and detected lang.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny frozen trigram profiles built from common function words of each
# language (public knowledge). Deliberately compact: the operator shape
# (broadcast profiles + Arrow kernel) is the deliverable; swap in full
# profiles for production.
_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", " th", "he ", "and", " an", "nd ", "ing", "ng ", " of",
           "of ", " to", "to ", " in", "in ", "ion", "ed ", " is", "is "),
    "fr": ("le ", " le", "es ", " de", "de ", "ent", "nt ", " la", "la ",
           "et ", " et", "que", " qu", "ue ", "ait", " un", "un ", "re "),
    "es": (" de", "de ", "la ", " la", "os ", "el ", " el", "que", " qu",
           "ue ", " en", "en ", "ar ", " es", "es ", "ión", "ado", " co"),
    "de": ("en ", "er ", " de", "der", "ie ", "die", " di", "und", " un",
           "nd ", "ein", " ei", "ich", "ch ", "sch", " ge", "ung", "ng "),
    "zh": ("的", "是", "了", "在", "我", "有", "他", "这", "中", "大",
           "来", "上", "国", "个", "到", "说", "们", "为"),
}


def detect_lang(text: str) -> tuple[str, float]:
    """(best_lang, score) — fraction of profile n-grams present,
    length-damped. Deterministic; ties broken by language code order."""
    if not text:
        return "und", 0.0
    sample = text[:2000].lower()
    best_lang, best_score = "und", 0.0
    for lang in sorted(_PROFILES):
        grams = _PROFILES[lang]
        hits = sum(1 for g in grams if g in sample)
        score = hits / len(grams)
        if score > best_score:
            best_lang, best_score = lang, score
    if best_score == 0.0:
        return "und", 0.0
    return best_lang, best_score


LANG_ID_SCHEMA = "doc_id long, lang string, detected_lang string, lang_score double"


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Arrow kernel: language detection per document."""
    pruned = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("lang") if "lang" in docs.columns else F.lit(None).cast("string").alias("lang"),
        F.col(text_col).alias("text"),
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            det, score = [], []
            for t in batch.column(names.index("text")).to_pylist():
                d, s = detect_lang(t or "")
                det.append(d)
                score.append(s)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(names.index("doc_id")).cast(pa.int64()),
                    batch.column(names.index("lang")),
                    pa.array(det, pa.string()),
                    pa.array(score, pa.float64()),
                ],
                names=["doc_id", "lang", "detected_lang", "lang_score"],
            )

    return pruned.mapInArrow(kernel, LANG_ID_SCHEMA)


NFC_STATS_SCHEMA = "bucket int, changed long, delta long"


def nfc_normalize_stats(docs: DataFrame, text_col: str = "t") -> DataFrame:
    """Arrow kernel: per-document Unicode NFC normalization effect —
    did canonical composition change the string, and by how many code
    points. Spark has no built-in Unicode normalizer, so this is the
    canonical "text normalization pass" shape: a pruned mapInArrow
    batch over (bucket, text) that emits fixed-width stats, never
    re-emitting the text itself (the normalized bytes stay inside the
    Arrow batch; a production scrub would write them to the sink
    column instead). Python's ``unicodedata.normalize`` and DuckDB's
    ``nfc_normalize`` both implement Unicode canonical composition,
    which is what makes the census oracle-checkable."""
    pruned = docs.select("bucket", F.col(text_col).alias("t"))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import unicodedata

        for batch in batches:
            names = batch.schema.names
            changed, delta = [], []
            for s in batch.column(names.index("t")).to_pylist():
                src = s or ""
                norm = unicodedata.normalize("NFC", src)
                changed.append(int(norm != src))
                delta.append(len(norm) - len(src))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(names.index("bucket")).cast(pa.int32()),
                    pa.array(changed, pa.int64()),
                    pa.array(delta, pa.int64()),
                ],
                names=["bucket", "changed", "delta"],
            )

    return pruned.mapInArrow(kernel, NFC_STATS_SCHEMA)


SNIFF_SCHEMA = "url string, warc_ts timestamp, codec string, n_bytes long"


def sniff_codec_stats(pages: DataFrame) -> DataFrame:
    """Arrow kernel: charset sniff per raw page (algo.encoding
    sniff_decode — BOM, meta charset, utf-8 attempt, latin-1
    fallback), emitting the page identity + codec used + byte size,
    never the decoded text. This is the standalone census shape of the
    sniff that extract_pages runs inline; a pruned mapInArrow over
    (url, warc_ts, html) so the html bytes cross Arrow once and are
    dropped inside the kernel."""
    from ..algo.encoding import sniff_decode

    pruned = pages.select("url", "warc_ts", "html")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            codecs_, sizes = [], []
            for raw in batch.column(names.index("html")).to_pylist():
                b = raw if raw is not None else b""
                _, codec = sniff_decode(b)
                codecs_.append(codec)
                sizes.append(len(b))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(names.index("url")),
                    batch.column(names.index("warc_ts")),
                    pa.array(codecs_, pa.string()),
                    pa.array(sizes, pa.int64()),
                ],
                names=["url", "warc_ts", "codec", "n_bytes"],
            )

    return pruned.mapInArrow(kernel, SNIFF_SCHEMA)


def rolling_fingerprints(
    docs: DataFrame,
    window: int = 5,
    keep_mod: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing-style document fingerprints: polynomial rolling hash
    over token windows, keep hashes ≡ 0 (mod keep_mod) — a compact
    sketch for containment/overlap detection. JVM-side only: the
    rolling hash is an ``aggregate`` over the token array.

    Emits (doc_id, fingerprint) exploded — ready for a groupBy
    fingerprint -> candidate containment pairs at scale.
    """
    tok = F.split(F.trim(F.col(text_col)), r"\s+")
    docs = docs.select(F.col(id_col).alias("doc_id"), tok.alias("w"))
    # hash each window of `window` tokens via md5 of the joined window
    # (engine-portable, same family as dedup)
    length = F.greatest(F.size("w") - (window - 1), F.lit(0))
    win = F.slice(F.col("w"), 1, length)
    for k in range(1, window):
        win = F.zip_with(win, F.slice(F.col("w"), 1 + k, length),
                         lambda a, b: F.concat_ws(" ", a, b))
    hashes = F.transform(
        win, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    )
    kept = F.array_distinct(
        F.filter(hashes, lambda h: h % keep_mod == 0)
    )
    return docs.select("doc_id", F.explode(kept).alias("fingerprint"))
