"""Body Text Extraction (BTE) — the engine's third extractor.

Reimplements, from the published description, the BTE heuristic of
Finn, Kushmerick & Smyth (2001, "Fact or fiction: Content
classification for digital libraries"): view the page as one stream
of tag tokens and word tokens and select the single contiguous
window [i, j] maximizing

    T(i, j) = tags_before(i) + words_in(i, j) + tags_after(j).

Since tags_before + tags_after = total_tags - tags_in, T is
total_tags + sum over the window of (+1 per word, -1 per tag) — so
the optimum window is a maximum-subarray problem and Kadane's
algorithm finds it in O(tokens). No DOM, no thresholds, no language
dependence: BTE is the classic structure-free baseline the
CleanEval-era extractor comparisons (the reference harness's
published lineage) ran against DOM classifiers like jusText, which
is exactly the role it plays in this engine's extractor ranking.

Pure Python, zero Spark imports; shares the charset sniff
(algo/encoding.py) with the other extractors and is executed
identically by the Arrow kernel and the parity oracle, so extracted
bytes are identical by construction.

Determinism contract:

* one tag token per markup construct (open/close/void tag, comment,
  doctype/PI, CDATA);
* the content of ``script/style/textarea/title/noscript/iframe/svg/
  math`` is opaque — skipped up to the first matching close tag,
  contributing only the two enclosing tag tokens;
* text runs are entity-decoded then whitespace-split into word
  tokens;
* Kadane ties resolve to the EARLIEST window: the best window is
  replaced only by a strictly greater sum, and the running window
  restarts only when its sum drops below zero;
* a page with no positive-sum window (or no words at all) extracts
  empty; the regex scanner cannot fail on arbitrary bytes-decoded
  text, so status is only ever ok/empty.

``ExtractionResult`` field semantics for this extractor:
``n_paragraphs`` = total word tokens scanned, ``n_good`` = word
tokens inside the selected body window (BTE has no paragraph
notion).
"""

from __future__ import annotations

import re
from html import unescape

from .encoding import sniff_decode
from .justext import STATUS_EMPTY, STATUS_OK, STATUS_PARSE_ERROR, ExtractionResult

# Content of these elements never yields word tokens (mirrors the DOM
# segmenter's skip set, algo/htmlseg.py _SKIP_CONTENT_TAGS + rawtext).
_OPAQUE_TAGS = frozenset(
    {"script", "style", "textarea", "title", "noscript", "iframe",
     "svg", "math"}
)

# One markup construct = one tag token. Comments/CDATA first (they may
# contain '<'), then doctype/PI, then ordinary tags with the name
# captured for opaque-content skipping.
_MARKUP_RE = re.compile(
    r"<!--.*?(?:-->|\Z)"
    r"|<!\[CDATA\[.*?(?:\]\]>|\Z)"
    r"|<[!?][^>]*>"
    r"|</?([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*>",
    re.S,
)

# precompiled close-tag patterns (hot path: one search per opaque
# element; compiling inside the scan would cost a regex-cache lookup
# per occurrence)
_OPAQUE_CLOSE_RES = {
    t: re.compile(rf"</{re.escape(t)}\b[^>]*>", re.I) for t in _OPAQUE_TAGS
}


def tokenize(html_text: str) -> tuple[list[str], int]:
    """html -> (word tokens in document order, total tag-token count).
    Test/inspection helper over the same scan the extractor runs."""
    words, n_tags = [], 0
    for tok in _scan(html_text):
        if tok is None:
            n_tags += 1
        else:
            words.append(tok)
    return words, n_tags


def _scan(html_text: str):
    """Yield the BTE token stream in document order: ``None`` per tag
    token, a ``str`` per word token."""
    pos, n = 0, len(html_text)
    while pos < n:
        m = _MARKUP_RE.search(html_text, pos)
        end = m.start() if m else n
        if end > pos:
            text = unescape(html_text[pos:end])
            for w in text.split():
                yield w
        if m is None:
            return
        yield None  # the tag token itself
        pos = m.end()
        name = (m.group(1) or "").lower()
        if name and not m.group(0).startswith("</") and name in _OPAQUE_TAGS:
            # opaque content: skip to the first matching close tag
            c = _OPAQUE_CLOSE_RES[name].search(html_text, pos)
            if c is None:
                return  # unterminated opaque element swallows the tail
            yield None  # the close tag token
            pos = c.end()


def extract_text_bte(html_text: str) -> ExtractionResult:
    """html string -> body text (space-joined words of the best window)."""
    try:
        # Kadane over the interleaved stream: +1 word / -1 tag. Track
        # word-index bounds of both the running and the best window so
        # the winning words slice out without a second scan.
        words: list[str] = []
        best = 0  # empty window is the baseline: only positive sums win
        best_lo = best_hi = 0  # word-index window [lo, hi)
        cur = 0
        cur_lo = 0  # word index where the running window starts
        for tok in _scan(html_text):
            if tok is None:
                cur -= 1
                if cur < 0:
                    cur = 0
                    cur_lo = len(words)
            else:
                words.append(tok)
                cur += 1
                if cur > best:
                    best = cur
                    best_lo, best_hi = cur_lo, len(words)
    except Exception as exc:  # pragma: no cover - defensive
        return ExtractionResult("", [], 0, 0, STATUS_PARSE_ERROR, repr(exc))
    body = words[best_lo:best_hi]
    text = " ".join(body)
    return ExtractionResult(
        text=text,
        paragraphs=[],
        n_paragraphs=len(words),
        n_good=len(body),
        status=STATUS_OK if text else STATUS_EMPTY,
    )


def extract_bytes_bte(raw: bytes) -> ExtractionResult:
    """Raw page bytes -> ExtractionResult via the shared charset sniff."""
    try:
        html_text, _codec = sniff_decode(bytes(raw))
    except Exception as exc:  # pragma: no cover - defensive
        return ExtractionResult("", [], 0, 0, STATUS_PARSE_ERROR, repr(exc))
    return extract_text_bte(html_text)
