"""HTML -> ordered paragraph blocks (jusText preprocessing + segmentation).

Reimplements, from the published algorithm description (Pomikalek
2011, "Removing Boilerplate and Duplicate Content from Web Corpora")
and the public ``justext`` package semantics, the DOM preprocessing
and paragraph segmentation the reference harness relied on
(BASELINE.json:6 "DOM block segmentation"). lxml is not available in
this sandbox, so the segmenter is built on the stdlib
``html.parser.HTMLParser`` (tolerant of malformed markup). Pure
Python, zero Spark imports — shared by the Arrow kernel and the
parity oracle so segmentation is byte-identical by construction.

Semantics:

* comments, doctypes and the content of ``script/style/head/title/
  textarea/noscript/iframe/svg/math`` are dropped;
* a new paragraph starts at the open OR close of any block-level tag
  (``PARAGRAPH_TAGS``) and at the second of two consecutive ``<br>``;
* character data inside ``<a>`` accrues ``chars_count_in_links``;
* each paragraph records its dom path at creation time and whether
  any enclosing element is ``h1``-``h6`` (heading flag) or ``select``;
* paragraph text is whitespace-normalized: runs of whitespace collapse
  to a single space; leading/trailing stripped. Entity references are
  decoded by the parser (``convert_charrefs=True``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

PARAGRAPH_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "caption",
        "center", "col", "colgroup", "dd", "dir", "div", "dl", "dt",
        "fieldset", "figure", "footer", "form", "h1", "h2", "h3", "h4",
        "h5", "h6", "header", "hr", "legend", "li", "main", "menu",
        "nav", "ol", "option", "p", "pre", "section", "select", "table",
        "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
    }
)

_SKIP_CONTENT_TAGS = frozenset(
    {"script", "style", "head", "title", "textarea", "noscript",
     "iframe", "svg", "math"}
)

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Void elements never get a matching close tag; keep the tag stack sane.
_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

_WS_RE = re.compile(r"\s+")


def _normalize(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


@dataclass
class Paragraph:
    """One segmented block, before classification."""

    dom_path: str
    heading: bool
    chunks: list[str] = field(default_factory=list)
    chars_count_in_links: int = 0
    tags_count: int = 0  # non-empty inline markup boundaries seen

    _text: str | None = None

    @property
    def text(self) -> str:
        if self._text is None:
            self._text = _normalize("".join(self.chunks))
        return self._text

    @property
    def words(self) -> list[str]:
        return self.text.split()

    @property
    def link_density(self) -> float:
        length = len(self.text)
        if length == 0:
            return 0.0
        return min(1.0, self.chars_count_in_links / length)

    def is_empty(self) -> bool:
        return not self.text


class _Segmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.paragraphs: list[Paragraph] = []
        self._cur: Paragraph | None = None
        self._skip_depth = 0
        self._link_depth = 0
        self._br_pending = False

    # -- paragraph lifecycle -------------------------------------------------
    def _flush(self) -> None:
        p = self._cur
        if p is not None and not p.is_empty():
            self.paragraphs.append(p)
        self._cur = None
        self._br_pending = False

    def _ensure(self) -> Paragraph:
        if self._cur is None:
            path = ".".join(self.stack)
            heading = any(t in _HEADING_TAGS for t in self.stack)
            self._cur = Paragraph(dom_path=path, heading=heading)
        return self._cur

    # -- parser callbacks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        tag = tag.lower()
        if tag in _SKIP_CONTENT_TAGS:
            self._flush()
            self._skip_depth += 1
            self.stack.append(tag)
            return
        if tag == "br":
            if self._br_pending:
                self._flush()
            else:
                self._br_pending = True
                if self._cur is not None:
                    self._cur.chunks.append(" ")
            return
        if tag in _VOID_TAGS:
            return
        self.stack.append(tag)
        if tag in PARAGRAPH_TAGS:
            self._flush()
        else:
            self._br_pending = False
            if tag == "a":
                self._link_depth += 1
            if self._cur is not None:
                self._cur.tags_count += 1

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        tag = tag.lower()
        if tag == "br":
            self.handle_starttag(tag, attrs)
            return
        if tag in PARAGRAPH_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag == "br" or tag in _VOID_TAGS:
            return
        if tag in _SKIP_CONTENT_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            self._pop_until(tag)
            return
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1
        if tag in PARAGRAPH_TAGS:
            self._flush()
        self._pop_until(tag)

    def _pop_until(self, tag: str) -> None:
        # Tolerate malformed nesting: pop to the nearest matching open
        # tag if one exists, else ignore the stray close tag.
        if tag in self.stack:
            while self.stack:
                if self.stack.pop() == tag:
                    break

    def handle_data(self, data: str) -> None:
        if self._skip_depth > 0 or not data:
            return
        if not data.strip():
            # pure whitespace: acts as a separator, never starts a paragraph
            if self._cur is not None:
                self._cur.chunks.append(" ")
            return
        self._br_pending = False
        p = self._ensure()
        p.chunks.append(data)
        if self._link_depth > 0:
            p.chars_count_in_links += len(_WS_RE.sub(" ", data).strip())

    def handle_comment(self, data: str) -> None:  # dropped
        return

    def handle_decl(self, decl: str) -> None:  # dropped
        return

    def close(self) -> None:
        super().close()
        self._flush()


def segment(html_text: str) -> list[Paragraph]:
    """Parse ``html_text`` and return the ordered non-empty paragraphs."""
    seg = _Segmenter()
    try:
        seg.feed(html_text)
        seg.close()
    except Exception:
        # html.parser is robust, but never let a pathological page kill
        # a whole Arrow batch: return what was segmented so far.
        seg._flush()
    return seg.paragraphs
