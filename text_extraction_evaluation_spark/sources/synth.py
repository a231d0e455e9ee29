"""Deterministic synthesis of Common-Crawl-style pages from the driver
seed corpus ``documents.parquet`` (FIXTURES.md §1).

Each document's ``text`` becomes the known-gold main content, wrapped
in boilerplate HTML chosen by ``doc_id % 16`` from 16 adversarial
template variants (empty body, all-links, short-paragraphs, heading
rescue / no-rescue, copyright-in-content, select blocks, neargood
smoothing, ``<br><br>`` splits, nested divs, malformed markup, latin-1
bytes, table markup, forms, hot-host). Generation is pure-integer
deterministic (splitmix64 on doc_id) — NO ``random`` module, NO wall
clock — so the Spark path (mapInArrow over documents) and the oracle
path (plain pandas loop) produce bit-identical pages.

Output schema matches BASELINE.json:15 input_hint:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.
"""

from __future__ import annotations

import pandas as pd

BASE_TS = pd.Timestamp("2024-01-01 00:00:00")
SECOND_CRAWL_MOD = 20
SECOND_CRAWL_REM = 7
HOT_HOST_SOURCE = "src0"
N_HOSTS = 37

# Boilerplate vocabulary is disjoint from the gold corpus vocabulary so
# any leakage of boilerplate into extracted text is a measurable
# precision hit.
_NAV = (
    '<div class="nav"><a href="/">portal</a> <a href="/news">newsfeed</a> '
    '<a href="/contact">contact</a> <a href="/login">login</a> '
    '<a href="/subscribe">subscribe</a></div>'
)
_SIDEBAR = (
    '<div class="sidebar"><p><a href="/promo">promo banner</a></p>'
    "<p><a href=\"/trending\">trending widget</a></p>"
    "<p><a href=\"/cookie\">cookie notice</a></p></div>"
)
_FOOTER = (
    '<div class="footer">© 2024 Synth Portal. All rights reserved. '
    '<a href="/terms">terms</a> <a href="/privacy">privacy</a></div>'
)
# ~150 chars, 8/26 stopwords => density 0.3077 in [0.30, 0.32): the
# engineered NEARGOOD boilerplate paragraph (variant 8).
_NEARGOOD_BP = (
    "<p>the promo banner a widget join sitemap hash cookie row privacy "
    "batch terms scan advert column tracker the newsletter a popup "
    "small overlay slow ticker merge footnote</p>"
)
_HEAD = '<head><meta charset="utf-8"><title>synth page</title>' \
        "<script>var x = 1;</script><style>.nav{}</style></head>"
_HEAD_L1 = '<head><meta charset="iso-8859-1"><title>caf\xe9 r\xe9sum\xe9</title></head>'


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _chunk_words(words: list[str], doc_id: int, lo: int = 40, hi: int = 56) -> list[str]:
    """Deterministically chunk gold words into paragraph strings.

    Sizes land in [lo, hi) words (~220-300 chars) so the bulk of gold
    paragraphs exceed length_high=200 and classify GOOD; a short tail
    exercises the short->good smoothing path.
    """
    out: list[str] = []
    i = 0
    k = 0
    while i < len(words):
        size = lo + (_splitmix64(doc_id * 1000 + k) % (hi - lo))
        out.append(" ".join(words[i : i + size]))
        i += size
        k += 1
    return out


def _p(blocks: list[str]) -> str:
    return "".join(f"<p>{b}</p>" for b in blocks)


def _html_for(doc_id: int, text: str, variant: int) -> bytes:
    words = text.split()
    paras = _chunk_words(words, doc_id)
    body_mid: str
    head = _HEAD
    encoding = "utf-8"

    if variant == 0:  # empty body
        body_mid = ""
    elif variant == 1:  # all-links page -> extraction empty
        body_mid = '<div><a href="/a">archive index</a></div>' * 4
    elif variant == 2:  # one giant paragraph
        body_mid = f"<p>{' '.join(words)}</p>"
    elif variant == 3:  # only short paragraphs (< length_low)
        tiny = [" ".join(words[i : i + 3]) for i in range(0, len(words), 3)]
        body_mid = _p(tiny)
    elif variant == 4:  # heading immediately before good text -> rescue
        body_mid = "<h2>section intro</h2>" + _p(paras)
    elif variant == 5:  # heading too far from good text -> no rescue
        far = '<div><a href="/x">gallery teaser snippet</a></div>' * 12
        body_mid = "<h2>orphan heading</h2>" + far + _p(paras)
    elif variant == 6:  # copyright inside a content-like paragraph
        poisoned = paras[0] + " © synth portal"
        body_mid = _p([poisoned] + paras[1:])
    elif variant == 7:  # select/option block
        sel = "<select><option>alpha pick</option><option>beta pick</option></select>"
        body_mid = sel + _p(paras)
    elif variant == 8:  # neargood boilerplate adjacent to good AND isolated
        body_mid = _NEARGOOD_BP + _p(paras) + _SIDEBAR + _NEARGOOD_BP + _SIDEBAR
    elif variant == 9:  # <br><br> segmentation inside one div
        body_mid = "<div>" + "<br><br>".join(paras) + "</div>"
    elif variant == 10:  # deeply nested divs
        open_divs = "<div>" * 8
        close_divs = "</div>" * 8
        body_mid = open_divs + _p(paras) + close_divs
    elif variant == 11:  # malformed: unclosed tags
        body_mid = "<div><p>" + "</p><p>".join(paras) + "<div><span>"
    elif variant == 12:  # latin-1 bytes with meta charset
        head = _HEAD_L1
        encoding = "latin-1"
        body_mid = "<p>caf\xe9 men\xfc promo</p>" + _p(paras)
    elif variant == 13:  # table markup
        rows = "".join(f"<tr><td>{p}</td></tr>" for p in paras)
        body_mid = f"<table>{rows}</table>"
    elif variant == 14:  # form/fieldset boilerplate around content
        form = ("<form><fieldset><legend>signup widget</legend>"
                '<p><a href="/go">submit entry</a></p></fieldset></form>')
        body_mid = form + _p(paras)
    else:  # 15: heavy boilerplate sandwich (hot-host docs land here too)
        body_mid = _SIDEBAR + _p(paras) + _SIDEBAR

    html = (
        "<!DOCTYPE html><html>" + head + "<body>"
        + _NAV + body_mid + _FOOTER + "</body></html>"
    )
    return html.encode(encoding)


def url_for(doc_id: int, source: str) -> str:
    host = "skew.example" if source == HOT_HOST_SOURCE else f"host{doc_id % N_HOSTS}.example"
    return f"http://{host}/{doc_id}"


def dataset_for(source: str) -> str:
    """src0-src9 -> 'cleaneval', src10-src19 -> 'googlenews' (mirrors
    the reference's two gold corpora)."""
    n = int(source.removeprefix("src"))
    return "cleaneval" if n < 10 else "googlenews"


_BASE_TS_US = BASE_TS.value // 1_000  # epoch microseconds


def _synth_pages_lists(doc_ids, texts_in, langs_in, sources):
    """Shared synthesis core: plain Python lists out (``warc_ts`` as
    epoch microseconds). Both the pandas wrapper (oracle path) and the
    Arrow wrapper (Spark path) call this, so the two are bit-identical
    by construction.

    A deterministic 5% of doc_ids (doc_id % 20 == 7) emit a second,
    later crawl of the same url with a different template variant —
    exercises latest-crawl dedup and resume idempotency.
    """
    urls: list[str] = []
    ts_us: list[int] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    for doc_id, text, lang, source in zip(
        doc_ids, texts_in, langs_in, sources, strict=True
    ):
        doc_id = int(doc_id)
        url = url_for(doc_id, source)
        variant = doc_id % 16
        urls.append(url)
        ts_us.append(_BASE_TS_US + doc_id * 1_000_000)
        htmls.append(_html_for(doc_id, text, variant))
        texts.append(text)
        langs.append(lang)
        if doc_id % SECOND_CRAWL_MOD == SECOND_CRAWL_REM:
            urls.append(url)
            ts_us.append(_BASE_TS_US + (doc_id + 86400) * 1_000_000)
            htmls.append(_html_for(doc_id, text, (variant + 2) % 16))
            texts.append(text)
            langs.append(lang)
    return urls, ts_us, htmls, texts, langs


def synth_pages_pdf(docs: pd.DataFrame) -> pd.DataFrame:
    """documents (doc_id, text, lang, source) -> pages rows (pandas —
    the oracle/ballast path; see ``_synth_pages_lists``)."""
    urls, ts_us, htmls, texts, langs = _synth_pages_lists(
        docs["doc_id"], docs["text"], docs["lang"], docs["source"]
    )
    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="string[python]").astype(object),
            "warc_ts": pd.Series(
                pd.to_datetime(ts_us, unit="us"), dtype="datetime64[us]"
            ),
            "html": pd.Series(htmls, dtype=object),
            "text": pd.Series(texts, dtype=object),
            "lang": pd.Series(langs, dtype=object),
        }
    )


def synth_pages_batch(batch):
    """documents Arrow batch -> pages Arrow batch (the Spark kernel
    path): same core loop as ``synth_pages_pdf`` but the output is
    built as Arrow arrays directly — no pandas DataFrame construction
    or block consolidation per batch (the channel-cost rationale in
    operators/extract.py)."""
    import pyarrow as pa

    names = batch.schema.names
    urls, ts_us, htmls, texts, langs = _synth_pages_lists(
        batch.column(names.index("doc_id")).to_pylist(),
        batch.column(names.index("text")).to_pylist(),
        batch.column(names.index("lang")).to_pylist(),
        batch.column(names.index("source")).to_pylist(),
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(urls, pa.string()),
            # tz-aware to match Spark's Arrow field for TimestampType
            # exactly; a naive array only coincidentally matches when
            # spark.sql.session.timeZone is UTC (every session here pins
            # it, but the kernel must not depend on that).
            pa.array(ts_us, pa.timestamp("us", tz="UTC")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def synth_gold_pdf(docs: pd.DataFrame) -> pd.DataFrame:
    """documents -> gold(url, gold_text, dataset) (FIXTURES.md §2)."""
    return pd.DataFrame(
        {
            "url": [url_for(int(d), s) for d, s in zip(docs["doc_id"], docs["source"], strict=True)],
            "gold_text": list(docs["text"]),
            "dataset": [dataset_for(s) for s in docs["source"]],
        }
    )


def synth_gold_batch(batch):
    """documents Arrow batch -> gold Arrow batch (Spark kernel path;
    same column rules as ``synth_gold_pdf``)."""
    import pyarrow as pa

    names = batch.schema.names
    doc_ids = batch.column(names.index("doc_id")).to_pylist()
    sources = batch.column(names.index("source")).to_pylist()
    return pa.RecordBatch.from_arrays(
        [
            pa.array(
                [url_for(int(d), s) for d, s in zip(doc_ids, sources, strict=True)],
                pa.string(),
            ),
            batch.column(names.index("text")),
            pa.array([dataset_for(s) for s in sources], pa.string()),
        ],
        names=["url", "gold_text", "dataset"],
    )
