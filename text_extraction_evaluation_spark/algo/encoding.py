"""Deterministic charset sniffing for raw page bytes.

The reference era used chardet (statistical, version-dependent).
chardet is not installed here and is non-deterministic across
versions, so parity (BASELINE.json:14 byte-identical text) demands a
pinned, rule-based sniff:

1. BOM (utf-8-sig / utf-16 le+be)
2. ``charset=`` declared in a meta tag within the first 2048 bytes
3. strict utf-8 decode attempt
4. latin-1 fallback (never fails)

Pure Python, zero Spark imports — shared by the Arrow kernel and the
oracle.
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""",
    re.IGNORECASE,
)

# Only a pinned whitelist of codecs is honored so a hostile/typo'd
# charset declaration cannot change behavior across Python builds.
_ALLOWED = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "ascii",
    "utf-16": "utf-16",
    "utf-16-le": "utf-16-le",
    "utf-16-be": "utf-16-be",
    "gbk": "gbk",
    "gb2312": "gbk",
    "big5": "big5",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "euc-jp": "euc-jp",
}


def sniff_decode(raw: bytes) -> tuple[str, str]:
    """Decode page bytes -> (text, codec_used). Deterministic."""
    if raw.startswith(codecs.BOM_UTF8):
        return raw[len(codecs.BOM_UTF8):].decode("utf-8", "replace"), "utf-8-sig"
    if raw.startswith(codecs.BOM_UTF16_LE):
        return raw.decode("utf-16-le", "replace"), "utf-16-le"
    if raw.startswith(codecs.BOM_UTF16_BE):
        return raw.decode("utf-16-be", "replace"), "utf-16-be"

    head = raw[:2048]
    m = _META_CHARSET_RE.search(head) if b"charset" in head else None
    if m:
        declared = m.group(1).decode("ascii", "ignore").lower()
        codec = _ALLOWED.get(declared)
        if codec:
            try:
                return raw.decode(codec), codec
            except (UnicodeDecodeError, LookupError):
                pass  # fall through to utf-8/latin-1 ladder

    try:
        return raw.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return raw.decode("latin-1"), "latin-1"
