"""Parity-pinned tokenization for evaluation (SURVEY.md Appendix B).

The reference's text-based evaluator tokenized extracted and gold text
by whitespace splitting of (unicode) strings. Pinned here so the Arrow
scoring kernel and the oracle agree token-for-token.
"""

from __future__ import annotations

import unicodedata


def tokens(text: str) -> list[str]:
    """NFC-normalized, whitespace-split tokens. No lowercasing — the
    reference compared raw tokens; case folding would inflate matches."""
    if not text:
        return []
    return unicodedata.normalize("NFC", text).split()
