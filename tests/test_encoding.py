"""Deterministic charset sniff tests (SURVEY.md §2.1 S6)."""

from text_extraction_evaluation_spark.algo.encoding import sniff_decode


def test_plain_utf8():
    text, codec = sniff_decode("héllo".encode("utf-8"))
    assert text == "héllo" and codec == "utf-8"


def test_utf8_bom():
    text, codec = sniff_decode(b"\xef\xbb\xbfhi")
    assert text == "hi" and codec == "utf-8-sig"


def test_meta_charset_latin1():
    raw = '<meta charset="iso-8859-1"><p>café</p>'.encode("latin-1")
    text, codec = sniff_decode(raw)
    assert "café" in text and codec == "latin-1"


def test_meta_http_equiv_content_charset():
    raw = ('<meta http-equiv="Content-Type" content="text/html; '
           'charset=windows-1252"><p>d’accord</p>').encode("cp1252")
    text, codec = sniff_decode(raw)
    assert codec == "cp1252" and "’" in text


def test_invalid_utf8_falls_back_latin1():
    text, codec = sniff_decode(b"caf\xe9 plain")
    assert codec == "latin-1" and text == "café plain"


def test_declared_charset_that_fails_falls_through():
    # declares ascii but contains non-ascii -> ladder continues to utf-8
    raw = b'<meta charset="ascii">caf\xc3\xa9'
    text, codec = sniff_decode(raw)
    assert text.endswith("café") and codec == "utf-8"


def test_unknown_charset_ignored():
    raw = b'<meta charset="klingon-8">plain stuff'
    text, codec = sniff_decode(raw)
    assert codec == "utf-8"
