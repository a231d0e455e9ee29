"""Golden-file freeze: sha256 of oracle-extracted text per url at
sf0.001, frozen at algorithm-pinning time. Catches silent drift in the
shared algorithm module — if this fails, either revert the algorithm
change or consciously re-freeze (tests/golden/ regeneration script in
the file header of extracted_sha256.json's generator, see git log).
"""

import hashlib
import json
import pathlib

from oracle.run_oracle import oracle_extract, oracle_latest_crawl, oracle_pages

GOLDEN = pathlib.Path(__file__).parent / "golden" / "extracted_sha256.json"


def test_oracle_matches_frozen_golden(docs_pdf):
    with open(GOLDEN) as f:
        golden = json.load(f)
    ex = oracle_extract(oracle_latest_crawl(oracle_pages(docs_pdf)))
    got = {
        u: hashlib.sha256(t.encode("utf-8")).hexdigest()
        for u, t in zip(ex["url"], ex["text"], strict=True)
    }
    assert got == golden
