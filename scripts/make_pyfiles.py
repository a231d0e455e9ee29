"""Package the engine as dist/engine.zip for spark-submit --py-files
(BASELINE.json:6 'via spark-submit --py-files')."""

from __future__ import annotations

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
DIST = ROOT / "dist"


def build() -> pathlib.Path:
    DIST.mkdir(exist_ok=True)
    out = DIST / "engine.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((ROOT / "text_extraction_evaluation_spark").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    return out


if __name__ == "__main__":
    print(build())
