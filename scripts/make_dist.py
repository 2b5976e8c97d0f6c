#!/usr/bin/env python
"""Build dist/daft_minhash_dedupe_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = "daft_minhash_dedupe_spark"


def build_zip(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / f"{PKG}.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / PKG).rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build_zip())
