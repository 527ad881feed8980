"""Package name_matcher_spark for spark-submit --py-files.

Usage:
    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files nms.zip \
        --jars name_matcher_spark/javaudf/nms-udfs.jar your_job.py
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: str = "nms.zip") -> Path:
    target = REPO / out
    pkg = REPO / "name_matcher_spark"
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(pkg.rglob("*")):
            if p.suffix in (".py", ".jar", ".java") and "__pycache__" not in p.parts:
                zf.write(p, p.relative_to(REPO))
    return target


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "nms.zip"))
