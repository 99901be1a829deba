"""Build the --py-files artifact for cluster submission.

    python tools/package.py [out.zip]

Produces a zip of the pure-Python package; submit with

    spark-submit --py-files dist/airbyte_destination_spark.zip your_job.py

(the engine has no JVM artifacts of its own — everything Spark-side is
stock Catalyst; the lake format is parquet + JSON manifests).
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

PKG = "airbyte_destination_spark"


def build(out: str | None = None) -> str:
    root = Path(__file__).resolve().parent.parent
    out_path = Path(out) if out else root / "dist" / f"{PKG}.zip"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((root / PKG).rglob("*.py")):
            z.write(py, py.relative_to(root))
    return str(out_path)


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
