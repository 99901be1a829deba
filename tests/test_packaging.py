"""The --py-files zip must be importable on its own (cluster submission
path: spark-submit --py-files dist/airbyte_destination_spark.zip)."""

import subprocess
import sys
from pathlib import Path


def test_pyfiles_zip_imports(tmp_path):
    root = Path(__file__).resolve().parent.parent
    out = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, str(root / "tools" / "package.py"), str(out)],
        check=True,
        capture_output=True,
    )
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import airbyte_destination_spark as a; "
        "from airbyte_destination_spark.lake import LakeTable; "
        "from airbyte_destination_spark.streaming import IngestConfig; "
        "print(a.__version__)"
    )
    r = subprocess.run(
        [sys.executable, "-c", probe, str(out)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo so the zip is the only source
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip()
