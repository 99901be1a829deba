"""Multi-executor standalone-cluster submission: the north rule's
deployment shape (`spark-submit --py-files` against a cluster manager
with N separate executor JVMs) must produce the same final table state
as the in-process oracle. Complements test_spark_submit (which covers
the --py-files packaging on local[4]) by making the EXECUTORS real
processes: tasks serialize over RPC, shuffle crosses JVM boundaries,
and the engine's lake commits coordinate through the shared filesystem
exactly as they would on a real cluster with a shared object store.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.sources.changegen import write_change_log
from tests.oracle import assert_equal_state
from tests.test_spark_submit import JOB, _spark_submit

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

from cluster_scaling import Cluster  # noqa: E402


@pytest.mark.slow
def test_standalone_cluster_submit_replay(spark, tmp_path):
    zip_path = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "package.py"), str(zip_path)],
        check=True, capture_output=True,
    )
    log_dir = str(tmp_path / "log")
    write_change_log(spark, log_dir, 3000, 200, n_batches=3, seed=29)
    job = tmp_path / "job.py"
    job.write_text(JOB)
    table_dir = str(tmp_path / "t")

    ncpu = os.cpu_count() or 8
    cluster = Cluster("test", 2, 0, min(3, ncpu - 1), 0, min(3, ncpu - 1),
                      7501, str(tmp_path), worker_mem="1500m")
    try:
        assert cluster.wait_ready(), "standalone cluster failed to start"
        env = dict(
            os.environ,
            PYSPARK_PYTHON=sys.executable,
            PYSPARK_DRIVER_PYTHON=sys.executable,
        )
        env.pop("PYTHONPATH", None)  # the zip must be the only engine source
        r = subprocess.run(
            [
                _spark_submit(),
                "--master", cluster.url,
                "--py-files", str(zip_path),
                "--conf", "spark.executor.cores=1",
                "--conf", "spark.executor.memory=1g",
                "--conf", "spark.cores.max=2",
                "--conf", "spark.ui.enabled=false",
                str(job), log_dir, table_dir, "3",
            ],
            capture_output=True, text=True,
            cwd=str(tmp_path),  # away from the repo checkout
            env=env, timeout=420,
        )
    finally:
        cluster.stop()
    assert r.returncode == 0, r.stderr[-4000:]
    head = json.loads(r.stdout.strip().splitlines()[-1])
    assert head["epochs"] == 3 and head["skipped"] == 0

    # the cluster-applied table, read back in THIS session, must match
    # the single-threaded oracle reducer over the raw change log
    table = LakeTable(table_dir)
    n = assert_equal_state(table.read(spark), f"{log_dir}/batch-*/*.parquet")
    assert n == head["rows"] > 0
