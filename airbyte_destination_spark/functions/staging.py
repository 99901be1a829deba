"""Materialized staging layer — operator outputs persisted as lake tables.

A production release pipeline does not recompute near-dup clusters or
retrain an ANN index per downstream query: it materializes them once per
corpus snapshot and every consumer joins the materialization (reference
frame: FAISS index-on-disk; a warehouse's staged intermediate tables).
This module provides that layer USING THE ENGINE'S OWN STORAGE — each
staged artifact is a `LakeTable` (bucketed, versioned, schema-tracked),
keyed by a fingerprint of the input corpus files + operator parameters.
A corpus or parameter change flips the fingerprint and the next access
rebuilds; an unchanged corpus reuses the persisted table with zero
recompute.

Scale shape: the fingerprint is driver-side metadata (file stats, no
data reads); staleness checks read one manifest JSON. The build path is
whatever the wrapped operator's plan is, plus one bucketed lake write —
at 100 TB the build runs once per corpus release, amortized over every
downstream consumer, exactly like production.

Concurrency: builds land in a pid-suffixed temp root and are renamed
into place atomically, so concurrent builders race benignly (last
rename wins, both contents identical since every staged operator is
deterministic). Readers mid-scan of a replaced root can see a
FileNotFound on a deleted snapshot — acceptable for a staging cache
(single-pipeline builds in practice); re-read recovers.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..lake import LakeTable

_FP_PROP = "staging_fingerprint"


def stage_root() -> str:
    """Staging warehouse root (env-overridable for tests/benches)."""
    return os.environ.get("SPARK_GRAFT_STAGE_DIR") or os.path.join(
        tempfile.gettempdir(), "adspark-stage"
    )


def corpus_fingerprint(*paths: str, params: dict | None = None) -> str:
    """Fingerprint of input files + operator params — the staged table's
    validity key. Uses (path, size, mtime_ns) of every data file, no
    data reads: O(file count) driver-side stat calls, nothing
    distributed. A rewritten/updated corpus changes mtime or size and
    invalidates; identical params + identical files reuse."""
    h = hashlib.md5()
    for p in sorted(os.path.abspath(x) for x in paths):
        h.update(p.encode())
        if os.path.isdir(p):
            for root, dirs, files in sorted(os.walk(p)):
                dirs.sort()
                for f in sorted(files):
                    st = os.stat(os.path.join(root, f))
                    h.update(f"{root}/{f}:{st.st_size}:{st.st_mtime_ns};".encode())
        elif os.path.exists(p):
            st = os.stat(p)
            h.update(f"{st.st_size}:{st.st_mtime_ns};".encode())
    h.update(json.dumps(params or {}, sort_keys=True, default=str).encode())
    return h.hexdigest()


def staged_table(
    spark: SparkSession,
    name: str,
    fingerprint: str,
    build: Callable[[], DataFrame],
    key_cols: list[str],
    n_buckets: int = 8,
) -> DataFrame:
    """Read the staged lake table `name` for `fingerprint`, building it
    first if missing or stale. `build` is only invoked on a miss.

    The table directory embeds the fingerprint prefix so different
    corpora (e.g. sf0.001 warmup vs sf0.1 bench) coexist instead of
    thrashing a single slot."""
    root = os.path.join(stage_root(), f"{name}-{fingerprint[:16]}")
    t = LakeTable(root)
    try:
        if t.exists() and t.properties().get(_FP_PROP) == fingerprint:
            return t.read(spark)
    except Exception:  # noqa: BLE001 — partial/corrupt cache entry: rebuild
        pass
    df = build()
    tmp = f"{root}.build-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    bt = LakeTable(tmp)
    bt.create(
        df.schema,
        key_cols=key_cols,
        version_col=None,
        n_buckets=n_buckets,
        properties={_FP_PROP: fingerprint, "staged_op": name},
    )
    bt.append(df)
    shutil.rmtree(root, ignore_errors=True)
    os.rename(tmp, root)
    return LakeTable(root).read(spark)


def drop_staged(name: str | None = None) -> None:
    """Remove staged tables (all, or every fingerprint of one op)."""
    base = stage_root()
    if not os.path.isdir(base):
        return
    for d in os.listdir(base):
        if name is None or d.startswith(f"{name}-"):
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
