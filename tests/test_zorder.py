"""Z-order clustering compaction (lake/zorder.py + compact(cluster=
"zorder")): Morton-key bit interleaving, multi-dimensional file
skipping, and state preservation."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.lake.zorder import zorder_key

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.LongType(), False),
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.LongType(), True),
    ]
)
S = "k long, v long, x long, y long, op string"


def test_morton_key_bit_interleaving(spark):
    """bit i of column j lands at position i*ncols + j — checked on a
    4x4 grid against hand-computed Morton codes."""
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    # ranges (0,3) with bits=2: rank == value
    z = zorder_key([("x", 0.0, 3.0), ("y", 0.0, 3.0)], bits=2)
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", z.alias("z")).collect()}

    def morton(x, y):
        out = 0
        for i in range(2):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    # note: floor((v - lo)/span * 2^bits) caps the max value into the
    # top rank; with lo=0, hi=3, values 0..3 rank as 0,1,2,3
    expect = {(x, y): morton(min(int(x / 3 * 4), 3), min(int(y / 3 * 4), 3))
              for x in range(4) for y in range(4)}
    assert got == expect


def test_zorder_rejects_bad_configs(spark):
    with pytest.raises(ValueError):
        zorder_key([], bits=8)
    with pytest.raises(ValueError):
        zorder_key([(f"c{i}", 0.0, 1.0) for i in range(9)], bits=8)
    # bits auto-shrink so bits*ncols fits a signed long: 8 columns at
    # the default 8 bits must build (at 7 bits each), not raise
    zorder_key([(f"c{i}", 0.0, 1.0) for i in range(8)], bits=8)
    zorder_key([("a", 0.0, 1.0), ("b", 0.0, 1.0)], bits=32)


def test_zorder_compact_without_columns_raises(spark, tmp_path):
    t, _ = _mk(spark, tmp_path / "zc", n=100)
    with pytest.raises(ValueError, match="cluster_by"):
        t.compact(spark, min_files=1, cluster="zorder")


def _mk(spark, path, n=8000):
    t = LakeTable(str(path))
    t.create(SCHEMA, ["k"], "v", n_buckets=2, stats_cols=["x", "y"])
    rnd = random.Random(11)
    rows = [(i, 1, rnd.randrange(1000), rnd.randrange(1000), "I") for i in range(n)]
    t.merge(spark.createDataFrame(rows, S), epoch_id="e0")
    return t, rows


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    t, rows = _mk(spark, tmp_path / "z")
    before = sorted(tuple(r) for r in t.read(spark).collect())
    t.compact(spark, min_files=1, cluster_by=["x", "y"], cluster="zorder",
              max_records_per_file=500)
    after = sorted(tuple(r) for r in t.read(spark).collect())
    assert before == after  # maintenance never changes visible state
    entries = [e for fs in t.manifest()["buckets"].values() for e in fs]
    fx = t.files_for_bounds({"x": (100, 150)})
    fy = t.files_for_bounds({"y": (100, 150)})
    # a ~5% slice on EITHER dimension skips a good share of files
    assert len(fx) < len(entries) * 0.7, (len(fx), len(entries))
    assert len(fy) < len(entries) * 0.7, (len(fy), len(entries))
    got = t.scan(spark, bounds={"x": (100, 150)}).count()
    assert got == sum(1 for r in rows if 100 <= r[2] <= 150)
    # the transient morton key must not leak into the table schema
    assert "_zorder" not in t.read(spark).columns


def test_linear_clustering_prunes_only_its_own_dimension(spark, tmp_path):
    """The contrast that motivates z-order: linear cluster_by=["x"]
    leaves y-bounds useless (every file spans ~the full y range)."""
    t, _ = _mk(spark, tmp_path / "lin")
    t.compact(spark, min_files=1, cluster_by=["x"], max_records_per_file=500)
    entries = [e for fs in t.manifest()["buckets"].values() for e in fs]
    fx = t.files_for_bounds({"x": (100, 150)})
    fy = t.files_for_bounds({"y": (100, 150)})
    assert len(fx) <= len(entries) * 0.5
    assert len(fy) == len(entries)  # no pruning at all on y
