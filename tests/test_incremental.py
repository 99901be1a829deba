"""Pre-image CDF + incremental rollup maintenance: the maintained
aggregate must equal a full recompute, for inserts, deletes,
measure-changing updates, dimension-moving updates, and groups dying to
zero."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.operators.incremental import (
    maintain_rollup,
    rollup_snapshot,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ver", T.LongType(), False),
        T.StructField("dim", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, ver long, dim string, v double, op string")


@pytest.fixture()
def table(spark, tmp_table_root):
    t = LakeTable(tmp_table_root)
    t.create(SCHEMA, ["doc_id"], "ver", n_buckets=2)
    return t


def test_pre_image_cdf_emits_pairs(spark, table):
    v0 = table.merge(
        _batch(spark, [(1, 1, "a", 1.0, "U"), (2, 1, "b", 2.0, "U")]), epoch_id="e0"
    ).version
    table.merge(
        _batch(spark, [(1, 2, "a", 5.0, "U"), (2, 2, "b", 2.0, "D"), (3, 2, "c", 7.0, "U")]),
        epoch_id="e1",
    )
    rows = sorted(
        (r.doc_id, r.change_type, r.v)
        for r in table.table_changes(spark, v_from=v0, pre_images=True).collect()
    )
    assert rows == [
        (1, "update_postimage", 5.0),
        (1, "update_preimage", 1.0),
        (2, "delete", 2.0),
        (3, "insert", 7.0),
    ]


def test_maintained_equals_recompute(spark, table):
    v0 = table.merge(
        _batch(
            spark,
            [
                (1, 1, "a", 1.0, "U"),
                (2, 1, "a", 2.0, "U"),
                (3, 1, "b", 3.0, "U"),
                (4, 1, "b", 4.0, "U"),
            ],
        ),
        epoch_id="e0",
    ).version
    # update measure, move dimension, delete b entirely, insert new dim
    table.merge(
        _batch(
            spark,
            [
                (1, 2, "a", 10.0, "U"),   # measure change
                (2, 2, "c", 2.0, "U"),    # dim move a -> c
                (3, 2, "b", 3.0, "D"),
                (4, 2, "b", 4.0, "D"),    # group b dies
                (5, 2, "d", 9.0, "U"),    # new dim
            ],
        ),
        epoch_id="e1",
    )
    dims, meas = ["dim"], {"sv": "v"}
    base = rollup_snapshot(table.read(spark, version=v0), dims, meas)
    cdf = table.table_changes(spark, v_from=v0, pre_images=True)
    maintained = {
        r.dim: (r.n_rows, r.sv)
        for r in maintain_rollup(base, cdf, dims, meas).collect()
    }
    direct = {
        r.dim: (r.n_rows, r.sv)
        for r in rollup_snapshot(table.read(spark), dims, meas).collect()
    }
    assert maintained == direct
    assert "b" not in maintained  # zero-count group dropped


def test_plain_cdf_rejected(spark, table):
    v0 = table.merge(_batch(spark, [(1, 1, "a", 1.0, "U")]), epoch_id="e0").version
    table.merge(_batch(spark, [(1, 2, "a", 2.0, "U")]), epoch_id="e1")
    base = rollup_snapshot(table.read(spark, version=v0), ["dim"], {"sv": "v"})
    cdf = table.table_changes(spark, v_from=v0)  # no pre-images
    with pytest.raises(Exception, match="pre-image"):
        maintain_rollup(base, cdf, ["dim"], {"sv": "v"}).collect()


def test_default_cdf_shape_unchanged(spark, table):
    v0 = table.merge(_batch(spark, [(1, 1, "a", 1.0, "U")]), epoch_id="e0").version
    table.merge(_batch(spark, [(1, 2, "a", 2.0, "U")]), epoch_id="e1")
    out = table.table_changes(spark, v_from=v0)
    assert out.columns == ["doc_id", "change_type", "ver", "dim", "v"]
    rows = out.collect()
    assert len(rows) == 1 and rows[0].change_type == "update" and rows[0].v == 2.0


def test_cdf_across_schema_evolution(spark, table):
    v0 = table.merge(
        _batch(spark, [(1, 1, "a", 1.0, "U"), (2, 1, "b", 2.0, "U")]), epoch_id="e0"
    ).version
    evolved = spark.createDataFrame(
        [(1, 2, "a", 5.0, "x", "U"), (3, 2, "c", 7.0, "y", "U")],
        "doc_id long, ver long, dim string, v double, extra string, op string",
    )
    table.merge(evolved, epoch_id="e1")
    got = {
        (r.doc_id, r.change_type): r
        for r in table.table_changes(spark, v_from=v0, pre_images=True).collect()
    }
    # pre-images of rows written before the evolution carry null extra
    assert got[(1, "update_preimage")].extra is None
    assert got[(1, "update_postimage")].extra == "x"
    assert got[(3, "insert")].extra == "y"
    assert (2, "delete") not in got and len(got) == 3
    # maintained rollup still matches a recompute across the evolution
    base = rollup_snapshot(table.read(spark, version=v0), ["dim"], {"sv": "v"})
    cdf = table.table_changes(spark, v_from=v0, pre_images=True)
    maintained = {
        r.dim: (r.n_rows, r.sv)
        for r in maintain_rollup(base, cdf, ["dim"], {"sv": "v"}).collect()
    }
    direct = {
        r.dim: (r.n_rows, r.sv)
        for r in rollup_snapshot(table.read(spark), ["dim"], {"sv": "v"}).collect()
    }
    assert maintained == direct


def _ing_batch(spark, rows):
    # apply_change_batch shape: payload + op + emitted_at (epoch ms)
    return spark.createDataFrame(
        [(d, ver, dim, v, op, 1_700_000_000_000 + ver) for d, ver, dim, v, op in rows],
        "doc_id long, ver long, dim string, v double, op string, emitted_at long",
    )


def _cfg():
    from airbyte_destination_spark.streaming.pipeline import IngestConfig

    return IngestConfig(key_cols=["doc_id"], version_col="ver", n_buckets=2)


def test_apply_with_rollup_tracks_recompute(spark, tmp_path):
    from airbyte_destination_spark.operators.incremental import (
        RollupSpec,
        apply_with_rollup,
    )

    main = LakeTable(str(tmp_path / "main"))
    roll = LakeTable(str(tmp_path / "roll"))
    spec = RollupSpec(["dim"], {"sv": "v"})
    cfg = _cfg()
    apply_with_rollup(
        main, roll,
        _ing_batch(spark, [(1, 1, "a", 1.0, "U"), (2, 1, "b", 2.0, "U")]),
        "job-0", cfg, spec,
    )
    apply_with_rollup(
        main, roll,
        _ing_batch(
            spark,
            [(1, 2, "c", 5.0, "U"), (2, 2, "b", 2.0, "D"), (3, 2, "a", 4.0, "U")],
        ),
        "job-1", cfg, spec,
    )
    maintained = {
        r.dim: (r.n_rows, r.sv) for r in roll.read(spark).select("dim", "n_rows", "sv").collect()
    }
    direct = {
        r.dim: (r.n_rows, r.sv)
        for r in rollup_snapshot(main.read(spark), ["dim"], {"sv": "v"}).collect()
    }
    assert maintained == direct == {"a": (1, 4.0), "c": (1, 5.0)}  # b deleted


def test_apply_with_rollup_recovers_after_partial_crash(spark, tmp_path):
    from airbyte_destination_spark.operators.incremental import (
        RollupSpec,
        apply_with_rollup,
    )
    from airbyte_destination_spark.streaming.pipeline import apply_change_batch

    main = LakeTable(str(tmp_path / "main"))
    roll = LakeTable(str(tmp_path / "roll"))
    spec = RollupSpec(["dim"], {"sv": "v"})
    cfg = _cfg()
    b0 = _ing_batch(spark, [(1, 1, "a", 1.0, "U"), (2, 1, "b", 2.0, "U")])
    apply_with_rollup(main, roll, b0, "job-0", cfg, spec)
    # crash window: epoch job-1 lands on MAIN only (rollup merge died)
    b1 = _ing_batch(spark, [(1, 2, "b", 9.0, "U"), (3, 2, "a", 4.0, "U")])
    apply_change_batch(main, b1, "job-1", cfg)
    v_roll = roll.current_version()
    # replay of the epoch: main skips, rollup recovers (v-1, v) and lands
    stats = apply_with_rollup(main, roll, b1, "job-1", cfg, spec)
    assert stats.skipped
    maintained = {
        r.dim: (r.n_rows, r.sv) for r in roll.read(spark).select("dim", "n_rows", "sv").collect()
    }
    direct = {
        r.dim: (r.n_rows, r.sv)
        for r in rollup_snapshot(main.read(spark), ["dim"], {"sv": "v"}).collect()
    }
    assert maintained == direct
    assert roll.current_version() > v_roll
    # full replay: both markers exist -> both no-ops
    v_main, v_roll = main.current_version(), roll.current_version()
    apply_with_rollup(main, roll, b1, "job-1", cfg, spec)
    assert (main.current_version(), roll.current_version()) == (v_main, v_roll)


def test_rollup_recovery_skips_interleaved_metadata_commits(spark, tmp_path):
    """Crash recovery x metadata-only commits: checkpoint()/rename_column()
    land BETWEEN the main merge and the rollup replay. Those commits must
    record epoch_id=None — if they carried the data commit's epoch_id
    forward (the copied-manifest hazard), epoch_commit_version would
    resolve the epoch to the METADATA commit and the recovery CDF would
    diff a no-change window, silently losing the epoch from the rollup."""
    from airbyte_destination_spark.operators.incremental import (
        RollupSpec,
        apply_with_rollup,
    )
    from airbyte_destination_spark.streaming.pipeline import apply_change_batch

    main = LakeTable(str(tmp_path / "main"))
    roll = LakeTable(str(tmp_path / "roll"))
    spec = RollupSpec(["dim"], {"sv": "v"})
    cfg = _cfg()
    apply_with_rollup(
        main, roll,
        _ing_batch(spark, [(1, 1, "a", 1.0, "U"), (2, 1, "b", 2.0, "U")]),
        "job-0", cfg, spec,
    )
    # crash window: epoch job-1 lands on MAIN only ...
    b1 = _ing_batch(spark, [(1, 2, "b", 9.0, "U"), (3, 2, "a", 4.0, "U")])
    apply_change_batch(main, b1, "job-1", cfg)
    v_data = main.epoch_commit_version("job-1")
    # ... and maintenance interleaves metadata-only commits before replay
    main.checkpoint()
    main.add_column("extra", T.StringType())
    main.rename_column("extra", "extra2")
    main.drop_column("extra2")
    # the epoch still resolves to its real DATA commit, not the metadata tail
    assert main.epoch_commit_version("job-1") == v_data
    stats = apply_with_rollup(main, roll, b1, "job-1", cfg, spec)
    assert stats.skipped
    maintained = {
        r.dim: (r.n_rows, r.sv)
        for r in roll.read(spark).select("dim", "n_rows", "sv").collect()
    }
    direct = {
        r.dim: (r.n_rows, r.sv)
        for r in rollup_snapshot(main.read(spark), ["dim"], {"sv": "v"}).collect()
    }
    assert maintained == direct == {"a": (1, 4.0), "b": (2, 11.0)}


def test_stream_ingest_maintains_rollup(spark, tmp_path):
    """End-to-end: Structured Streaming ingest with a derived rollup —
    after the stream drains, the rollup equals a recompute."""
    from airbyte_destination_spark.operators.incremental import RollupSpec
    from airbyte_destination_spark.sources.changegen import write_change_log
    from airbyte_destination_spark.streaming.pipeline import (
        IngestConfig,
        run_ingest_stream,
    )

    log_dir = str(tmp_path / "log")
    write_change_log(spark, log_dir, 600, 60, n_batches=3, seed=7)
    main = LakeTable(str(tmp_path / "main"))
    roll = LakeTable(str(tmp_path / "roll"))
    q = run_ingest_stream(
        spark, log_dir + "/batch-*", main, str(tmp_path / "ckpt"),
        cfg=IngestConfig(n_buckets=4),
        rollup=roll, rollup_spec=RollupSpec(["source"], {"total_tok": "n_tok"}),
    )
    q.awaitTermination(timeout=300)
    maintained = {
        r.source: (r.n_rows, r.total_tok)
        for r in roll.read(spark).select("source", "n_rows", "total_tok").collect()
    }
    direct = {
        r.source: (r.n_rows, r.total_tok)
        for r in rollup_snapshot(
            main.read(spark), ["source"], {"total_tok": "n_tok"}
        ).collect()
    }
    assert maintained == direct and maintained


def _minmax_state(df):
    return {r.dim: (r.n_rows, r.min_v, r.max_v) for r in df.collect()}


def test_minmax_maintained_equals_recompute(spark, table):
    """MIN/MAX IVM: inserts fold algebraically; a removal reaching a
    group's extremal marks it dirty and only those groups recompute
    from the base. Scenario exercises: clean extremal-extending insert,
    clean interior delete, dirty extremal delete, dimension move
    dirtying the source group, NULL dimension group, NULL measure rows,
    and a group dying to zero."""
    from airbyte_destination_spark.operators.incremental import (
        maintain_rollup_minmax,
        rollup_minmax_snapshot,
    )

    v0 = table.merge(
        _batch(
            spark,
            [
                (1, 1, "a", 1.0, "U"),
                (2, 1, "a", 5.0, "U"),
                (3, 1, "a", 9.0, "U"),
                (4, 1, "b", 2.0, "U"),
                (5, 1, "b", 3.0, "U"),
                (6, 1, None, 4.0, "U"),   # NULL dim group
                (7, 1, "b", None, "U"),   # NULL measure row
            ],
        ),
        epoch_id="m0",
    ).version
    table.merge(
        _batch(
            spark,
            [
                (3, 2, "a", 9.0, "D"),    # dirty: removes a's max
                (8, 2, "a", 0.5, "U"),    # clean: extends a's min
                (1, 2, "a", 1.0, "D"),    # removal masked by the 0.5 insert
                (5, 2, "b", 10.0, "U"),   # clean: measure grows past max
                (4, 2, "c", 2.0, "U"),    # dim move b -> c: dirties b's min
                (6, 2, None, 4.0, "D"),   # NULL-dim group dies to zero
                (7, 2, "b", None, "D"),   # NULL-measure removal: never dirty
            ],
        ),
        epoch_id="m1",
    )
    base = rollup_minmax_snapshot(table.read(spark, version=v0), ["dim"], "v")
    cdf = table.table_changes(spark, v_from=v0, pre_images=True)
    out = maintain_rollup_minmax(base, cdf, table.read(spark), ["dim"], "v")
    out = out.select(
        "dim", "n_rows",
        F.col("min_v").alias("min_v"), F.col("max_v").alias("max_v"),
    )
    direct = rollup_minmax_snapshot(table.read(spark), ["dim"], "v").select(
        "dim", "n_rows",
        F.col("min_v").alias("min_v"), F.col("max_v").alias("max_v"),
    )
    got, want = _minmax_state(out), _minmax_state(direct)
    assert got == want
    assert got["a"] == (2, 0.5, 5.0)   # recomputed after the max removal
    assert got["b"] == (1, 10.0, 10.0) # min removed by the dim move
    assert got["c"] == (1, 2.0, 2.0)
    assert None not in got             # zero-count group dropped


def test_minmax_plain_cdf_rejected(spark, table):
    from airbyte_destination_spark.operators.incremental import (
        maintain_rollup_minmax,
        rollup_minmax_snapshot,
    )

    v0 = table.merge(_batch(spark, [(1, 1, "a", 1.0, "U")]), epoch_id="p0").version
    table.merge(_batch(spark, [(1, 2, "a", 2.0, "U")]), epoch_id="p1")
    base = rollup_minmax_snapshot(table.read(spark, version=v0), ["dim"], "v")
    cdf = table.table_changes(spark, v_from=v0)  # no pre-images
    with pytest.raises(Exception, match="pre-image"):
        maintain_rollup_minmax(
            base, cdf, table.read(spark), ["dim"], "v"
        ).collect()


def test_minmax_with_measures_combined(spark, table):
    """Additive measures ride the min/max maintenance pass: one fold
    yields count + sum + min + max, and dirty-group recompute restores
    all of them together."""
    from airbyte_destination_spark.operators.incremental import (
        maintain_rollup_minmax,
        rollup_minmax_snapshot,
    )

    v0 = table.merge(
        _batch(
            spark,
            [
                (1, 1, "a", 1.0, "U"),
                (2, 1, "a", 9.0, "U"),
                (3, 1, "b", 2.0, "U"),
                (4, 1, "b", 3.0, "U"),
            ],
        ),
        epoch_id="mm0",
    ).version
    table.merge(
        _batch(
            spark,
            [
                (2, 2, "a", 9.0, "D"),   # dirty: removes a's max
                (5, 2, "b", 7.0, "U"),   # clean: extends b's max
            ],
        ),
        epoch_id="mm1",
    )
    meas = {"sv": "v"}
    base = rollup_minmax_snapshot(
        table.read(spark, version=v0), ["dim"], "v", meas
    )
    cdf = table.table_changes(spark, v_from=v0, pre_images=True)
    out = {
        r.dim: (r.n_rows, r.min_v, r.max_v, r.sv)
        for r in maintain_rollup_minmax(
            base, cdf, table.read(spark), ["dim"], "v", meas
        ).collect()
    }
    direct = {
        r.dim: (r.n_rows, r.min_v, r.max_v, r.sv)
        for r in rollup_minmax_snapshot(
            table.read(spark), ["dim"], "v", meas
        ).collect()
    }
    assert out == direct
    assert out["a"] == (1, 1.0, 1.0, 1.0)   # recomputed (dirty)
    assert out["b"] == (3, 2.0, 7.0, 12.0)  # folded (clean)


def test_apply_with_rollup_minmax_spec(spark, tmp_path):
    """RollupSpec(minmax=...) through the exactly-once ingest rider:
    the maintained count/sum/min/max table equals a recompute after
    extremal-removing updates, and replays stay no-ops."""
    from airbyte_destination_spark.operators.incremental import (
        RollupSpec,
        apply_with_rollup,
        rollup_minmax_snapshot,
    )

    main = LakeTable(str(tmp_path / "main"))
    roll = LakeTable(str(tmp_path / "roll"))
    spec = RollupSpec(["dim"], {"sv": "v"}, minmax="v")
    cfg = _cfg()
    apply_with_rollup(
        main, roll,
        _ing_batch(
            spark,
            [(1, 1, "a", 1.0, "U"), (2, 1, "a", 9.0, "U"), (3, 1, "b", 2.0, "U")],
        ),
        "job-0", cfg, spec,
    )
    b1 = _ing_batch(
        spark,
        [
            (2, 2, "a", 9.0, "D"),   # dirty: removes a's max
            (3, 2, "c", 2.0, "U"),   # dim move: group b dies
            (4, 2, "a", 0.5, "U"),   # clean: extends a's min
        ],
    )
    apply_with_rollup(main, roll, b1, "job-1", cfg, spec)

    def state(df):
        return {
            r.dim: (r.n_rows, r.min_v, r.max_v, r.sv)
            for r in df.select("dim", "n_rows", "min_v", "max_v", "sv").collect()
        }

    maintained = state(roll.read(spark))
    direct = state(rollup_minmax_snapshot(main.read(spark), ["dim"], "v", {"sv": "v"}))
    assert maintained == direct
    assert maintained["a"] == (2, 0.5, 1.0, 1.5)
    assert "b" not in maintained
    # replay: both epoch markers exist -> both merges no-op
    v_main, v_roll = main.current_version(), roll.current_version()
    apply_with_rollup(main, roll, b1, "job-1", cfg, spec)
    assert (main.current_version(), roll.current_version()) == (v_main, v_roll)
