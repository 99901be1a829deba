"""Incrementally-maintained materialized JOIN view: the refreshed view
must equal a full-recompute LEFT JOIN after every change to EITHER base
table — fact inserts/updates/deletes, dim value updates, dim deletes
(view rows downgrade to NULLs, not dropped), dim inserts (NULL rows
backfill). Plus exactly-once across a lost ack, the index-accelerated
fan-out path, and schema/arg validation.

Reference frame: the reference lands streams as independent tables and
re-joins at query time (destination.go routes per-stream batches);
this maintains the join from both change feeds so refresh cost scales
with the change batch, not the fact table.
"""

import pytest
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.operators.join_view import (
    create_join_view,
    join_snapshot,
    refresh_join_view,
)

FS = "k long, fk long, val string, v long, op string"
DS = "dk long, seg string, dv long, op string"


@pytest.fixture(params=["cow", "mor"])
def tables(spark, tmp_path, request):
    fact = LakeTable(str(tmp_path / "fact"))
    fact.create(
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("fk", T.LongType(), True),
                T.StructField("val", T.StringType(), True),
                T.StructField("v", T.LongType(), False),
            ]
        ),
        ["k"],
        "v",
        n_buckets=4,
        merge_strategy=request.param,
    )
    dim = LakeTable(str(tmp_path / "dim"))
    dim.create(
        T.StructType(
            [
                T.StructField("dk", T.LongType(), False),
                T.StructField("seg", T.StringType(), True),
                T.StructField("dv", T.LongType(), False),
            ]
        ),
        ["dk"],
        "dv",
        n_buckets=4,
    )
    view = create_join_view(
        fact, dim, str(tmp_path / "view"), "fk", {"segment": "seg"}
    )
    return fact, dim, view


def _rows(df):
    return sorted(
        (r.k, r.fk, r.val, r.v, r.segment)
        for r in df.select("k", "fk", "val", "v", "segment").collect()
    )


def _check(spark, fact, dim, view):
    assert _rows(view.read(spark)) == _rows(
        join_snapshot(spark, fact, dim, "fk", {"segment": "seg"})
    )


def test_view_tracks_both_feeds(spark, tables):
    fact, dim, view = tables

    dim.merge(
        spark.createDataFrame(
            [(10, "gold", 1, "I"), (20, "iron", 1, "I")], DS
        ),
        epoch_id="d-0",
    )
    fact.merge(
        spark.createDataFrame(
            # fk=30 has no dim row yet; fk=None never joins
            [(1, 10, "a", 1, "I"), (2, 20, "b", 2, "I"),
             (3, 30, "c", 3, "I"), (4, None, "d", 4, "I")],
            FS,
        ),
        epoch_id="f-0",
    )
    assert refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"})
    _check(spark, fact, dim, view)
    assert _rows(view.read(spark))[2][4] is None  # k=3: dangling fk

    # fact-side: update (fk move 10->20), delete, insert
    fact.merge(
        spark.createDataFrame(
            [(1, 20, "a2", 10, "U"), (2, None, None, 11, "D"),
             (5, 10, "e", 12, "I")],
            FS,
        ),
        epoch_id="f-1",
    )
    assert refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"})
    _check(spark, fact, dim, view)

    # dim-side only: value update fans out to fk=20 facts, delete of
    # dk=10 downgrades its facts to NULL, insert of dk=30 backfills k=3
    dim.merge(
        spark.createDataFrame(
            [(20, "steel", 5, "U"), (10, None, 5, "D"), (30, "tin", 5, "I")],
            DS,
        ),
        epoch_id="d-1",
    )
    assert refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"})
    _check(spark, fact, dim, view)
    got = {r.k: r.segment for r in view.read(spark).collect()}
    assert got == {1: "steel", 3: "tin", 4: None, 5: None}

    # nothing new -> no-op
    assert refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"}) is None


def test_refresh_is_exactly_once_after_lost_ack(spark, tables):
    import os

    fact, dim, view = tables
    dim.merge(spark.createDataFrame([(10, "gold", 1, "I")], DS), epoch_id="d-0")
    fact.merge(
        spark.createDataFrame([(1, 10, "a", 1, "I"), (2, 10, "b", 2, "I")], FS),
        epoch_id="f-0",
    )
    out = refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"})
    n_epochs = view.n_applied_epochs()
    # crash between merge and acks: both offsets lost
    os.unlink(fact._consumer_path("__jv_view_fact"))
    os.unlink(dim._consumer_path("__jv_view_dim"))
    assert refresh_join_view(
        spark, fact, dim, view, "fk", {"segment": "seg"}
    ) == out  # same window -> same epoch id -> merge skipped, acks land
    assert view.n_applied_epochs() == n_epochs
    _check(spark, fact, dim, view)


def test_index_fanout_path_matches_semijoin(spark, tmp_path, tables):
    from airbyte_destination_spark.operators.secondary_index import create_index

    fact, dim, view = tables
    idx = create_index(fact, str(tmp_path / "idx"), "fk", n_buckets=4)
    dim.merge(
        spark.createDataFrame([(10, "gold", 1, "I"), (20, "iron", 1, "I")], DS),
        epoch_id="d-0",
    )
    fact.merge(
        spark.createDataFrame(
            [(1, 10, "a", 1, "I"), (2, 20, "b", 2, "I"), (3, 10, "c", 3, "I")],
            FS,
        ),
        epoch_id="f-0",
    )
    kw = dict(fk_index=idx, max_index_fanout=10)
    assert refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"}, **kw)
    _check(spark, fact, dim, view)
    # dim-only change: fan-out must go through the index probe
    dim.merge(spark.createDataFrame([(10, "pearl", 5, "U")], DS), epoch_id="d-1")
    assert refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"}, **kw)
    _check(spark, fact, dim, view)
    assert {r.k: r.segment for r in view.read(spark).collect()} == {
        1: "pearl", 2: "iron", 3: "pearl"
    }
    # fan-out wider than the cap refuses rather than collecting unbounded keys
    dim.merge(
        spark.createDataFrame([(i, "x", 9, "U") for i in range(10, 31)], DS),
        epoch_id="d-2",
    )
    with pytest.raises(ValueError, match="fans out"):
        refresh_join_view(
            spark, fact, dim, view, "fk", {"segment": "seg"},
            fk_index=idx, max_index_fanout=5,
        )
    # the failed attempt acked nothing: the semijoin path completes it
    assert refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"})
    _check(spark, fact, dim, view)


def test_fact_schema_evolution_flows_through(spark, tables):
    """A column added to the fact mid-stream reaches the view on the
    next refresh (merge-side schema evolution): pre-evolution view rows
    read NULL in the new column, exactly like the fact itself."""
    fact, dim, view = tables
    dim.merge(spark.createDataFrame([(10, "gold", 1, "I")], DS), epoch_id="d-0")
    fact.merge(
        spark.createDataFrame([(1, 10, "a", 1, "I")], FS), epoch_id="f-0"
    )
    refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"})
    fact.merge(
        spark.createDataFrame(
            [(2, 10, "b", 2, "x2", "U")],
            "k long, fk long, val string, v long, extra string, op string",
        ),
        epoch_id="f-1",
    )
    refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"})
    cols = sorted(view.read(spark).columns)
    assert "extra" in cols
    got = sorted(
        (tuple(r[c] for c in cols) for r in view.read(spark).collect()),
        key=repr,
    )
    want = sorted(
        (
            tuple(r[c] for c in cols)
            for r in join_snapshot(
                spark, fact, dim, "fk", {"segment": "seg"}
            ).collect()
        ),
        key=repr,
    )
    assert got == want
    extras = {r.k: r.extra for r in view.read(spark).collect()}
    assert extras == {1: None, 2: "x2"}


def test_rollup_chains_off_the_view_feed(spark, tables):
    """Derived tables compose: a per-segment aggregate maintained from
    the VIEW's own change feed (the view is a lake table, so it has
    one) must track a direct aggregate over the view after every
    refresh — including dim-driven segment moves, which surface as
    -pre/+post contributions in the view's pre-image CDF."""
    from airbyte_destination_spark.operators.incremental import (
        maintain_rollup,
        rollup_snapshot,
    )

    fact, dim, view = tables
    agg = rollup_snapshot(
        view.read(spark).limit(0), ["segment"], {"sum_fk": "fk"}
    )

    steps = [
        (dim, [(10, "gold", 1, "I"), (20, "iron", 1, "I")], DS, "d-0"),
        (fact, [(1, 10, "a", 1, "I"), (2, 20, "b", 2, "I"),
                (3, 10, "c", 3, "I")], FS, "f-0"),
        (fact, [(1, 20, "a2", 10, "U"), (3, None, None, 11, "D")], FS, "f-1"),
        (dim, [(10, "pearl", 5, "U"), (20, None, 5, "D")], DS, "d-1"),
    ]
    for table, rows, schema, epoch in steps:
        table.merge(spark.createDataFrame(rows, schema), epoch_id=epoch)
        refresh_join_view(spark, fact, dim, view, "fk", {"segment": "seg"})
        cdf, v_to = view.poll_changes(spark, "agg", pre_images=True)
        if cdf is not None:
            agg = maintain_rollup(agg, cdf, ["segment"], {"sum_fk": "fk"})
            view.ack("agg", v_to)
        got = sorted(
            (r.segment, r.n_rows, r.sum_fk) for r in agg.collect()
        )
        want = sorted(
            (r.segment, r.n_rows, r.sum_fk)
            for r in rollup_snapshot(
                view.read(spark), ["segment"], {"sum_fk": "fk"}
            ).collect()
        )
        assert got == want, (epoch, got, want)


def test_validation(spark, tmp_path, tables):
    fact, dim, view = tables
    with pytest.raises(ValueError, match="not in fact schema"):
        create_join_view(fact, dim, str(tmp_path / "v2"), "nope", {"s": "seg"})
    with pytest.raises(ValueError, match="not in dim schema"):
        create_join_view(fact, dim, str(tmp_path / "v3"), "fk", {"s": "nope"})
    with pytest.raises(ValueError, match="collides"):
        create_join_view(fact, dim, str(tmp_path / "v4"), "fk", {"val": "seg"})
