"""Transaction-boundary-atomic apply (streaming/txn.py).

The upstream database's read contract: a reader never observes half a
transaction. The reference connector flushes on size alone
(destination.go:29,435), so its destination CAN expose torn
transactions between flushes; these tests pin the stronger contract —
every committed lake snapshot reflects a prefix of WHOLE source
transactions — plus the size-bound and exactly-once properties.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.sources.changegen import change_events
from airbyte_destination_spark.streaming.pipeline import IngestConfig
from airbyte_destination_spark.streaming.txn import (
    apply_txn_log,
    txn_epoch_plan,
)

N_EVENTS, N_DOCS, TXN_SPAN = 4000, 300, 7


@pytest.fixture()
def txn_log(spark):
    """Envelope change log tagged with contiguous source transactions
    (~TXN_SPAN events each, txn boundaries independent of doc keys)."""
    log = change_events(spark, N_EVENTS, N_DOCS, seed=23)
    return log.withColumn("txn_id", F.floor(F.col("change_lsn") / TXN_SPAN))


def _plan_pd(plan):
    return (
        plan.orderBy("lsn_min")
        .toPandas()
        .reset_index(drop=True)
    )


def test_plan_is_whole_txn_contiguous_and_bounded(spark, txn_log):
    plan = txn_epoch_plan(
        txn_log,
        max_records=450,
        max_bytes=5_000,
        bytes_expr=F.size("data.tokens") * 4 + 64,
    )
    pd = _plan_pd(plan)
    # one row (= one epoch) per transaction, every txn covered
    assert len(pd) == pd["txn_id"].nunique() == N_EVENTS // TXN_SPAN + (
        1 if N_EVENTS % TXN_SPAN else 0
    )
    # epochs are dense 0..n-1 and monotone in commit order
    assert sorted(pd["epoch_id"].unique()) == list(range(pd["epoch_id"].max() + 1))
    assert list(pd["epoch_id"]) == sorted(pd["epoch_id"])
    # contiguity: an epoch's lsn range ends before the next one starts
    by_epoch = pd.groupby("epoch_id").agg(
        recs=("n_records", "sum"),
        bts=("n_bytes", "sum"),
        last_recs=("n_records", lambda s: s.iloc[-1]),
        last_bts=("n_bytes", lambda s: s.iloc[-1]),
        lo=("lsn_min", "min"),
        hi=("lsn_max", "max"),
    )
    assert (by_epoch["hi"].values[:-1] < by_epoch["lo"].values[1:]).all()
    # flush-before-append: before its LAST txn was appended, the epoch
    # was within at least one of the caps
    within = (by_epoch["recs"] - by_epoch["last_recs"] < 450) | (
        by_epoch["bts"] - by_epoch["last_bts"] < 5_000
    )
    assert within.all()


def test_oversized_txn_gets_own_epoch_not_torn(spark):
    """A single transaction larger than the record cap is one epoch by
    itself — committed atomically, never split."""
    log = change_events(spark, 1200, 50, seed=5).withColumn(
        "txn_id",
        # txn 0 spans the first 700 events (>> cap), then 50-event txns
        F.when(F.col("change_lsn") < 700, F.lit(0)).otherwise(
            F.lit(14) + F.floor(F.col("change_lsn") / 50)
        ),
    )
    pd = _plan_pd(txn_epoch_plan(log, max_records=200))
    big = pd[pd["txn_id"] == 0]
    assert len(big) == 1 and big.iloc[0]["n_records"] == 700
    # nothing else shares the oversized txn's epoch
    assert (pd["epoch_id"] == big.iloc[0]["epoch_id"]).sum() == 1


def _lww_rows(con_rel):
    return con_rel.fetchall()


def test_txn_atomic_replay_snapshots(spark, tmp_path, txn_log):
    """Every committed snapshot equals the LWW fold of a PREFIX of whole
    transactions — the atomic-visibility contract, checked at every
    version the replay produced, plus exactly-once on rerun."""
    staged = str(tmp_path / "stage")
    table = LakeTable(str(tmp_path / "t"))
    cfg = IngestConfig(n_buckets=8)
    stats = apply_txn_log(
        spark, txn_log, table, cfg, max_records=450, stage_dir=staged
    )
    assert all(not s.skipped for s in stats)

    # independent single-threaded view of the log + plan
    events = txn_log.select(
        "change_lsn", "op", "txn_id", "data.doc_id", "data.n_tok"
    ).toPandas()
    plan = _plan_pd(
        txn_epoch_plan(txn_log, max_records=450)
    )[["txn_id", "epoch_id"]]
    events = events.merge(plan, on="txn_id")

    con = duckdb.connect()
    con.register("ev", events)
    for k, s in enumerate(stats):
        got = sorted(
            (r.doc_id, r.n_tok, r.change_lsn)
            for r in table.read(spark, version=s.version)
            .select("doc_id", "n_tok", "change_lsn")
            .collect()
        )
        want = sorted(
            con.sql(
                f"""
                WITH ranked AS (
                  SELECT doc_id, n_tok, change_lsn, op,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY change_lsn DESC) rn
                  FROM ev WHERE epoch_id <= {k}
                )
                SELECT doc_id, n_tok, change_lsn FROM ranked
                WHERE rn = 1 AND op <> 'D'
                """
            ).fetchall()
        )
        assert got == want, f"snapshot after epoch {k} is not a whole-txn prefix"

    # exactly-once: a full rerun (same deterministic epoch ids) is a no-op
    v = table.current_version()
    stats2 = apply_txn_log(
        spark, txn_log, table, cfg, max_records=450, stage_dir=staged
    )
    assert all(s.skipped for s in stats2)
    assert table.current_version() == v
