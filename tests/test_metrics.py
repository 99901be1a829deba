"""Product-analytics metrics: funnel ordering, retention cohorts,
time-series gap fill (functions/metrics.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from airbyte_destination_spark.functions.metrics import (
    funnel,
    retention,
    timeseries_fill,
)


def _ts(d, h=0):
    return datetime(2024, 1, d, h)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp, value double"
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes the funnel in order
        (1, "view", _ts(1), 0.0),
        (1, "click", _ts(2), 0.0),
        (1, "purchase", _ts(3), 5.0),
        # u2 clicks BEFORE viewing: click must not count; no purchase
        (2, "click", _ts(1), 0.0),
        (2, "view", _ts(2), 0.0),
        # u3 views only
        (3, "view", _ts(1), 0.0),
        # u4 purchases without ever viewing: counts nowhere
        (4, "purchase", _ts(1), 9.0),
    ]
    out = {
        r["step"]: r.asDict()
        for r in funnel(
            _events(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 1  # only u1; u2's click was too early
    assert out["purchase"]["n_users"] == 1
    assert out["view"]["conv_pct"] == 1.0
    assert abs(out["purchase"]["conv_pct"] - 1 / 3) < 1e-6


def test_funnel_same_timestamp_not_counted(spark):
    # strictly-after semantics: click at the exact view instant is ambiguous
    # ordering, not evidence of progression
    rows = [(1, "view", _ts(1), 0.0), (1, "click", _ts(1), 0.0)]
    out = {r["step"]: r["n_users"] for r in funnel(
        _events(spark, rows), ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 0}


def test_retention_offsets_and_rates(spark):
    rows = [
        # cohort day 1: u1 active d1,d2,d4; u2 active d1 only
        (1, "view", _ts(1), 0.0),
        (1, "view", _ts(2), 0.0),
        (1, "view", _ts(4), 0.0),
        (1, "view", _ts(1, h=5), 0.0),  # same-day dup must not double count
        (2, "view", _ts(1), 0.0),
        # cohort day 3: u3
        (3, "view", _ts(3), 0.0),
    ]
    got = {
        (r["cohort_day_ms"], r["day_offset"]): r.asDict()
        for r in retention(_events(spark, rows)).collect()
    }
    d1 = int(datetime(2024, 1, 1).timestamp() * 1000)
    d3 = d1 + 2 * 86400000
    assert got[(d1, 0)]["n_active"] == 2 and got[(d1, 0)]["retention_pct"] == 1.0
    assert got[(d1, 1)]["n_active"] == 1 and got[(d1, 1)]["retention_pct"] == 0.5
    assert got[(d1, 3)]["n_active"] == 1
    assert (d1, 2) not in got  # nobody active on day 3 from cohort 1
    assert got[(d3, 0)]["cohort_n"] == 1


def test_timeseries_fill_zero_buckets(spark):
    rows = [
        (1, "purchase", _ts(1), 2.0),
        (1, "purchase", _ts(1, h=6), 3.5),
        (2, "purchase", _ts(4), 1.0),
        (2, "view", _ts(2), 99.0),  # filtered out
    ]
    out = {
        r["day_ms"]: (r["n_events"], r["total"])
        for r in timeseries_fill(
            _events(spark, rows), where=F.col("event_type") == "purchase"
        ).collect()
    }
    d1 = int(datetime(2024, 1, 1).timestamp() * 1000)
    day = 86400000
    assert len(out) == 4  # d1..d4 inclusive, gaps explicit
    assert out[d1] == (2, 5.5)
    assert out[d1 + day] == (0, 0.0)
    assert out[d1 + 2 * day] == (0, 0.0)
    assert out[d1 + 3 * day] == (1, 1.0)


def test_dsir_score_prefers_target_like_docs(spark):
    from airbyte_destination_spark.functions.sampling import dsir_logratio

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en"),
            (2, "alpha beta delta", "en"),
            (3, "zeta eta theta", "de"),
            (4, "alpha beta gamma", "de"),  # target-like text, raw lang
            (5, "", "de"),  # empty: NULL score, still present
        ],
        "doc_id int, text string, lang string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in dsir_logratio(docs, F.col("lang") == "en").collect()
    }
    assert len(got) == 5 and got[5]["dsir_score"] is None
    # docs made of target-frequent words outscore the non-target doc
    assert got[4]["dsir_score"] > got[3]["dsir_score"]
    assert got[1]["dsir_score"] == got[4]["dsir_score"]  # same text, same score
    assert got[1]["n_words"] == 3


def test_dsir_resample_deterministic_and_null_safe(spark):
    from airbyte_destination_spark.functions.sampling import dsir_resample

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta", "en" if i % 2 else "de") for i in range(40)]
        + [(999, "", "de")],
        "doc_id int, text string, lang string",
    )
    out1 = {r["doc_id"]: r.asDict() for r in dsir_resample(
        docs, F.col("lang") == "en").collect()}
    out2 = {r["doc_id"]: r.asDict() for r in dsir_resample(
        docs.repartition(7), F.col("lang") == "en").collect()}
    assert out1 == out2  # verdicts independent of partitioning
    assert out1[999]["keep"] is False and out1[999]["dsir_score"] is None
    # identical text -> identical score/prob; verdicts differ only by coin
    probs = {r["keep_prob"] for k, r in out1.items() if k != 999}
    assert len(probs) == 1
    kept = sum(r["keep"] for r in out1.values())
    assert 0 < kept < 41  # the coin actually splits the corpus


def test_leaderboard_rank_and_ties(spark):
    from airbyte_destination_spark.functions.metrics import leaderboard

    rows = [
        (1, "purchase", _ts(1), 10.0),
        (1, "purchase", _ts(2), 5.0),
        (2, "purchase", _ts(1), 15.0),  # ties user 1 on total
        (3, "purchase", _ts(1), 20.0),
        (4, "view", _ts(1), 99.0),      # filtered out
        (5, "purchase", _ts(1), 1.0),
    ]
    out = leaderboard(
        _events(spark, rows), k=3, where=F.col("event_type") == "purchase"
    ).collect()
    assert [(r["rank"], r["user_id"], r["total"]) for r in out] == [
        (1, 3, 20.0),
        (2, 1, 15.0),  # tie at 15.0 broken by lower user_id
        (3, 2, 15.0),
    ]
    assert out[1]["n_events"] == 2


def test_counter_compare_windows_and_null_delta(spark):
    from airbyte_destination_spark.functions.metrics import counter_compare

    rows = [
        # current window: days 9..15 (max day 15, 7-day window)
        (1, "purchase", _ts(15), 10.0),
        (1, "purchase", _ts(9), 5.0),
        # previous window: days 2..8
        (2, "purchase", _ts(8), 5.0),
        (2, "purchase", _ts(2), 5.0),
        # outside both
        (3, "purchase", _ts(1), 100.0),
        (3, "view", _ts(15), 7.0),  # filtered
    ]
    r = counter_compare(
        _events(spark, rows), where=F.col("event_type") == "purchase"
    ).collect()[0]
    assert (r["cur_n"], r["cur_total"]) == (2, 15.0)
    assert (r["prev_n"], r["prev_total"]) == (2, 10.0)
    assert r["delta_pct"] == 0.5

    # empty previous period -> NULL delta, not a zero-division
    r2 = counter_compare(
        _events(spark, [(1, "purchase", _ts(3), 4.0)]),
        where=F.col("event_type") == "purchase",
    ).collect()[0]
    assert r2["prev_n"] == 0 and r2["delta_pct"] is None


def test_cube_rollup_grouping_sets_and_single_expand(spark):
    from airbyte_destination_spark.functions.metrics import cube_rollup

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "view", 1.0),
            (2, "2024-01-01 11:00:00", "click", 2.0),
            (3, "2024-01-02 10:00:00", "view", 4.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = cube_rollup(df)
    rows = {(r.dim, r.day_ms): (r.n_events, r.total) for r in out.collect()}
    d1 = 1704067200000  # 2024-01-01 UTC midnight epoch-ms
    d2 = d1 + 86400000
    assert rows[("view", d1)] == (1, 1.0)
    assert rows[("view", None)] == (2, 5.0)     # per-dimension total
    assert rows[(None, d1)] == (2, 3.0)         # per-day total
    assert rows[(None, None)] == (3, 7.0)       # grand total
    assert len(rows) == 3 + 2 + 2 + 1
    # final AQE plan only (the string repeats the initial plan below it)
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Expand" in plan
    # one scan, one shuffle: Expand feeds a single partially-combined agg
    assert plan.count("Exchange") == 1
    assert "partial_sum" in plan  # map-side combine ahead of the shuffle


def test_pivot_daily_wide_counts_single_exchange(spark):
    from airbyte_destination_spark.functions.metrics import pivot_daily

    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", "view"),
            ("2024-01-01 11:00:00", "view"),
            ("2024-01-01 12:00:00", "click"),
            ("2024-01-02 09:00:00", "purchase"),
        ],
        "ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = pivot_daily(df, dims=("view", "click", "purchase"))
    rows = {r.day_ms: (r.view, r.click, r.purchase) for r in out.collect()}
    d1 = 1704067200000
    assert rows[d1] == (2, 1, 0)          # absent cell filled with 0
    assert rows[d1 + 86400000] == (0, 0, 1)
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    # declared value list -> one day-keyed aggregate, no discovery job
    assert plan.count("Exchange") == 1


def test_user_growth_dau_new_cumulative(spark):
    from airbyte_destination_spark.functions.metrics import user_growth

    rows = [
        (1, "view", _ts(1), 0.0),
        (1, "view", _ts(1, h=8), 0.0),  # same user+day: dau counts once
        (2, "view", _ts(1), 0.0),
        (1, "view", _ts(3), 0.0),       # returning, not new
        (3, "view", _ts(3), 0.0),       # new on day 3
    ]
    out = {r.day_ms: (r.dau, r.new_users, r.cum_users) for r in user_growth(
        _events(spark, rows)).collect()}
    d1 = int(datetime(2024, 1, 1).timestamp() * 1000)
    assert out[d1] == (2, 2, 2)
    assert out[d1 + 2 * 86400000] == (2, 1, 3)
    assert len(out) == 2  # day 2 had no events: no row (not a gap-fill metric)
