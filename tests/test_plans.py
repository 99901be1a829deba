"""Plan-shape assertions: the engine's scale claims, checked in CI.

Each test pins a property of the physical plan that matters at 100 TB:
pushdown reaching the parquet scan, the merge using exactly one shuffle,
the broadcast join staying broadcast, codegen covering the hot path.
"""

from pyspark.sql import functions as F

from airbyte_destination_spark.plans import (
    count_exchanges,
    has_broadcast,
    pushed_filters,
    whole_stage_codegen_ids,
)

SF = "/root/testdata/sf0.01"


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("event_type") == "click")
        .select("event_id", "user_id")
    )
    pf = pushed_filters(df)
    assert "event_type" in pf, f"filter not pushed: {pf!r}"


def test_lww_agg_reduce_is_single_exchange(spark):
    from airbyte_destination_spark.operators.dedup import lww_reduce_agg

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = lww_reduce_agg(ev, ["user_id"], ["event_id"])
    assert count_exchanges(out) == 1, out._jdf.queryExecution().executedPlan().toString()


def test_lww_window_costs_one_exchange_too(spark):
    from airbyte_destination_spark.operators.dedup import lww_reduce

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = lww_reduce(ev, ["user_id"], ["event_id"])
    assert count_exchanges(out) == 1


def test_agg_reduce_has_partial_aggregation(spark):
    """The max_by reduce must show a partial (map-side) HashAggregate
    before the exchange — that partial combine IS the skew handling."""
    from airbyte_destination_spark.operators.dedup import lww_reduce_agg

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = lww_reduce_agg(ev, ["user_id"], ["event_id"])._jdf.queryExecution().executedPlan().toString()
    # struct-valued max_by lowers to SortAggregate; the property that
    # matters is the partial_max_by BEFORE the exchange
    assert "partial_max_by" in plan, plan
    assert plan.index("partial_max_by") > plan.index("Exchange") or plan.count(
        "Aggregate"
    ) >= 2, plan


def test_cosine_topk_broadcasts_queries(spark):
    from airbyte_destination_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cosine_topk(emb, emb.where("vec_id < 5"), k=3)
    assert has_broadcast(out)


def test_merge_plan_single_payload_shuffle(spark, tmp_path):
    """End-to-end merge: exactly one shuffle of the payload (the
    key exchange that doubles as bucket placement), verified by bucket-
    aligned output files being written without a second exchange."""
    from pyspark.sql import types as T

    from airbyte_destination_spark.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("change_lsn", T.LongType(), False),
        ]
    )
    t = LakeTable(str(tmp_path / "t"))
    t.create(schema, ["doc_id"], "change_lsn", n_buckets=4)
    b = spark.createDataFrame(
        [(f"d{i}", [i], i, "I") for i in range(100)],
        "doc_id string, tokens array<int>, change_lsn long, op string",
    )
    t.merge(b, epoch_id="e")
    m = t.manifest()
    # every bucket's files contain only that bucket's keys
    import os

    from airbyte_destination_spark.lake.table import bucket_expr

    for bk, files in m["buckets"].items():
        for e in files:
            got = (
                spark.read.parquet(os.path.join(t.root, e["path"]))
                .select(bucket_expr(["doc_id"], 4).alias("b"))
                .distinct()
                .collect()
            )
            assert [r.b for r in got] == [int(bk)]


def test_codegen_covers_enrichment(spark):
    from airbyte_destination_spark.functions.enrich import enrich_records

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            F.lit("ns").alias("namespace"),
            F.lit("s").alias("stream"),
            F.col("event_id").alias("change_lsn"),
            F.col("event_id").alias("emitted_at"),
        )
    )
    out = enrich_records(ev)
    assert whole_stage_codegen_ids(out) >= 1


def test_record_index_has_no_single_partition_exchange(spark):
    """The Airbyte record index must stay partition-parallel: the
    round-1 global Window.orderBy pulled every record through one task
    (a 100 TB non-starter); the two-pass offset design must show NO
    SinglePartition exchange and still produce exactly 0..n-1."""
    from airbyte_destination_spark.destination import _global_record_index

    df = spark.range(0, 5000, 1, 8).selectExpr("id", "'x' AS v")
    idx = _global_record_index(df)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    got = sorted(r._record_index for r in idx.select("_record_index").collect())
    assert got == list(range(5000))


def test_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """A corpus where EVERY doc shares one band bucket (identical text)
    must produce zero candidate pairs once the bucket exceeds the cap —
    the O(b^2) blowup guard — while normal corpora are unaffected."""
    from airbyte_destination_spark.functions.textdedup import minhash_lsh_pairs

    clones = spark.createDataFrame(
        [(i, "same text everywhere for all docs") for i in range(40)],
        "doc_id long, text string",
    )
    capped = minhash_lsh_pairs(clones, n_hashes=8, bands=4, max_bucket=10)
    assert capped.count() == 0
    uncapped = minhash_lsh_pairs(clones, n_hashes=8, bands=4, max_bucket=10_000)
    assert uncapped.count() == 40 * 39 // 2


def test_table_changes_plan_has_no_serial_stage(spark, tmp_path):
    """The CDF join must stay partition-parallel: no SinglePartition
    exchange, no Cartesian product — at 100 TB both snapshot sides are
    large and the plan must be a key-partitioned join."""
    from pyspark.sql import types as T

    from airbyte_destination_spark.lake import LakeTable

    t = LakeTable(str(tmp_path / "t"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("change_lsn", T.LongType(), False),
        ]
    )
    bs = "doc_id string, tokens array<int>, change_lsn long, op string"
    t.create(schema, ["doc_id"], "change_lsn", n_buckets=4)
    v0 = t.merge(
        spark.createDataFrame([(f"k{i}", [i], i, "U") for i in range(50)], bs),
        epoch_id="p-0",
    ).version
    t.merge(
        spark.createDataFrame([("k1", [99], 100, "U")], bs), epoch_id="p-1"
    )
    plan = (
        t.table_changes(spark, v_from=v0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_connected_components_iteration_plan(spark):
    """One CC iteration = key joins + min-aggregate; never a Cartesian
    product or a single-partition funnel."""
    from airbyte_destination_spark.functions.textdedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "doc_a long, doc_b long"
    )
    out = connected_components(pairs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_tfidf_docfreq_join_not_broadcast(spark):
    """The docfreq side of tfidf_topk is vocabulary-sized (10^8-10^9
    distinct tokens at web scale) — it must NEVER be planned as a
    broadcast, whatever the stats estimate says. The shuffle_hash hint
    pins a shuffled hash join."""
    from airbyte_destination_spark.functions.text import tfidf_topk
    from airbyte_destination_spark.plans import executed_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = executed_plan(tfidf_topk(docs, k=3))
    assert "BroadcastExchange" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_tokenize_vocab_join_not_broadcast(spark):
    """The vocabulary side of tokenize_freq_vocab is 10^8+ rows at web
    scale — the words->vocab token-assignment join must be a shuffled
    hash join on the word, never a broadcast."""
    from airbyte_destination_spark.functions.text import tokenize_freq_vocab
    from airbyte_destination_spark.plans import executed_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = executed_plan(tokenize_freq_vocab(docs))
    assert "BroadcastExchange" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_freq_vocab_rank_has_no_single_partition_window(spark):
    """The tid ranking runs over the vocabulary aggregate — 10^8+ rows
    at web scale — so it must be the range-repartitioned two-pass rank
    (per-_pid windows), never an unpartitioned Window.orderBy that
    funnels the whole vocabulary through one task. And the rank must
    still equal the naive single-partition formulation."""
    from pyspark.sql import Window
    from airbyte_destination_spark.functions.text import freq_vocab
    from airbyte_destination_spark.plans import executed_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = freq_vocab(docs)
    assert "SinglePartition" not in executed_plan(vocab), executed_plan(vocab)
    naive = (
        docs.selectExpr(
            "explode(split(lower(trim(text)), '\\\\s+')) AS w"
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "tid",
            F.row_number().over(
                Window.orderBy(F.col("freq").desc(), F.col("w").asc())
            ),
        )
    )
    assert sorted(map(tuple, vocab.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_token_ngram_no_global_sort_before_topk(spark):
    """token_ngram_topk's per-doc lead() windows partition by doc_id —
    the only global ordering is the final k-row TakeOrdered, never a
    full-sort Exchange of the gram stream."""
    from airbyte_destination_spark.functions.text import token_ngram_topk
    from airbyte_destination_spark.plans import executed_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = executed_plan(token_ngram_topk(docs, n=2, k=5))
    assert "BroadcastExchange" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_partial_update_reduce_single_exchange_with_partial_agg(spark):
    """The partial-image fold must keep the LWW reduce's physical shape:
    ONE hash exchange and a map-side partial aggregate before it (the
    per-column max_by folds are all null-skipping aggregates over the
    same grouping, so they share the one exchange and pre-reduce hot
    keys upstream exactly like lww_reduce_agg)."""
    from airbyte_destination_spark.operators.dedup import partial_update_reduce

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id",
        "event_id",
        F.when(F.col("event_id") % 3 != 0, F.col("event_type")).alias("event_type"),
        F.when(F.col("event_id") % 2 == 0, F.col("value")).alias("value"),
        F.when(F.col("event_type") == "purchase", F.lit("D")).alias("op"),
    )
    out = partial_update_reduce(ev, ["user_id"], "event_id")
    assert count_exchanges(out) == 1, out._jdf.queryExecution().executedPlan().toString()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan or "partial_max" in plan, plan


def test_zorder_key_stays_in_codegen(spark):
    """The Morton key is pure shift/and/or expression arithmetic: no
    Python UDF node may appear, and the projection stays inside a
    whole-stage-codegen span."""
    from airbyte_destination_spark.lake.zorder import zorder_key

    df = spark.read.parquet(f"{SF}/events.parquet").select(
        zorder_key([("event_id", 0.0, 1e6), ("user_id", 0.0, 1e4)]).alias("z")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert whole_stage_codegen_ids(df) >= 1


def test_bloom_build_shuffles_ids_only(spark, tmp_path):
    """The bloom build's exchange carries (hash, filename) — the key
    payload column must be projected away BEFORE the shuffle (ids-only,
    the textdedup discipline)."""
    from pyspark.sql import types as T

    from airbyte_destination_spark.lake import LakeTable

    t = LakeTable(str(tmp_path / "b"))
    t.create(
        T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField("payload", T.StringType(), True),
                T.StructField("v", T.LongType(), False),
            ]
        ),
        ["doc_id"],
        "v",
        n_buckets=2,
    )
    t.merge(
        spark.createDataFrame(
            [(f"d{i}", "X" * 100, 1, "I") for i in range(50)],
            "doc_id string, payload string, v long, op string",
        ),
        epoch_id="e0",
    )
    m = t.manifest()
    paths = [
        f"{t.root}/{e['path']}" for fs in m["buckets"].values() for e in fs
    ]
    hashed = spark.read.parquet(*paths).select(
        F.xxhash64(F.col("doc_id")).alias("h"),
        F.input_file_name().alias("f"),
    )
    plan = hashed.groupBy("f").count()._jdf.queryExecution().executedPlan().toString()
    # the scan feeding the exchange must not read the payload column
    assert "payload" not in plan, plan


def test_dsir_vocab_join_not_broadcast(spark):
    """dsir_logratio's per-word model table is vocabulary-sized — the
    words->model join must be a shuffled hash join. The only broadcast
    allowed in the plan is the 1-row totals cross join (a
    BroadcastNestedLoopJoin over a scalar, like lm_perplexity's V)."""
    from airbyte_destination_spark.functions.sampling import dsir_logratio
    from airbyte_destination_spark.plans import executed_plan
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = executed_plan(dsir_logratio(docs, F.col("lang") == "en"))
    # the WORD-keyed model join is pinned shuffled; the final doc_id
    # left join is left to Catalyst (stats-sized, not hinted)
    assert "ShuffledHashJoin [w" in plan, plan
    assert "BroadcastHashJoin [w" not in plan, plan


def test_funnel_no_cartesian_and_stage_joins_on_id(spark):
    """funnel chains id-keyed joins whose small side is (id, ts) rows
    of funnel survivors — no cartesian product, no per-user event
    collection (no collect_list/sort_array aggregate in the plan)."""
    from airbyte_destination_spark.functions.metrics import funnel
    from airbyte_destination_spark.plans import executed_plan

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = executed_plan(funnel(ev, ["view", "click", "purchase"]))
    assert "CartesianProduct" not in plan, plan
    assert "collect_list" not in plan and "sort_array" not in plan, plan


def test_snapshot_sync_diff_is_one_join_no_branch_duplication(spark, tmp_path):
    """The resync diff must plan as exactly ONE key-keyed join with the
    unchanged-row filter on its output — not an upsert branch unioned
    with a delete branch (two probes over the same shuffle). With
    broadcast off (both sides are table-scale at 100 TB, so that is
    what Catalyst's stats would decide) it must degrade to a single
    SortMergeJoin FullOuter."""
    from pyspark.sql import types as T

    from airbyte_destination_spark.lake import LakeTable
    from airbyte_destination_spark.plans import executed_plan
    from airbyte_destination_spark.streaming.pipeline import (
        IngestConfig,
        _snapshot_diff,
        apply_change_batch,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("change_lsn", T.LongType(), False),
            T.StructField("kind", T.StringType(), True),
        ]
    )
    cfg = IngestConfig(key_cols=["doc_id"], n_buckets=4)
    table = LakeTable(str(tmp_path / "t"))
    table.create(schema, ["doc_id"], "change_lsn", n_buckets=4)
    rows = [(i, i, f"k{i}") for i in range(1, 9)]
    batch = spark.createDataFrame(rows, schema).withColumn("op", F.lit("U"))
    apply_change_batch(table, batch, "seed-0", cfg)

    snapshot = spark.createDataFrame(rows, schema)
    diff = _snapshot_diff(
        snapshot, table.read(spark), ["doc_id"], "change_lsn", delete_lsn=99
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = executed_plan(diff)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan.count("SortMergeJoin") == 1, plan
    assert "FullOuter" in plan, plan
    assert "BroadcastHashJoin" not in plan and "Union" not in plan, plan


def test_pivot_daily_is_single_exchange(spark):
    """pivot_daily compiles to conditional aggregates over ONE day-keyed
    exchange — the builtin RelationalGroupedDataset.pivot plans two
    aggregates/exchanges plus a value-discovery collect job."""
    from airbyte_destination_spark.functions.metrics import pivot_daily

    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert count_exchanges(pivot_daily(ev)) == 1


def test_bpe_merge_round_single_data_exchange(spark):
    """One BPE merge round = ONE exchange over the word-keyed token
    stream: every window and the rebuild aggregation share the per-word
    hash partitioning (HashPartitioning(word) satisfies the
    groupBy(word, cnt) clustering), so Catalyst reuses the exchange."""
    from airbyte_destination_spark.functions.text import _bpe_merge_round

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ex = docs.select(
        F.lower(F.col("text")).alias("word"),
        F.lit(1).alias("cnt"),
        F.posexplode(F.split(F.lower("text"), "")).alias("pos", "tok"),
    )
    assert count_exchanges(_bpe_merge_round(ex, "e", "t")) == 1


def test_txn_epoch_plan_aggregates_before_the_window(spark):
    """The planner's unpartitioned running-sum window must consume TXN
    SUMMARIES (post-aggregate), never raw events: the single-partition
    exchange sits above a partial-aggregated groupBy, so the narrow
    stage carries one row per transaction."""
    from airbyte_destination_spark.plans import executed_plan
    from airbyte_destination_spark.streaming.txn import txn_epoch_plan

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("event_id").alias("change_lsn"),
        F.floor(F.col("event_id") / 7).alias("txn_id"),
    )
    plan = executed_plan(txn_epoch_plan(ev, max_records=450))
    # the SinglePartition exchange exists (the window) but a hash
    # exchange + partial aggregate run first, on the event stream
    assert "SinglePartition" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    assert "partial_count" in plan or "partial_min" in plan, plan


def test_cms_state_is_one_scan_distinct_hashed(spark):
    """The count-min grid must cost ONE scan of the input, with the md5
    work done per DISTINCT value: an exact (group, value) count-
    aggregate runs FIRST (map-side combined, so the first exchange
    carries the combined distinct table, not the raw stream), the
    posexplode of the d hash indexes sits ABOVE that aggregate (hashing
    |distinct| rows, not |instances|), and the grid aggregate sums the
    weighted counts through a second, distinct-table-sized exchange.
    Round-5 shape: on a Zipf token stream this cuts md5 volume ~10x
    for an identical grid (equality pinned in test_sketch.py)."""
    from airbyte_destination_spark.functions.sketch import cms_state

    ev = spark.read.parquet(f"{SF}/events.parquet")
    st = cms_state(ev, "user_id", [])
    plan = st._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    # two exchanges: distinct-count, then grid — both map-side combined
    assert count_exchanges(st) == 2, plan
    assert plan.count("HashAggregate") >= 4, plan  # 2x (partial+final)
    # the explode (Generate) runs above the first aggregate, not on the
    # scan: md5 per distinct value, never per instance
    gen_pos = plan.find("Generate")
    assert gen_pos != -1, plan
    assert "HashAggregate" in plan[gen_pos:], plan


def test_kmv_salted_topk_pushes_group_limit(spark):
    """The KMV stage-1 shuffle must carry a pre-limited top-k per salt
    (WindowGroupLimit below the exchange), so the exchange moves at
    most k rows per salt per map task — never the full distinct set."""
    from airbyte_destination_spark.functions.sketch import kmv_sketch

    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = kmv_sketch(ev, "user_id", ["event_type"])
    plan = sk._jdf.queryExecution().executedPlan().toString()
    # Partial (map-side, below the salt exchange) + Final group limits
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "Partial" in plan, plan


def test_colocated_bucketed_join_has_zero_exchanges(spark, tmp_path):
    """register_bucketed materializes both sides hash-clustered on the
    join key, so the orderkey equi-join must plan with NO shuffle
    exchange at all (the whole point of paying the clustering at
    write): with broadcast off it is a SortMergeJoin whose children
    are bucketed scans, and the only exchange in the aggregated query
    is the final 5-row groupBy."""
    from airbyte_destination_spark.functions.relational import (
        colocated_revenue_by_priority,
        register_bucketed,
    )
    from airbyte_destination_spark.plans import count_exchanges, executed_plan

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li_b = register_bucketed(
        spark, li, "t_li_plan", "l_orderkey", 4, str(tmp_path / "li")
    )
    od_b = register_bucketed(
        spark, od, "t_ord_plan", "o_orderkey", 4, str(tmp_path / "ord")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        join_only = li_b.join(
            od_b, F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = executed_plan(join_only)
        assert "SortMergeJoin" in plan, plan
        assert count_exchanges(join_only) == 0, plan
        agg = colocated_revenue_by_priority(li_b, od_b)
        assert count_exchanges(agg) == 1, executed_plan(agg)
        # and the bucketed layout is what the scan actually reads
        assert "Bucketed: true" in formatted(join_only) or "SelectedBucketsCount" in formatted(join_only)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_plan")
        spark.sql("DROP TABLE IF EXISTS t_ord_plan")


def formatted(df):
    from airbyte_destination_spark.plans import formatted_plan

    return formatted_plan(df)


def test_hdr_state_is_one_exchange_pure_codegen(spark):
    """hdr_state must plan as ONE map-side-combined aggregate (partial
    HashAggregate below the exchange, final above) with no Python UDF
    anywhere — the sketch is the aggregation state, so the shuffle
    carries <= |groups| x 960 bin rows, not the input."""
    from airbyte_destination_spark.functions.sketch import (
        hdr_quantiles,
        hdr_state,
    )
    from airbyte_destination_spark.plans import count_exchanges, executed_plan

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    state = hdr_state(ev, "cents", ["event_type"])
    plan = executed_plan(state)
    assert count_exchanges(state) == 1, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the full read path adds only the bounded-state window + final agg,
    # never a scan-sized shuffle
    est = hdr_quantiles(state, ["event_type"])
    assert "BatchEvalPython" not in executed_plan(est)
