"""Sampling / splitting / packing ops (functions/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbyte_destination_spark.functions.sampling import (
    mixture_sample,
    pack_sequences,
    train_val_split,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_split_is_stable_under_layout(spark):
    """A row's split depends only on (id, seed): repartitioning and
    subsetting the corpus never move a row across the boundary."""
    docs = _docs(spark)
    full = {r.doc_id: r.split for r in train_val_split(docs).collect()}
    shuffled = {
        r.doc_id: r.split
        for r in train_val_split(docs.repartition(13)).collect()
    }
    subset = {
        r.doc_id: r.split
        for r in train_val_split(docs.where(F.col("doc_id") % 3 == 0)).collect()
    }
    assert full == shuffled
    assert all(full[k] == v for k, v in subset.items())
    frac = sum(1 for v in full.values() if v == "val") / len(full)
    assert 0.02 < frac < 0.25  # ~0.1 at tiny corpus size


def test_mixture_weights_respected(spark):
    docs = _docs(spark)
    out = mixture_sample(docs, {"web": 1.0, "books": 0.0})
    srcs = {r.source for r in out.select("source").distinct().collect()}
    assert "books" not in srcs
    n_web_in = docs.where(F.col("source") == "web").count()
    n_web_out = out.where(F.col("source") == "web").count()
    assert n_web_out == n_web_in  # weight 1.0 keeps everything


def test_pack_sequences_invariants(spark):
    docs = _docs(spark)
    packed = pack_sequences(docs, len_col="n_chars", context_len=512)
    rows = packed.collect()
    assert len(rows) == docs.count()
    by_shard: dict[str, list] = {}
    for r in rows:
        by_shard.setdefault(r.source, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        expect_off = 0
        for r in shard_rows:
            # offsets are contiguous within a shard (concat semantics)
            assert r.offset == expect_off
            assert r.bin_id == r.offset // 512
            span = (r.offset + r.seq_len - 1) // 512 - r.offset // 512 + 1
            assert r.bins_spanned == span
            expect_off += r.seq_len


def test_pack_no_single_partition_exchange(spark):
    """The packing window is sharded — the plan must not funnel through
    a SinglePartition exchange (the global-window scale killer)."""
    packed = pack_sequences(_docs(spark), len_col="n_chars")
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=40),
    ctx=st.sampled_from([64, 512, 4096]),
)
def test_pack_sequences_property(spark, lens, ctx):
    """Packing invariants for arbitrary length distributions: offsets
    tile the shard stream exactly; bin math matches a Python fold."""
    rows = [("s", i, n) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    from airbyte_destination_spark.functions.sampling import pack_sequences

    got = {
        r.doc_id: (r.offset, r.bin_id, r.bins_spanned)
        for r in pack_sequences(df, len_col="n_chars", context_len=ctx).collect()
    }
    off = 0
    for i, n in enumerate(lens):
        first_bin = off // ctx
        last_bin = (off + n - 1) // ctx
        assert got[i] == (off, first_bin, last_bin - first_bin + 1)
        off += n


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frac=st.floats(min_value=0.0, max_value=1.0))
def test_split_fraction_monotone(spark, frac):
    """Growing val_frac only ever MOVES rows train->val (nested splits):
    the u01 hash is fixed per id, the threshold alone decides."""
    from airbyte_destination_spark.functions.sampling import train_val_split

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    lo = {r.doc_id for r in train_val_split(df, val_frac=frac).collect() if r.split == "val"}
    hi = {r.doc_id for r in train_val_split(df, val_frac=min(frac + 0.3, 1.0)).collect() if r.split == "val"}
    assert lo <= hi


def test_epoch_shuffle_deterministic_across_parallelism(spark):
    """(shard, pos) must be identical at any input partitioning, and a
    different epoch seed must actually permute."""
    from airbyte_destination_spark.functions.sampling import epoch_shuffle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in epoch_shuffle(docs, 8).select("doc_id", "shard", "pos").collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in epoch_shuffle(docs.repartition(17), 8)
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert a == b
    # contiguous positions per shard
    by_shard = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    c = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in epoch_shuffle(docs, 8, seed="epoch1")
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert c != a  # a new epoch is a new permutation


def test_weighted_sample_fixed_size_weight_biased_deterministic(spark):
    """Exactly k rows; heavier rows overrepresented vs their row share;
    the selected set is identical at any input partitioning; no global
    sort in the physical plan (TakeOrderedAndProject)."""
    from airbyte_destination_spark.functions.sampling import weighted_sample
    from airbyte_destination_spark.plans import executed_plan

    docs = _docs(spark)
    n = docs.count()
    k = 120
    picked = weighted_sample(docs, k=k, weight_col="n_chars").collect()
    assert len(picked) == k
    # long docs (top weight quartile) should exceed their 25% row share
    q3 = docs.approxQuantile("n_chars", [0.75], 0.0)[0]
    heavy = sum(1 for r in picked if r["n_chars"] >= q3)
    assert heavy > 0.3 * k, f"heavy={heavy}/{k} (q3={q3}, n={n})"
    again = weighted_sample(docs.repartition(17), k=k, weight_col="n_chars").collect()
    assert {r["doc_id"] for r in picked} == {r["doc_id"] for r in again}
    plan = executed_plan(
        weighted_sample(docs, k=k, weight_col="n_chars").select("doc_id", "race_key")
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan, plan


def test_fim_transform_roundtrip_and_determinism(spark):
    """The PSM layout is information-preserving: splitting a FIM'd
    sequence at its sentinels and reassembling prefix+middle+suffix
    recovers the original array; untouched rows pass through
    unchanged; the selection is deterministic at any parallelism."""
    from airbyte_destination_spark.functions.sampling import fim_transform

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), (F.col("id") % 37).cast("int")),
            lambda i: (i * 7 % 1000).cast("int"),
        ).alias("tokens"),
    )
    out = fim_transform(docs, "tokens", "doc_id", rate=0.5).collect()
    orig = {r["doc_id"]: r["tokens"] for r in docs.collect()}
    n_applied = 0
    for r in out:
        toks = r["tokens"]
        if not r["fim_applied"]:
            assert toks == orig[r["doc_id"]]
            continue
        n_applied += 1
        assert toks[0] == 50000
        i_suf = toks.index(50001)
        i_mid = toks.index(50002)
        pre = toks[1:i_suf]
        suf = toks[i_suf + 1 : i_mid]
        mid = toks[i_mid + 1 :]
        assert pre + mid + suf == orig[r["doc_id"]]
    assert 0.35 < n_applied / len(out) < 0.65  # the md5 coin at rate=0.5
    # determinism across parallelism
    out13 = {
        r["doc_id"]: (r["fim_applied"], r["tokens"])
        for r in fim_transform(
            docs.repartition(13), "tokens", "doc_id", rate=0.5
        ).collect()
    }
    assert out13 == {r["doc_id"]: (r["fim_applied"], r["tokens"]) for r in out}
