"""Property-based CDC correctness: random op sequences vs a pure-Python
last-writer-wins reducer.

Hypothesis drives (key, op, lsn) sequences with duplicate keys, deletes,
reinserts, and shuffled arrival order; the engine's final table state
must equal the oracle fold for every sequence."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("change_lsn", T.LongType(), False),
    ]
)


def python_oracle(events):
    """Independent fold: per key keep max-lsn event; drop if it's a D."""
    best = {}
    for key, op, lsn in events:
        if key not in best or lsn > best[key][1]:
            best[key] = (op, lsn)
    return {
        k: (op, lsn) for k, (op, lsn) in best.items() if op != "D"
    }


events_strategy = st.lists(
    st.tuples(
        st.sampled_from([f"k{i}" for i in range(8)]),  # few keys -> collisions
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=10_000),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda e: e[2],  # unique lsn = the log's total order
)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, n_batches=st.integers(min_value=1, max_value=3))
def test_random_log_matches_oracle(spark, tmp_path_factory, events, n_batches):
    tmp = tmp_path_factory.mktemp("prop")
    t = LakeTable(str(tmp / "t"))
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)

    rows = [
        (k, [lsn % 7, lsn % 11] if op != "D" else None, lsn, op) for k, op, lsn in events
    ]
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if not chunk:
            continue
        df = spark.createDataFrame(
            chunk, "doc_id string, tokens array<int>, change_lsn long, op string"
        )
        t.merge(df, epoch_id=f"e{b}")

    got = {
        r.doc_id: (r.change_lsn, r.tokens) for r in t.read(spark).collect()
    }
    expected = python_oracle(events)
    assert set(got) == set(expected), (got, expected)
    for k, (op, lsn) in expected.items():
        assert got[k][0] == lsn
        assert got[k][1] == [lsn % 7, lsn % 11]


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, wrap_mod=st.integers(min_value=1, max_value=4))
def test_debezium_roundtrip_matches_direct_path(spark, events, wrap_mod):
    """Format invariance, property-based: ANY op sequence rendered as
    Debezium NDJSON (per-row wrapped/unwrapped mix) and parsed back
    folds to the same LWW state as the direct internal-shape fold."""
    from pyspark.sql import functions as F

    from airbyte_destination_spark.operators.dedup import lww_reduce_agg
    from airbyte_destination_spark.sources.debezium import (
        read_debezium_json,
        to_debezium_json,
    )

    rows = [
        (k, [lsn % 7] if op != "D" else None, lsn, op) for k, op, lsn in events
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, change_lsn long, op string"
    )
    lines = to_debezium_json(df, wrapped_pred=F.col("change_lsn") % wrap_mod == 0)
    rec, bad = read_debezium_json(
        spark, lines,
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
            ]
        ),
    )
    assert bad.count() == 0
    folded = lww_reduce_agg(
        rec.select("op", "change_lsn", "data.doc_id", "data.tokens"),
        ["doc_id"],
        ["change_lsn"],
    ).where(F.col("op") != "D")
    got = {r.doc_id: (r.change_lsn, r.tokens) for r in folded.collect()}
    expected = python_oracle(events)
    assert set(got) == set(expected)
    for k, (op, lsn) in expected.items():
        assert got[k] == (lsn, [lsn % 7])


evolution_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # op selector (weighted)
        st.integers(min_value=0, max_value=5),  # param a
        st.integers(min_value=0, max_value=2),  # param b
    ),
    min_size=4,
    max_size=12,
)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=evolution_ops)
def test_random_evolution_matches_model(spark, tmp_path_factory, ops):
    """Model-based fuzz of the round-4/5 evolution machinery: a random
    legal sequence of merge / add_column(default) / drop_column /
    rename_column / checkpoint / compact / split_buckets against a pure
    Python model of Iceberg-style column-lineage semantics (values
    live with the LINEAGE, not the name; a row reads a column's value
    iff its LWW winner was written while that lineage was alive, else
    the lineage's initial default; dropped prior lives never
    resurface under any later name)."""
    from airbyte_destination_spark.lake import LakeTable

    tmp = tmp_path_factory.mktemp("evo")
    t = LakeTable(str(tmp / "t"))
    t.create(
        T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField("ver", T.LongType(), False),
            ]
        ),
        ["doc_id"],
        "ver",
        n_buckets=2,
        merge_strategy="mor",
    )
    pool = ["c1", "c2", "c3"]
    keys = [f"k{i}" for i in range(6)]
    # model state
    lineages = []  # [lid, name, default, birth_op] for ALIVE lineages
    next_lid = [0]
    rows = {}  # key -> {"last": opi, "vals": {lid: value}}

    for opi, (code, a, b) in enumerate(ops, start=1):
        if code <= 3:  # merge (weighted heaviest), with LWW deletes
            batch_keys = [k for i, k in enumerate(keys) if (i + a) % 3 != b]
            if not batch_keys:
                continue
            dele = {k for i, k in enumerate(batch_keys) if (i + opi) % 4 == 0}
            cols = "doc_id string, ver long, op string" + "".join(
                f", {name} string" for _, name, _, _ in lineages
            )
            data = [
                tuple(
                    [k, opi, "D" if k in dele else "U"]
                    + [
                        None if k in dele else f"{k}.{opi}.{name}"
                        for _, name, _, _ in lineages
                    ]
                )
                for k in batch_keys
            ]
            t.merge(spark.createDataFrame(data, cols), epoch_id=f"e{opi}")
            for k in batch_keys:
                st_ = rows.setdefault(k, {"last": 0, "vals": {}, "dead": False})
                st_["last"] = opi
                st_["dead"] = k in dele
                if k not in dele:
                    for lid, name, _, _ in lineages:
                        st_["vals"][lid] = f"{k}.{opi}.{name}"
        elif code <= 5:  # add_column, possibly reusing a dropped name
            free = [n for n in pool if n not in {x[1] for x in lineages}]
            if not free:
                continue
            name = free[a % len(free)]
            default = f"d{opi}" if b else None
            t.add_column(name, T.StringType(), initial_default=default)
            lineages.append([next_lid[0], name, default, opi])
            next_lid[0] += 1
        elif code == 6:  # drop_column
            if not lineages:
                continue
            target = lineages[a % len(lineages)]
            t.drop_column(target[1])
            lineages.remove(target)
        elif code == 7:  # rename to a fresh, never-used name
            if not lineages:
                continue
            target = lineages[a % len(lineages)]
            new = f"r{opi}"
            t.rename_column(target[1], new)
            target[1] = new
        elif code == 8:  # checkpoint / full compact / tiered compact
            if b == 0:
                t.compact(spark, min_files=1)
            elif b == 1:
                t.checkpoint()
            else:
                t.compact_tiered(spark, min_run=2, tier_factor=8.0)
        else:  # rescale: zero-shuffle bucket split campaign
            r = {"published": False}
            n = 0
            while not r["published"]:
                r = t.split_buckets(spark, factor=2, campaign_id=f"c{opi}")
                n += 1
                assert n <= 6

    got = {
        r["doc_id"]: {k: v for k, v in r.asDict().items() if k not in ("doc_id", "ver")}
        for r in t.read(spark).collect()
    }
    expected = {}
    for k, st_ in rows.items():
        if st_["dead"]:
            continue  # LWW tombstone wins: key invisible
        row = {}
        for lid, name, default, birth in lineages:
            row[name] = (
                st_["vals"].get(lid) if st_["last"] >= birth else default
            )
        expected[k] = row
    assert got == expected
