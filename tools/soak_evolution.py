"""Evolution/maintenance soak: N random op sequences against the pure
Python column-lineage model (the deeper, rng-driven sibling of
tests/test_property.py::test_random_evolution_matches_model; this soak
found the round-5 freed-name-reuse lineage bug that the directed tests
missed). Ops per sequence mix merges-with-deletes, add/drop/rename,
checkpoint, full/tiered compaction and rescale campaigns.

Usage: python tools/soak_evolution.py [n_sequences=40] [ops_per_seq=20]
Exits 1 with the op trace and got/expected states on the first
mismatch; prints SOAK PASS when every sequence converges.
"""
import random, sys, os, shutil
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from pyspark.sql import types as T
from airbyte_destination_spark import get_spark
from airbyte_destination_spark.lake import LakeTable

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
N_SEQ = int(sys.argv[1]) if len(sys.argv) > 1 else 40
OPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20

for seq in range(N_SEQ):
    rng = random.Random(1000 + seq)
    root = f"/tmp/soak_evo/{seq}"  # scratch outside the repo
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable(root + "/t")
    t.create(T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("ver", T.LongType(), False),
    ]), ["doc_id"], "ver", n_buckets=2, merge_strategy="mor")
    pool = ["c1", "c2", "c3"]
    keys = [f"k{i}" for i in range(6)]
    lineages, next_lid, rows = [], [0], {}
    ops_trace = []
    for opi in range(1, OPS + 1):
        code = rng.randint(0, 9)
        a, b = rng.randint(0, 5), rng.randint(0, 2)
        ops_trace.append((code, a, b))
        if code <= 3:
            batch_keys = [k for i, k in enumerate(keys) if (i + a) % 3 != b]
            if not batch_keys: continue
            dele = {k for i, k in enumerate(batch_keys) if (i + opi) % 4 == 0}
            cols = "doc_id string, ver long, op string" + "".join(
                f", {n} string" for _, n, _, _ in lineages)
            data = [tuple([k, opi, "D" if k in dele else "U"] +
                          [None if k in dele else f"{k}.{opi}.{n}" for _, n, _, _ in lineages])
                    for k in batch_keys]
            t.merge(spark.createDataFrame(data, cols), epoch_id=f"e{opi}")
            for k in batch_keys:
                st_ = rows.setdefault(k, {"last": 0, "vals": {}, "dead": False})
                st_["last"] = opi; st_["dead"] = k in dele
                if k not in dele:
                    for lid, n, _, _ in lineages:
                        st_["vals"][lid] = f"{k}.{opi}.{n}"
        elif code <= 5:
            free = [n for n in pool if n not in {x[1] for x in lineages}]
            if not free: continue
            name = free[a % len(free)]
            default = f"d{opi}" if b else None
            t.add_column(name, T.StringType(), initial_default=default)
            lineages.append([next_lid[0], name, default, opi]); next_lid[0] += 1
        elif code == 6:
            if not lineages: continue
            tgt = lineages[a % len(lineages)]
            t.drop_column(tgt[1]); lineages.remove(tgt)
        elif code == 7:
            if not lineages: continue
            tgt = lineages[a % len(lineages)]
            new = f"r{opi}"
            t.rename_column(tgt[1], new); tgt[1] = new
        elif code == 8:
            if b == 0: t.compact(spark, min_files=1)
            elif b == 1: t.checkpoint()
            else: t.compact_tiered(spark, min_run=2, tier_factor=8.0)
        else:
            r = {"published": False}; n = 0
            while not r["published"]:
                r = t.split_buckets(spark, factor=2, campaign_id=f"c{opi}")
                n += 1; assert n <= 6
    got = {r["doc_id"]: {k: v for k, v in r.asDict().items() if k not in ("doc_id", "ver")}
           for r in t.read(spark).collect()}
    expected = {}
    for k, st_ in rows.items():
        if st_["dead"]: continue
        expected[k] = {n: (st_["vals"].get(lid) if st_["last"] >= birth else d)
                       for lid, n, d, birth in lineages}
    if got != expected:
        print(f"SEQ {seq} MISMATCH ops={ops_trace}")
        print("got     ", got)
        print("expected", expected)
        sys.exit(1)
    shutil.rmtree(root, ignore_errors=True)
    print(f"seq {seq} ok ({len(ops_trace)} ops)")
print("SOAK PASS")
