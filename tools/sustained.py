"""Sustained-apply window: 40M events / 20 ordered 2M-event epochs of
MOR ingest with the default inline auto-compaction (16-delta runs), the
BASELINE.md addendum-18 protocol as a committed tool (the original run
was driven ad hoc): same generator as the bench (write_change_log, 4M
docs, seed 42), 2 warmup passes over a 500k log + explicit GC, per-epoch
/proc/stat steal, generation excluded from the timed window.

Writes SUSTAINED_40M.json; the headline compares first-5 vs last-5
epoch medians — flat medians across the 10x table growth is the
measured form of the O(batch) MOR claim.

Run on an otherwise-idle box:  python tools/sustained.py
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (steal/quiesce/scratch helpers)

EVENTS = 40_000_000
EPOCHS = 20
N_DOCS = 4_000_000
SEED = 42
N_BUCKETS = 64


def main() -> None:
    from airbyte_destination_spark.lake import LakeTable
    from airbyte_destination_spark.session import get_spark
    from airbyte_destination_spark.sources.changegen import write_change_log
    from airbyte_destination_spark.streaming.pipeline import (
        IngestConfig,
        apply_change_batch,
    )

    work = bench._scratch("sustained-")
    spark = get_spark(app_name="sustained", master=f"local[{os.cpu_count()}]")

    bench._phase(f"gen {EVENTS} events / {EPOCHS} epochs")
    t0 = time.time()
    write_change_log(
        spark, f"{work}/log", EVENTS, N_DOCS, n_batches=EPOCHS, seed=SEED,
        num_partitions=os.cpu_count(), files_per_batch=4 * os.cpu_count(),
    )
    write_change_log(
        spark, f"{work}/warm", bench.WARM_EVENTS, bench.WARM_EVENTS // 10,
        n_batches=1, seed=SEED + 1, num_partitions=os.cpu_count(),
    )
    gen_sec = time.time() - t0

    bench._phase("warmup (2 passes + GC)")
    cfg = IngestConfig(n_buckets=N_BUCKETS, merge_strategy="mor")
    for w in range(2):
        wt = LakeTable(os.path.join(work, f"warm-t{w}"))
        apply_change_batch(
            wt, spark.read.parquet(f"{work}/warm/batch-00000"), "w", cfg
        )
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    bench._quiesce()

    dirs = sorted(str(p) for p in Path(f"{work}/log").glob("batch-*"))
    table = LakeTable(os.path.join(work, "t"))
    per = EVENTS // EPOCHS
    epochs = []
    bench._phase("timed apply")
    t_all = time.time()
    for i, d in enumerate(dirs):
        st0, tt0 = bench._cpu_ticks()
        t0 = time.time()
        apply_change_batch(table, spark.read.parquet(d), f"s{i:05d}", cfg)
        el = time.time() - t0
        st1, tt1 = bench._cpu_ticks()
        epochs.append({
            "epoch": i,
            "sec": round(el, 2),
            "eps": round(per / el, 1),
            "steal": round(100.0 * (st1 - st0) / max(tt1 - tt0, 1), 2),
        })
        bench._phase(f"epoch {i}: {epochs[-1]['eps']:.0f} eps")
    apply_sec = time.time() - t_all

    clean = [e for e in epochs if e["steal"] <= 3.0]
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out = {
        "events": EVENTS,
        "epochs": EPOCHS,
        "apply_sec": round(apply_sec, 1),
        "events_per_sec": round(EVENTS / apply_sec, 1),
        "events_per_sec_clean": round(
            sum(per for e in clean) / sum(e["sec"] for e in clean), 1
        ) if clean else None,
        "epochs_clean": len(clean),
        "first5_med_eps": med([e["eps"] for e in epochs[:5]]),
        "last5_med_eps": med([e["eps"] for e in epochs[-5:]]),
        "final_rows": table.read(spark).count(),
        "gen_sec": round(gen_sec, 1),
        "per_epoch": epochs,
    }
    (REPO / "SUSTAINED_40M.json").write_text(json.dumps(out, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({k: v for k, v in out.items() if k != "per_epoch"}))


if __name__ == "__main__":
    main()
