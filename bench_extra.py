"""Round-6 optimization harness (bench.py is FROZEN for measurement —
this file exists so per-query isolation, job counting, and plan capture
never touch the driver's timed protocol; see spark_optimization_guide
§1.4/§1.5).

Modes:
  python bench_extra.py --profile [name ...]   per-query breakdown:
      build_sec  = queries()[name](spark, SF_DIR) construction time
                   (driver actions hidden in the builder land here)
      exec_sec   = noop-sink write of the returned frame (guide §1.4)
      jobs       = Spark jobs launched across build+exec (job-group count)
  python bench_extra.py --explain name [...]   capture .explain("formatted")
      to plans/r06/<name>_<tag>.txt (--tag before|after)
  python bench_extra.py --time name [...]      bench-identical timing for a
      subset (warmup at sf0.001 then timed at SF_DIR), repeatable via -n

All modes honor $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS exactly like
bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from airbyte_destination_spark.session import get_spark

    return get_spark(
        app_name="bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )


def _warm(spark, entry, names):
    warm_dir = SF_DIR.replace(Path(SF_DIR).name, "sf0.001")
    if not os.path.isdir(warm_dir) or warm_dir == SF_DIR:
        return
    qs = entry.queries()
    for name in names:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:  # noqa: BLE001
            print(f"[warmup {name} failed: {ex}]", file=sys.stderr)


def _job_count(sc, group):
    try:
        return len(sc.statusTracker().getJobIdsForGroup(group))
    except Exception:  # noqa: BLE001
        return -1


def cmd_profile(names, repeat):
    import __spark_entry__ as entry

    spark = _spark()
    sc = spark.sparkContext
    qs = entry.queries()
    names = names or list(qs)
    _warm(spark, entry, names)
    print(f"{'query':40s} {'build':>7s} {'exec':>7s} {'total':>7s} {'jobs':>5s}")
    rows = []
    for name in names:
        best = None
        for r in range(repeat):
            group = f"prof-{name}-{r}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            sc.setJobGroup(None, None)
            cur = {
                "name": name,
                "build": round(t1 - t0, 3),
                "exec": round(t2 - t1, 3),
                "total": round(t2 - t0, 3),
                "jobs": _job_count(sc, group),
            }
            if best is None or cur["total"] < best["total"]:
                best = cur
        rows.append(best)
        print(
            f"{name:40s} {best['build']:7.2f} {best['exec']:7.2f}"
            f" {best['total']:7.2f} {best['jobs']:5d}"
        )
    print(json.dumps(rows))


def cmd_explain(names, tag):
    import __spark_entry__ as entry

    spark = _spark()
    qs = entry.queries()
    out_dir = Path(__file__).resolve().parent / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = out_dir / f"{name}_{tag}.txt"
        p.write_text(plan)
        print(f"wrote {p}")


def cmd_time(names, repeat):
    import __spark_entry__ as entry

    spark = _spark()
    qs = entry.queries()
    names = names or list(qs)
    _warm(spark, entry, names)
    best: dict[str, float] = {}
    for r in range(repeat):
        for name in names:
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            el = round(time.time() - t0, 3)
            best[name] = min(best.get(name, el), el)
            print(f"[{r}] {name} {el}s", file=sys.stderr)
    print(json.dumps({"queries": best, "total": round(sum(best.values()), 2)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("-n", "--repeat", type=int, default=1)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if args.explain:
        cmd_explain(args.names, args.tag)
    elif args.profile:
        cmd_profile(args.names, args.repeat)
    else:
        cmd_time(args.names, args.repeat)


if __name__ == "__main__":
    main()
