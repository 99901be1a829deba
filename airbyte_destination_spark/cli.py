"""CLI parity surface: spec / check / write (the reference's cobra
commands, /root/reference/cmd/{spec,check,write}.go).

    python -m airbyte_destination_spark.cli spec
    python -m airbyte_destination_spark.cli check --config cfg.json
    python -m airbyte_destination_spark.cli write --config cfg.json \
        --catalog catalog.json [input.ndjson]   (default: stdin)

Output is Airbyte-style NDJSON messages on stdout
(/root/reference/internal/airbyte/logger.go): SPEC / CONNECTION_STATUS /
echoed STATE lines.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def _emit(obj: dict) -> None:
    sys.stdout.write(json.dumps(obj) + "\n")
    sys.stdout.flush()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="airbyte-destination-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("spec")
    pc = sub.add_parser("check")
    pc.add_argument("--config", required=True)
    pw = sub.add_parser("write")
    pw.add_argument("--config", required=True)
    pw.add_argument("--catalog", required=True)
    pw.add_argument("input", nargs="?", default="-")
    # maintenance surface (beyond the reference's cobra commands): the
    # operational verbs a lake table needs, driven from cron/airflow
    pm = sub.add_parser("maintain")
    pm.add_argument("--table", required=True, help="table root directory")
    pm.add_argument(
        "action",
        choices=["compact", "purge-tombstones", "bloom", "analyze",
                 "expire", "describe"],
    )
    pm.add_argument("--min-files", type=int, default=2)
    pm.add_argument("--cluster-by", help="comma-separated columns")
    pm.add_argument("--cluster", choices=["range", "zorder"], default="range")
    pm.add_argument("--max-records-per-file", type=int)
    pm.add_argument("--fpp", type=float, default=0.01)
    pm.add_argument("--keep-last", type=int, default=100)
    args = p.parse_args(argv)

    from airbyte_destination_spark.destination import Destination, check, spec
    from airbyte_destination_spark import protocol as P

    if args.cmd == "spec":
        _emit({"type": "SPEC", "spec": spec()})
        return 0

    from airbyte_destination_spark.session import get_spark

    if args.cmd == "check":
        try:
            config = P.Config.from_path(args.config)
        except Exception as e:  # bad config -> FAILED status, not a crash
            _emit(
                {
                    "type": "CONNECTION_STATUS",
                    "connectionStatus": {"status": "FAILED", "message": str(e)},
                }
            )
            return 0
        ok, msg = check(get_spark("check"), config)
        _emit(
            {
                "type": "CONNECTION_STATUS",
                "connectionStatus": {"status": "SUCCEEDED" if ok else "FAILED", "message": msg},
            }
        )
        return 0

    if args.cmd == "maintain":
        from airbyte_destination_spark.lake import LakeTable

        t = LakeTable(args.table)
        if args.action == "describe":
            _emit({"type": "LOG", "log": {"level": "INFO",
                                          "message": json.dumps(t.describe())}})
            return 0
        if args.action == "expire":
            out = t.expire_snapshots(keep_last=args.keep_last)
            _emit({"type": "LOG", "log": {"level": "INFO",
                                          "message": json.dumps(out)}})
            return 0
        spark = get_spark("maintain")
        if args.action == "compact":
            cluster_by = args.cluster_by.split(",") if args.cluster_by else None
            v = t.compact(
                spark, min_files=args.min_files, cluster_by=cluster_by,
                cluster=args.cluster,
                max_records_per_file=args.max_records_per_file,
            )
            msg = {"compacted_version": v}
        elif args.action == "purge-tombstones":
            msg = {"purged_version": t.purge_tombstones(spark)}
        elif args.action == "bloom":
            msg = {"blooms_built": t.build_bloom_index(spark, fpp=args.fpp)}
        else:  # analyze
            msg = t.analyze(spark)
        _emit({"type": "LOG", "log": {"level": "INFO", "message": json.dumps(msg)}})
        return 0

    # write — failure matrix parity (destination_test.go:93-224): bad
    # config / bad catalog emit an ERROR log line and a nonzero exit,
    # never a traceback
    try:
        config = P.Config.from_path(args.config)
    except Exception as e:  # noqa: BLE001
        _emit(
            {
                "type": "LOG",
                "log": {"level": "ERROR", "message": f"Configuration is invalid: {e}"},
            }
        )
        return 1
    try:
        catalog = P.ConfiguredCatalog.from_path(args.catalog)
    except Exception as e:  # noqa: BLE001
        _emit(
            {
                "type": "LOG",
                "log": {"level": "ERROR", "message": f"Configured catalog is invalid: {e}"},
            }
        )
        return 1
    spark = get_spark("write")
    if args.input == "-":
        # spool stdin so Spark can parallel-scan it (the reference reads
        # stdin serially, destination.go:393; we land it once, then scan)
        with tempfile.NamedTemporaryFile("w", suffix=".ndjson", delete=False) as f:
            for line in sys.stdin:
                f.write(line)
            path = f.name
    else:
        path = args.input
    # state echo streams line-by-line (destination.go:417-420) — a
    # state-heavy sync never buffers every STATE blob in the driver
    result = Destination(spark, config).write(
        catalog, path, on_state=lambda line: sys.stdout.write(line + "\n")
    )
    _emit({"type": "LOG", "log": {"level": "INFO", "message": f"wrote {result.tables}"}})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
