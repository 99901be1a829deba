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
