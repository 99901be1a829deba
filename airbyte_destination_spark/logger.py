"""Airbyte-protocol NDJSON logger (O21 parity).

The reference emits every message as one NDJSON line on stdout and
buffers up to 10,000 RECORD messages before flushing
(/root/reference/internal/airbyte/logger.go:9,37-101). Our engine logs
the control-plane messages the same way; data-plane metrics go to the
lineage rows in the table snapshot instead of log replay.
"""

from __future__ import annotations

import json
import sys
from typing import Any, TextIO

MAX_BUFFERED_RECORDS = 10_000  # logger.go:9


class AirbyteLogger:
    def __init__(self, out: TextIO | None = None):
        self.out = out or sys.stdout
        self._records: list[dict] = []

    def _emit(self, obj: dict) -> None:
        self.out.write(json.dumps(obj) + "\n")
        self.out.flush()

    def log(self, level: str, message: str) -> None:
        self._emit({"type": "LOG", "log": {"level": level, "message": message}})

    def spec(self, spec_obj: dict) -> None:
        self._emit({"type": "SPEC", "spec": spec_obj})

    def connection_status(self, status: str, message: str = "") -> None:
        self._emit(
            {
                "type": "CONNECTION_STATUS",
                "connectionStatus": {"status": status, "message": message},
            }
        )

    def state(self, state_blob: Any) -> None:
        if isinstance(state_blob, str):
            self.out.write(state_blob + "\n")
            self.out.flush()
        else:
            self._emit({"type": "STATE", "state": state_blob})

    def record(self, stream: str, data: dict, emitted_at: int, namespace: str = "") -> None:
        """Buffered record emission (flushes at MAX_BUFFERED_RECORDS,
        logger.go:62-75)."""
        self._records.append(
            {
                "type": "RECORD",
                "record": {
                    "stream": stream,
                    "namespace": namespace,
                    "emitted_at": emitted_at,
                    "data": data,
                },
            }
        )
        if len(self._records) >= MAX_BUFFERED_RECORDS:
            self.flush()

    def flush(self) -> None:
        for r in self._records:
            self._emit(r)
        self._records.clear()
