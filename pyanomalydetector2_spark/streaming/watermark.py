"""Updates/watermark ledger — the re-expression of the reference's
``*_updates`` tables (models/updates.py:10-28: one row per increment,
``get_endep``/``get_startep`` drive the next incremental window).

Tiny driver-side state (one record per table), atomically committed; on a
real cluster this is a metastore/Iceberg-properties entry.
"""

from __future__ import annotations

import json
import os
import time


class WatermarkLedger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def get(self) -> dict | None:
        """Latest watermark {startep, endep, enddt} or None."""
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            recs = [json.loads(line) for line in f if line.strip()]
        return recs[-1] if recs else None

    def get_endep(self) -> int | None:
        w = self.get()
        return w["endep"] if w else None

    def get_startep(self) -> int | None:
        w = self.get()
        return w["startep"] if w else None

    def upsert(self, startep: int, endep: int) -> None:
        rec = {
            "startep": int(startep),
            "endep": int(endep),
            "enddt": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(endep)),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def truncate(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)
