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
        """Latest watermark {startep, endep, enddt} or None. A torn trailing
        line (crash mid-write under a pre-fix ledger) is skipped, not
        fatal — the last COMMITTED record wins."""
        if not os.path.exists(self.path):
            return None
        recs = []
        with open(self.path) as f:
            for line in f:
                if not line.strip():
                    continue
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    continue  # torn partial write — ignore
        return recs[-1] if recs else None

    def get_endep(self) -> int | None:
        w = self.get()
        return w["endep"] if w else None

    def get_startep(self) -> int | None:
        w = self.get()
        return w["startep"] if w else None

    def upsert(self, startep: int, endep: int) -> None:
        """Atomic commit (write-temp + rename, like CheckpointLedger): a
        crash mid-write can never leave a torn current record — the
        previous file survives intact until os.replace."""
        rec = {
            "startep": int(startep),
            "endep": int(endep),
            "enddt": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(endep)),
        }
        history = ""
        if os.path.exists(self.path):
            with open(self.path) as f:
                history = f.read()
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            f.write(history + json.dumps(rec) + "\n")
        os.replace(tmp, self.path)

    def truncate(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)
