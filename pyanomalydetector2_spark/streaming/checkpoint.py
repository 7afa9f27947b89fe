"""Per-partition run ledger: (run_id, bucket, snapshot_id, status, metrics).

The re-imagining of the reference's watermark tables
(models/updates.py:10-28: upsert endep/startep after each increment) at
partition granularity, FIXTURES.md §B4: reruns resume from the last committed
state — committed buckets are pruned from the scan, results are idempotent.

Ledger state is tiny (one row per bucket per run) and commit must be atomic
and cheap, so it lives as JSON-lines on the driver-visible filesystem (on a
real cluster: an Iceberg ledger table updated with MERGE, or the metastore).
Atomicity via write-tmp + rename, one file per (run_id, bucket) so concurrent
batch commits never collide.
"""

from __future__ import annotations

import json
import os
import re
import time

# run_id is embedded in ledger FILENAMES: restrict it so an id containing
# '__bucket=' cannot alias another run's entries and a path separator
# cannot escape the ledger directory
_RUN_ID_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,127}$")


class CheckpointLedger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _f(self, run_id: str, bucket: int) -> str:
        if not _RUN_ID_RE.match(run_id):
            raise ValueError(
                f"invalid run_id {run_id!r}: must match {_RUN_ID_RE.pattern}"
            )
        return os.path.join(self.path, f"{run_id}__bucket={bucket}.json")

    def mark_committed(
        self,
        run_id: str,
        bucket: int,
        snapshot_id: int | None = None,
        metrics: dict | None = None,
    ) -> None:
        rec = {
            "run_id": run_id,
            "bucket": int(bucket),
            "snapshot_id": snapshot_id,
            "status": "committed",
            "metrics": metrics or {},
            "updated": time.time(),
        }
        tmp = self._f(run_id, bucket) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())  # rename-durability: data must hit disk
        os.replace(tmp, self._f(run_id, bucket))

    def committed_buckets(self, run_id: str) -> list[int]:
        out = []
        prefix = f"{run_id}__bucket="
        for name in os.listdir(self.path):
            if name.startswith(prefix) and name.endswith(".json"):
                suffix = name[len(prefix):-5]
                if suffix.isdigit():  # another run's aliased name → not ours
                    out.append(int(suffix))
        return sorted(out)

    def metrics(self, run_id: str, bucket: int) -> dict | None:
        p = self._f(run_id, bucket)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def reset(self, run_id: str) -> None:
        for b in self.committed_buckets(run_id):
            os.remove(self._f(run_id, b))
