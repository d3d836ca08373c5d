"""Per-partition checkpoint manifest with lineage (north rule).

Layout under an output root:

    out/
      _lineage.json              # manifest: one entry per finished partition
      shard=0003/ *.parquet      # atomically renamed from shard=0003.tmp/

A partition's entry records its input fingerprint and row/byte counts;
``resume plan = all shards - finished shards with matching fingerprint``.
A killed `ray job submit` run re-submitted with the same args therefore
skips every completed shard and reprocesses nothing (BASELINE.md
resumability target).  Writes are atomic: data lands in `<dir>.tmp`,
then a single `os.rename`; the manifest is rewritten via tmp+rename too,
after each shard, so a crash between shards loses at most in-flight work.
"""
from __future__ import annotations

import json
import os
import shutil
import time


class LineageManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_lineage.json")
        os.makedirs(out_dir, exist_ok=True)
        self.entries: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.entries = json.load(f).get("partitions", {})

    def is_done(self, shard_id: str, fingerprint: str) -> bool:
        e = self.entries.get(shard_id)
        return bool(e) and e.get("fingerprint") == fingerprint and e.get("complete")

    def shard_dir(self, shard_id: str) -> str:
        return os.path.join(self.out_dir, f"shard={shard_id}")

    def begin(self, shard_id: str, fingerprint: str | None = None) -> str:
        """Return the tmp dir to write into; cleans any stale attempt.

        A shard dir whose manifest entry is complete but whose
        fingerprint differs from `fingerprint` (re-run with changed
        parameters) is stale output — remove it too, or the commit's
        rename onto the existing dir fails."""
        tmp = self.shard_dir(shard_id) + ".tmp"
        entry = self.entries.get(shard_id, {})
        stale = (not entry.get("complete")
                 or (fingerprint is not None
                     and entry.get("fingerprint") != fingerprint))
        for p in (tmp, self.shard_dir(shard_id)):
            if os.path.exists(p) and stale:
                shutil.rmtree(p)
        if stale and entry:
            self.entries.pop(shard_id, None)
            self._flush()
        os.makedirs(tmp, exist_ok=True)
        return tmp

    def commit(
        self, shard_id: str, fingerprint: str, rows: int, metrics: dict | None = None
    ) -> None:
        tmp = self.shard_dir(shard_id) + ".tmp"
        final = self.shard_dir(shard_id)
        os.rename(tmp, final)
        self.entries[shard_id] = {
            "fingerprint": fingerprint,
            "rows": rows,
            "complete": True,
            "completed_at": time.time(),
            "metrics": metrics or {},
        }
        self._flush()

    def _flush(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": 1, "partitions": self.entries}, f, indent=1)
        os.replace(tmp, self.path)
