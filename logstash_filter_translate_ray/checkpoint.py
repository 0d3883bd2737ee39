"""Per-partition checkpoint manifests for idempotent resume.

North_rule: "every partition records lineage + metrics to a checkpoint
store so the streaming-executed job resumes idempotently". Design
(SURVEY §4 'Checkpoint / resume'):

- A *shard* is an input partition (one or more input parquet files).
- Each shard's output goes to its own directory, written atomically
  (tmp dir → ``os.replace`` rename), so a crashed run leaves either a
  complete shard or a removable ``.tmp``.
- After a shard's sink commit, a JSON manifest records lineage (input
  files), metrics (row counts, per-route counts) and the output files.
- Resume = skip shards whose manifest exists; aggregates are recomputed
  from manifests (never double-counted — the manifest is the unit of
  exactly-once accounting over at-least-once task retries).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass, field
from typing import Optional


@dataclass
class ShardManifest:
    shard_id: str
    input_files: list[str]
    output_dir: str
    rows_in: int
    rows_out: int
    route_counts: dict[str, int] = field(default_factory=dict)
    matched_counts: dict[str, int] = field(default_factory=dict)
    extra: dict = field(default_factory=dict)


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _path(self, shard_id: str) -> str:
        return os.path.join(self.manifest_dir, f"{shard_id}.json")

    def is_done(self, shard_id: str) -> bool:
        return os.path.exists(self._path(shard_id))

    def load(self, shard_id: str) -> Optional[ShardManifest]:
        p = self._path(shard_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return ShardManifest(**json.load(f))

    def load_all(self) -> list[ShardManifest]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(ShardManifest(**json.load(f)))
        return out

    def commit(self, manifest: ShardManifest) -> None:
        """Write the manifest atomically (tmp → rename)."""
        p = self._path(manifest.shard_id)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(manifest), f, indent=1)
        os.replace(tmp, p)

    def shard_output_dir(self, shard_id: str) -> str:
        return os.path.join(self.root, f"shard={shard_id}")

    def begin_shard(self, shard_id: str) -> str:
        """Return a tmp output dir for the shard (cleared if left over)."""
        tmp = self.shard_output_dir(shard_id) + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        return tmp

    def finish_shard(self, shard_id: str) -> str:
        """Atomically promote the shard tmp dir to final."""
        final = self.shard_output_dir(shard_id)
        tmp = final + ".tmp"
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        return final
