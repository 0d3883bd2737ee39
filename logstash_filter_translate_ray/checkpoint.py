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
- Durability: the manifest is fsync'd before the rename and the directory
  fsync'd after, so a power loss can't leave a renamed-but-empty manifest
  (ext4 delayed allocation); a manifest that is nonetheless unreadable or
  truncated is treated as ABSENT (the shard re-runs — at-least-once work,
  never silent data loss) rather than wedging every subsequent resume.
"""

from __future__ import annotations

import json
import logging
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
        # existence is not enough: a crashed/corrupt manifest must count
        # as NOT done so the shard re-runs instead of silently dropping
        return self.load(shard_id) is not None

    def _read(self, path: str) -> Optional[ShardManifest]:
        try:
            with open(path) as f:
                return ShardManifest(**json.load(f))
        except (json.JSONDecodeError, TypeError, ValueError, OSError) as e:
            logging.getLogger(__name__).warning(
                "checkpoint manifest %s unreadable (%s: %s) — treating the "
                "shard as not done; it will re-run", path,
                type(e).__name__, e)
            return None

    def load(self, shard_id: str) -> Optional[ShardManifest]:
        p = self._path(shard_id)
        if not os.path.exists(p):
            return None
        return self._read(p)

    def load_all(self) -> list[ShardManifest]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json") and not name.endswith(".tmp"):
                m = self._read(os.path.join(self.manifest_dir, name))
                if m is not None:
                    out.append(m)
        return out

    def commit(self, manifest: ShardManifest) -> None:
        """Write the manifest atomically AND durably (write → fsync →
        rename → dir fsync): without the fsyncs a power loss can promote
        an empty file past the rename barrier."""
        p = self._path(manifest.shard_id)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(manifest), f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)
        try:
            dfd = os.open(self.manifest_dir, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass    # directory fsync unsupported on some filesystems

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
