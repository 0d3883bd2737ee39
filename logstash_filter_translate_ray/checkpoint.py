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

import glob
import json
import logging
import os
import shutil
from dataclasses import asdict, dataclass, field
from typing import Optional


def _fsync_dir(path: str) -> None:
    try:
        dfd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass        # directory fsync unsupported on some filesystems


def _fsync_tree(d: str) -> None:
    """fsync every regular file and directory under ``d`` — shard DATA
    must be durable before the manifest certifies it (ext4 delayed
    allocation can otherwise persist the fsync'd manifest but lose the
    unfsync'd parquet it points at, and resume would then skip the shard
    forever: silent data loss)."""
    for root, _dirs, files in os.walk(d):
        for fn in files:
            try:
                fd = os.open(os.path.join(root, fn), os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
            except OSError:
                pass
        _fsync_dir(root)


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _tmp_pid(path: str) -> Optional[int]:
    """PID embedded in a '<base>.<pid>.tmp' path; None for the legacy
    pid-less '.tmp' form."""
    parts = path.split(".")
    if len(parts) >= 3 and parts[-1] == "tmp" and parts[-2].isdigit():
        return int(parts[-2])
    return None


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
        # a readable manifest is not enough: it must still point at REAL
        # output (an operator deleting only the shard dir, or data lost
        # in a crash window, must re-run the shard — never silently drop
        # its rows from every future aggregate)
        m = self.load(shard_id)
        if m is None:
            return False
        if m.rows_out > 0 and m.output_dir and not os.path.isdir(
                m.output_dir):
            logging.getLogger(__name__).warning(
                "manifest for shard %s exists but its output dir %s is "
                "missing — treating the shard as not done; it will re-run",
                shard_id, m.output_dir)
            return False
        return True

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
            if name.endswith(".tmp"):
                # crashed-commit litter: remove once its writer is gone
                # (a live pid is mid-commit — leave its tmp alone)
                pid = _tmp_pid(name)
                if pid is None or not _pid_alive(pid):
                    try:
                        os.unlink(os.path.join(self.manifest_dir, name))
                    except OSError:
                        pass
                continue
            if name.endswith(".json"):
                m = self._read(os.path.join(self.manifest_dir, name))
                if m is not None:
                    out.append(m)
        return out

    def commit(self, manifest: ShardManifest) -> None:
        """Write the manifest atomically AND durably (write → fsync →
        rename → dir fsync): without the fsyncs a power loss can promote
        an empty file past the rename barrier. The tmp name carries this
        process's pid so two overlapping runs can't truncate each
        other's in-flight commit."""
        p = self._path(manifest.shard_id)
        tmp = f"{p}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(manifest), f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)
        _fsync_dir(self.manifest_dir)

    def shard_output_dir(self, shard_id: str) -> str:
        return os.path.join(self.root, f"shard={shard_id}")

    def _shard_tmp(self, shard_id: str) -> str:
        # pid-suffixed so overlapping runs never write into (or rmtree)
        # each other's in-progress dir
        return f"{self.shard_output_dir(shard_id)}.{os.getpid()}.tmp"

    def begin_shard(self, shard_id: str) -> str:
        """Return a tmp output dir for the shard. Stale tmp dirs (ours,
        legacy pid-less, or from DEAD processes) are cleared; a tmp dir
        owned by a LIVE other process means two runs share this
        checkpoint root — fail loudly instead of corrupting each other's
        in-progress shard output."""
        final = self.shard_output_dir(shard_id)
        for stale in glob.glob(final + ".*.tmp") + [final + ".tmp"]:
            if not os.path.exists(stale):
                continue
            pid = _tmp_pid(stale)
            if pid is not None and pid != os.getpid() and _pid_alive(pid):
                raise RuntimeError(
                    f"shard {shard_id!r} is being written by live process "
                    f"{pid} ({stale}) — two runs share checkpoint root "
                    f"{self.root!r}; wait for it or use a separate root")
            shutil.rmtree(stale, ignore_errors=True)
        tmp = self._shard_tmp(shard_id)
        os.makedirs(tmp, exist_ok=True)
        return tmp

    def finish_shard(self, shard_id: str) -> str:
        """Atomically AND durably promote the shard tmp dir to final:
        the data files fsync BEFORE the rename (a durable manifest must
        never certify unflushed parquet) and the parent dir fsyncs after
        (the rename itself survives power loss)."""
        final = self.shard_output_dir(shard_id)
        tmp = self._shard_tmp(shard_id)
        _fsync_tree(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        _fsync_dir(self.root)
        return final
