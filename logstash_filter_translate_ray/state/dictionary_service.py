"""DictionaryService — a named Ray actor owning the live dictionary state.

Replaces the reference's scheduler-thread + ReentrantReadWriteLock design
(translate.rb:259-261 scheduler.interval { reload_dictionary };
dictionary/file.rb:38,81-100 write-locked merge/replace) with the
Ray-idiomatic equivalent:

- ONE named detached-scope actor holds ``(version, snapshot)``; every
  successful (re)load produces a fresh immutable
  :class:`~logstash_filter_translate_ray.kernel.DictSnapshot` and bumps the
  version — no locks anywhere.
- Translate workers (actor-pool ``TranslateFn``) poll ``version_if_newer``
  at batch boundaries: one tiny actor RPC per batch; the full snapshot is
  shipped only when the version actually changed (the common case is a
  16-byte "no change" reply, so refresh checking is off the hot path —
  mirroring "minimise impact on throughput", docs/index.asciidoc:73-80).
- TTL refresh: the actor lazily reloads when ``refresh_interval`` elapsed
  at check time (overlap-free by actor serialization, like
  ``scheduler.interval(..., overlap: false)``), and mtime-gates the file
  read for short intervals exactly as dictionary/file.rb:104-114.
- First-load errors raise at actor construction (pipeline startup), refresh
  errors keep the old dictionary (S13).

At 100 TB scale the snapshot (≤100k keys, docs/index.asciidoc:76-77) is tiny
relative to data; each translate actor holds its own copy, pulled once per
version change, not per batch.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Optional

import ray

from ..dictionary import FileDictionary, MemoryDictionary
from ..kernel import DictSnapshot


@ray.remote(num_cpus=0)
class DictionaryService:
    """Versioned dictionary snapshot holder with TTL refresh.

    Refresh fires two ways, both serialized by ``_reload_lock``:

    - lazily at worker polls (the hot path — a no-op comparison most calls);
    - from a daemon ``threading.Timer`` chain mirroring the reference's
      wall-clock ``scheduler.interval { reload_dictionary }``
      (translate.rb:259-261): an IDLE pipeline still reloads on schedule.
      ``overlap: false`` parity comes from the lock; a refresh error in the
      timer keeps the old dictionary (S13) and the chain alive.
    """

    def __init__(self, path: Optional[str] = None,
                 mapping: Optional[dict[str, Any]] = None,
                 refresh_interval: float = 300,
                 refresh_behaviour: str = "merge",
                 yaml_code_point_limit: Optional[int] = None,
                 yaml_load_strategy: str = "one_shot",
                 background_refresh: bool = True,
                 missing_file_ok: bool = False):
        if path is not None:
            self._backend: "FileDictionary | MemoryDictionary" = FileDictionary(
                path, refresh_interval=refresh_interval,
                refresh_behaviour=refresh_behaviour,
                yaml_code_point_limit=yaml_code_point_limit,
                yaml_load_strategy=yaml_load_strategy,
                missing_file_ok=missing_file_ok)
        else:
            self._backend = MemoryDictionary(mapping or {})
        self._refresh_interval = refresh_interval
        self._last_check = time.monotonic()
        self._reload_lock = threading.Lock()
        self._timer: Optional[threading.Timer] = None
        if background_refresh and refresh_interval > 0 and path is not None:
            self._schedule_tick()

    def _schedule_tick(self) -> None:
        t = threading.Timer(self._refresh_interval, self._tick)
        t.daemon = True           # dies with the (detached) actor process
        t.start()
        self._timer = t

    def _tick(self) -> None:
        try:
            with self._reload_lock:
                try:
                    self._backend.reload()
                except Exception:
                    pass          # S13: refresh failure keeps the old dict
                self._last_check = time.monotonic()
        finally:
            self._schedule_tick()

    def _maybe_refresh(self) -> None:
        if self._refresh_interval <= 0:          # translate.rb:259 "interval of zero makes no sense"
            return
        now = time.monotonic()
        if now - self._last_check >= self._refresh_interval:
            with self._reload_lock:
                # re-check under the lock: a poll racing the timer tick
                # (which just reloaded and advanced _last_check) must not
                # pay a second full reload
                if time.monotonic() - self._last_check \
                        < self._refresh_interval:
                    return
                self._last_check = time.monotonic()
                self._backend.reload()

    # -- worker API --------------------------------------------------------

    def version_if_newer(self, known_version: int) -> Optional[int]:
        """Cheap per-batch poll: None when the worker is current."""
        self._maybe_refresh()
        v = self._backend.version
        return v if v != known_version else None

    def get_snapshot(self) -> DictSnapshot:
        self._maybe_refresh()
        return self._backend.snapshot

    # -- control API (tests / scheduler) -----------------------------------

    def refresh(self, force: bool = False) -> int:
        """Explicit reload (the scheduler tick); returns the current version."""
        with self._reload_lock:
            self._backend.reload(force=force)
            self._last_check = time.monotonic()
        return self._backend.version

    def version(self) -> int:
        return self._backend.version


def get_or_create_dictionary_service(name: str, **kwargs) -> "ray.actor.ActorHandle":
    """Named-actor get-or-create so every pipeline stage shares one service.

    ``lifetime="detached"``: the service may be (re)created from inside a
    pool worker's ``__init__`` (whichever caller wins the get-or-create
    race); a non-detached actor would die with that worker when its pool
    scales down, killing the dictionary for every other stage. Detached
    actors live until the Ray session ends (or an explicit ``ray.kill``).
    """
    # explicit namespace: a detached actor in the session's anonymous
    # namespace triggers a per-creation Ray warning and cannot be found by
    # other jobs; a fixed namespace makes get-or-create deterministic
    return DictionaryService.options(
        name=name, namespace="lftr-dictionaries", get_if_exists=True,
        lifetime="detached").remote(**kwargs)
