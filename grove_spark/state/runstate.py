"""Run-state / checkpoint lineage (SURVEY §2.6 T1-T5).

The reference persists per-connector state in a KV cache keyed
``(state_kind, <connector>.<md5(identity)>[.<operation>])``
(cache_key(), grove/connectors/__init__.py:573-588; kinds in
grove/constants.py:7-16: pointer, pointer_next, pointer_previous,
window_start, window_end, last, seen). Its known weakness: outputs are
written BEFORE the pointer commit (:443-445 comment), so a crash between
the two duplicates a page (at-least-once).

This module does better with a transactional manifest, the local-mode
stand-in for an Iceberg snapshot commit (production: the same protocol
rides Iceberg's atomic snapshot + summary properties):

* each run writes data files under ``part-<run_id>/`` inside the sink
  root, then atomically publishes a manifest (``os.replace``) recording
  {run_id, committed data paths, new pointer, seen-hashes, per-partition
  metrics}. Readers/resumers only see manifested runs -> a crash between
  data write and manifest publish leaves an orphan directory, not a
  duplicate: exactly-once effect on resume, beating the reference.
* per-partition processed/failed metrics ride ``df.observe()``
  (the `_saved` telemetry, :144-148) and land in the same manifest —
  checkpoint lineage per partition.

Pure batch-side Python on the driver; no executor state.
"""

from __future__ import annotations

import contextlib
import hashlib
import json
import os
import tempfile
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

try:  # POSIX-only; the manifest os.replace is still atomic without it
    import fcntl
except ImportError:  # pragma: no cover
    fcntl = None  # type: ignore[assignment]


class ConcurrentCommitError(RuntimeError):
    """Another run committed between read and write (optimistic-lock
    conflict — the analog of the reference's ConcurrencyException)."""


def reference(connector: str, identity: str, operation: str = "all") -> str:
    """State key — parity with ConnectorConfig.reference()
    (grove/models.py:126-150): connector '.' md5(identity) ['.' operation]."""
    ident_md5 = hashlib.md5(identity.encode()).hexdigest()
    key = f"{connector}.{ident_md5}"
    if operation and operation != "all":
        key = f"{key}.{operation}"
    return key


@dataclass
class Manifest:
    run_id: str
    committed: Dict[str, Any] = field(default_factory=dict)  # key -> state
    history: list = field(default_factory=list)


class RunState:
    """Manifest-backed run state over a directory.

    Layout: ``<root>/_state.json`` is the single atomically-replaced
    source of truth; each entry per state key carries pointer,
    previous_pointer, last_run, seen hashes and the last run's metrics +
    data paths (lineage).
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, "_state.json")
        self._lock_path = os.path.join(root, "_state.lock")

    @contextlib.contextmanager
    def _exclusive(self):
        """Exclusive advisory lock across load -> replace, so two local
        committers cannot both read version N and silently lose one
        update (the reference's execution lock, grove/connectors/
        __init__.py:1067-1173, held only for the commit instant; the
        production analog is Iceberg's atomic swap on the catalog)."""
        if fcntl is None:  # pragma: no cover
            yield
            return
        with open(self._lock_path, "a+") as lk:
            fcntl.flock(lk.fileno(), fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lk.fileno(), fcntl.LOCK_UN)

    # -- reads ---------------------------------------------------------------

    def _load(self) -> dict:
        if not os.path.exists(self._path):
            return {"entries": {}, "history": [], "version": 0}
        with open(self._path) as f:
            state = json.load(f)
        state.setdefault("version", 0)
        return state

    def version(self) -> int:
        """Snapshot version for optimistic concurrency (the Spark-era
        replacement for the reference's expiring execution lock,
        grove/connectors/__init__.py:1067-1173: instead of locking up
        front, a commit fails if another run committed in between —
        Iceberg's optimistic snapshot-commit model)."""
        return self._load()["version"]

    def get(self, key: str) -> dict | None:
        return self._load()["entries"].get(key)

    def pointer(self, key: str) -> Optional[str]:
        e = self.get(key)
        return e.get("pointer") if e else None

    def seen_hashes(self, key: str) -> Dict[str, list]:
        e = self.get(key)
        return (e or {}).get("seen", {})

    def last_run(self, key: str) -> Optional[float]:
        e = self.get(key)
        return e.get("last_run") if e else None

    def due(self, key: str, frequency_s: float, now: float | None = None) -> bool:
        """Scheduling check (reference due(), grove/connectors/__init__.py:160-200)."""
        last = self.last_run(key)
        now = time.time() if now is None else now
        return last is None or (now - last) >= frequency_s

    # -- commits ---------------------------------------------------------------

    def new_run_id(self) -> str:
        return uuid.uuid4().hex[:16]

    def commit(
        self,
        key: str,
        run_id: str,
        pointer: Optional[str] = None,
        seen: Optional[Dict[str, list]] = None,
        metrics: Optional[dict] = None,
        data_paths: Optional[list] = None,
        now: float | None = None,
        expected_version: Optional[int] = None,
    ) -> None:
        """Atomically publish a run: data paths + pointer + dedup state +
        metrics in ONE manifest replace. The Iceberg analog is one
        snapshot commit carrying summary properties.

        With ``expected_version`` the commit is conditional: it raises
        ConcurrentCommitError if another run committed since that
        version was read — the reference's ConcurrencyException outcome
        (tests/test_connectors_lock.py). The version check and the
        manifest replace happen under one exclusive file lock, so the
        check cannot be raced by another local committer."""
        self.commit_many(
            [
                {
                    "key": key,
                    "pointer": pointer,
                    "seen": seen,
                    "metrics": metrics,
                    "data_paths": data_paths,
                }
            ],
            run_id,
            now=now,
            expected_version=expected_version,
        )

    def commit_many(
        self,
        updates: List[dict],
        run_id: str,
        now: float | None = None,
        expected_version: Optional[int] = None,
    ) -> None:
        """Atomically publish ONE run covering many state keys (the fleet
        tick): every connector's pointer + seen + metrics land in a single
        manifest replace — all-or-nothing, exactly like one Iceberg
        snapshot commit carrying the whole batch."""
        with self._exclusive():
            state = self._load()
            if expected_version is not None and state["version"] != expected_version:
                raise ConcurrentCommitError(
                    f"state moved from v{expected_version} to v{state['version']}"
                )
            state["version"] += 1
            for u in updates:
                key = u["key"]
                prev = state["entries"].get(key, {})
                pointer = u.get("pointer")
                seen = u.get("seen")
                state["entries"][key] = {
                    "pointer": pointer if pointer is not None else prev.get("pointer"),
                    "previous_pointer": prev.get("pointer"),
                    "last_run": time.time() if now is None else now,
                    "seen": seen if seen is not None else prev.get("seen", {}),
                    "run_id": run_id,
                }
                state["history"].append(
                    {
                        "run_id": run_id,
                        "key": key,
                        "pointer": pointer,
                        "metrics": u.get("metrics") or {},
                        "data_paths": u.get("data_paths") or [],
                    }
                )
            fd, tmp = tempfile.mkstemp(dir=self.root, prefix="._state-")
            with os.fdopen(fd, "w") as f:
                json.dump(state, f)
            os.replace(tmp, self._path)  # the atomic "snapshot commit"

    def expire_runs(
        self,
        keep_last: int = 100,
        delete_orphans_under: Optional[str] = None,
        dry_run: bool = False,
    ) -> dict:
        """Retention — the Iceberg ``expire_snapshots`` analog.

        Trims history to the newest ``keep_last`` records per state key
        (entries/pointers are untouched — resume state never expires) and
        deletes the DATA directories referenced ONLY by expired records.
        With ``delete_orphans_under`` it also removes ``part-*`` dirs in
        that root that no manifested run ever referenced (the residue of
        crashed runs — invisible to readers, but they hold disk).

        Runs under the commit lock so a concurrent committer can't
        publish between the read and the rewrite. Returns
        {expired_records, deleted_dirs, orphans_deleted}."""
        import shutil

        with self._exclusive():
            state = self._load()
            per_key: Dict[str, list] = {}
            for i, h in enumerate(state["history"]):
                per_key.setdefault(h["key"], []).append(i)
            keep_idx = set()
            for idxs in per_key.values():
                keep_idx.update(idxs[-keep_last:])
            keep = [h for i, h in enumerate(state["history"]) if i in keep_idx]
            expired = [h for i, h in enumerate(state["history"]) if i not in keep_idx]
            kept_paths = {p for h in keep for p in h["data_paths"]}
            dead_paths = {
                p for h in expired for p in h["data_paths"] if p not in kept_paths
            }
            orphans = set()
            if delete_orphans_under:
                import glob as _glob

                all_referenced = {
                    p for h in state["history"] for p in h["data_paths"]
                }
                orphans = {
                    d
                    for d in _glob.glob(os.path.join(delete_orphans_under, "part-*"))
                    if d not in all_referenced
                }
            if not dry_run:
                for p in sorted(dead_paths | orphans):
                    shutil.rmtree(p, ignore_errors=True)
                state["history"] = keep
                state["version"] += 1
                fd, tmp = tempfile.mkstemp(dir=self.root, prefix="._state-")
                with os.fdopen(fd, "w") as f:
                    json.dump(state, f)
                os.replace(tmp, self._path)
        return {
            "expired_records": len(expired),
            "deleted_dirs": sorted(dead_paths),
            "orphans_deleted": sorted(orphans),
        }

    def committed_paths(self) -> list:
        """Every data path any manifested run published — what a reader
        may consume. Orphan part-dirs from crashed runs are invisible."""
        out: list = []
        for h in self._load()["history"]:
            for p in h["data_paths"]:
                if p not in out:  # fleet runs share one dir across connectors
                    out.append(p)
        return out

    def is_committed(self, run_id: str) -> bool:
        return any(h["run_id"] == run_id for h in self._load()["history"])
