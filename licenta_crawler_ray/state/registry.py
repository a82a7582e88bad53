"""Job registry — active-job mutual exclusion + job-id lookup (SURVEY §2.1 S3/S4).

The reference REST resource refuses to start a crawl when the domain
already has a running job (HTTP 409, ``CrawlJobResource.java:86-90``) and
serves job state by id (``GET /jobs/{id}``, ``CrawlJobResource.java:46-51``).
The rebuild's equivalent is a small JSON registry file guarded by an
``fcntl`` advisory lock: one atomic read-modify-write per acquire/release.

Single-node scope (documented): an advisory file lock coordinates processes
on one machine — the sandbox's job-submission surface. On a multi-node
deployment the same interface backs onto any linearizable store; nothing
else in the engine touches the registry.

Liveness: an entry is *active* while its recorded pid is alive and the job
has not been released. Entries whose pid died without release (crashed
driver) are reaped lazily on the next acquire, so a crash never wedges the
domain. Released entries are kept with ``"active": false`` to serve
``status --job-id`` lookups after completion.
"""

from __future__ import annotations

import fcntl
import json
import os
import threading
import time


class JobActiveError(ValueError):
    """409-equivalent admission failure (job/domain/workdir already active)."""


class JobActiveOnHost(JobActiveError):
    """A host already has an active job (``CrawlJobResource.java:86-90``)."""


class JobRegistryBase:
    """Admission semantics over ONE abstract primitive.

    Subclasses provide ``_locked(mutate)`` — execute ``mutate(data)``
    atomically against the backing store's job dict and persist the
    result — and inherit the full 409 semantics unchanged. This is the
    cluster seam COVERAGE.md documents: the single-node file/fcntl
    backend and a linearizable-KV backend differ ONLY in this primitive
    (verified by running the same admission test suite against both).
    """

    def _locked(self, mutate):
        raise NotImplementedError

    @staticmethod
    def _alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except (ProcessLookupError, PermissionError):
            return False
        except OSError:
            return False
        return True

    def _reap(self, data: dict) -> None:
        """Mark entries whose process died without release as crashed."""
        for e in data.values():
            if e.get("active") and not self._alive(int(e["pid"])):
                e["active"] = False
                e["status"] = "crashed"

    # -- API ----------------------------------------------------------------
    def acquire(self, job_id: str, hosts: list[str], workdir: str) -> None:
        """Admit a job or raise the 409-equivalent.

        Refused when (a) any requested host has an active job — the
        reference's domain exclusivity — or (b) the workdir itself is in use
        (two writers would race the checkpoint .tmp/rename commits), or (c)
        the job id is already active.
        """
        workdir = os.path.abspath(workdir)

        def mutate(data: dict):
            self._reap(data)
            cur = data.get(job_id)
            if cur and cur.get("active"):
                raise JobActiveError(f"409: job id {job_id!r} already active")
            for jid, e in data.items():
                if not e.get("active"):
                    continue
                clash = set(e.get("hosts", [])) & set(hosts)
                if clash:
                    raise JobActiveOnHost(
                        f"409: host(s) {sorted(clash)} already crawled by active job {jid!r}"
                    )
                if os.path.abspath(e.get("workdir", "")) == workdir:
                    raise JobActiveError(
                        f"409: workdir {workdir} in use by active job {jid!r}"
                    )
            data[job_id] = {
                "hosts": sorted(hosts),
                "workdir": workdir,
                "pid": os.getpid(),
                "started": time.time(),
                "active": True,
                "status": "running",
            }

        self._locked(mutate)

    def release(self, job_id: str, status: str = "done") -> None:
        def mutate(data: dict):
            e = data.get(job_id)
            if e is not None:
                e["active"] = False
                e["status"] = status
                e["finished"] = time.time()

        self._locked(mutate)

    def get(self, job_id: str) -> dict | None:
        def mutate(data: dict):
            self._reap(data)
            return data.get(job_id)

        return self._locked(mutate)

    def list(self) -> dict:
        def mutate(data: dict):
            self._reap(data)
            return dict(data)

        return self._locked(mutate)


class JobRegistry(JobRegistryBase):
    """File-backed registry (single-node backend): a JSON file guarded by
    an ``fcntl`` advisory lock; one atomic read-modify-write per call."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)

    def _locked(self, mutate):
        lock_path = self.path + ".lock"
        with open(lock_path, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                try:
                    with open(self.path) as f:
                        data = json.load(f)
                except (FileNotFoundError, json.JSONDecodeError):
                    data = {}
                out = mutate(data)
                tmp = self.path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(data, f, indent=1)
                os.replace(tmp, self.path)
                return out
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)


class LocalKVStore:
    """In-process reference implementation of the linearizable-store
    interface ``KVJobRegistry`` expects: ``transact(fn)`` runs ``fn``
    against the job dict under mutual exclusion and persists its effect.
    A real deployment backs this with etcd/Redis/DynamoDB-style
    conditional writes (read revision → mutate → compare-and-set, retry
    on conflict); the registry semantics above never change."""

    def __init__(self):
        self._data: dict = {}
        self._lock = threading.Lock()

    def transact(self, fn):
        with self._lock:
            return fn(self._data)


class KVJobRegistry(JobRegistryBase):
    """Registry over a linearizable key-value store — the multi-node
    backend shape (COVERAGE.md second-node table). Same 409 semantics as
    the file backend, inherited from :class:`JobRegistryBase`; only the
    transaction primitive differs."""

    def __init__(self, store):
        self.store = store

    def _locked(self, mutate):
        return self.store.transact(mutate)
