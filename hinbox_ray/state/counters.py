"""Cluster-wide drop accounting (round-2 VERDICT #8).

Pair-generating kernels bound hot buckets with per-bucket pair caps
(pipelines/textops.py) — a recall trade that was only WARN-logged, so a
100×-scale operator had to grep worker logs to notice truncation. This
module makes the drops machine-readable: a zero-CPU named counter actor
collects (kind → dropped-pair count) increments fired from inside
map_groups/map_batches kernels, and the driver snapshots them into a
stats JSON next to the run's other outputs.

Design notes for 100 TB:
- increments happen ONLY when a bucket truncates (rare by design — caps
  exist for adversarial skew), so the single actor is nowhere near a
  throughput bottleneck and costs one fire-and-forget RPC per truncated
  bucket, not per row;
- when no accounting actor exists (the default for ad-hoc queries) the
  worker-side lookup fails once per process and the kernels fall back
  to WARN-logging only — zero overhead on the hot path;
- the actor is per-job (named, non-detached): it dies with the driver,
  so no state leaks across runs.
"""

from __future__ import annotations

import json
from contextlib import contextmanager
from typing import Callable, Dict

import ray

_NAME = "hinbox_drop_counter"
_NAMESPACE = "hinbox_ray"


@ray.remote(num_cpus=0)
class _DropCounter:
    def __init__(self):
        self._counts: Dict[str, int] = {}

    def add(self, kind: str, n: int) -> None:
        self._counts[kind] = self._counts.get(kind, 0) + int(n)

    def snapshot(self) -> Dict[str, int]:
        return dict(self._counts)

    def reset(self) -> None:
        self._counts = {}


def record_dropped_pairs(kind: str, n: int) -> None:
    """Fire-and-forget increment from a worker kernel. No-op (beyond one
    failed name lookup) when no accounting session is active. The
    handle is deliberately NOT cached per process: a cached handle to a
    previous session's killed actor would swallow increments silently,
    and truncations are rare enough that a per-drop GCS lookup is
    noise.

    The add is AWAITED (ray.get), not fire-and-forget: a kernel task
    can otherwise finish — letting the driver's ``.count()`` return and
    ``snapshot()`` run — while its increment is still in flight, so the
    stats JSON undercounts (ADVICE r3). One blocking RPC per truncated
    bucket is noise by the same rarity argument as the lookup."""
    if n <= 0:
        return
    try:
        handle = ray.get_actor(_NAME, namespace=_NAMESPACE)
        ray.get(handle.add.remote(kind, int(n)))
    except Exception:
        return


@contextmanager
def drop_accounting():
    """Driver-side session: creates the named counter, yields a
    ``snapshot() -> dict`` callable, kills the actor on exit.

    Usage::

        with drop_accounting() as snapshot:
            doc_minhash_neardup(sf).count()   # consume the Dataset
            counts = snapshot()               # {"minhash_band": 123, ...}
    """
    actor = _DropCounter.options(
        name=_NAME, namespace=_NAMESPACE, get_if_exists=True
    ).remote()
    ray.get(actor.reset.remote())

    def snapshot() -> Dict[str, int]:
        return ray.get(actor.snapshot.remote())

    try:
        yield snapshot
    finally:
        try:
            ray.kill(actor)
        except Exception:
            pass


def write_drop_stats(path: str, counts: Dict[str, int]) -> None:
    """Atomic side stats output: ``{"n_dropped_pairs": total, "by_kind":
    {...}}`` — the machine-readable recall-loss record."""
    import os

    doc = {
        "n_dropped_pairs": int(sum(counts.values())),
        "by_kind": {k: int(v) for k, v in sorted(counts.items())},
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, sort_keys=True)
    os.replace(tmp, path)
