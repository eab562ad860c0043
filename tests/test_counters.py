"""Machine-readable drop accounting (round-2 VERDICT #8)."""

from __future__ import annotations

import json
import os

import ray

from hinbox_ray.state.counters import (
    drop_accounting,
    record_dropped_pairs,
    write_drop_stats,
)

SF = "/root/testdata/sf0.001"


def test_counter_collects_from_driver_and_workers(ray_session):
    @ray.remote
    def worker_drop():
        from hinbox_ray.state.counters import record_dropped_pairs as rec

        rec("remote_kind", 7)
        return True

    with drop_accounting() as snapshot:
        record_dropped_pairs("local_kind", 3)
        record_dropped_pairs("local_kind", 2)
        assert ray.get(worker_drop.remote())
        import time

        # fire-and-forget increments: poll briefly for arrival
        for _ in range(50):
            counts = snapshot()
            if counts.get("remote_kind") == 7 and counts.get("local_kind") == 5:
                break
            time.sleep(0.1)
    assert counts == {"local_kind": 5, "remote_kind": 7}


def test_noop_without_session(ray_session):
    # no accounting actor: must not raise, must not create one
    record_dropped_pairs("orphan", 1)
    with drop_accounting() as snapshot:
        assert snapshot().get("orphan") is None


def test_minhash_cap_drops_recorded_and_written(ray_session, tmp_path, monkeypatch):
    """Force a tiny pair cap: the minhash path records its truncation in
    the counter and the stats JSON carries n_dropped_pairs."""
    import hinbox_ray.pipelines.textops as T

    monkeypatch.setattr(T, "_PAIR_CAP", 1)
    with drop_accounting() as snapshot:
        out = T.doc_minhash_neardup(SF).to_pandas()
        counts = snapshot()
    assert counts.get("minhash_band", 0) > 0
    path = str(tmp_path / "drop_stats.json")
    write_drop_stats(path, counts)
    with open(path) as f:
        doc = json.load(f)
    assert doc["n_dropped_pairs"] == sum(counts.values())
    assert doc["by_kind"]["minhash_band"] == counts["minhash_band"]
    assert not os.path.exists(path + ".tmp")
    assert len(out) >= 0  # query still returns
