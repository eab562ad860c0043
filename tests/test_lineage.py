"""Resume / lineage tests: partial runs resume without duplicating work."""

import json
import os
import shutil

import pytest

from hinbox_ray.sources.pages import write_pages_parquet

N = 160
SHARDS = 4


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    write_pages_parquet(str(d), n=N, num_shards=SHARDS)
    return str(d)


def _triples(out_dir):
    import pyarrow.parquet as pq

    tdir = os.path.join(out_dir, "triples")
    files = [os.path.join(tdir, f) for f in os.listdir(tdir) if f.endswith(".parquet")]
    import pyarrow as pa

    t = pa.concat_tables([pq.read_table(f) for f in files])
    return sorted(
        zip(
            t.column("subj").to_pylist(),
            t.column("pred").to_pylist(),
            t.column("obj").to_pylist(),
        )
    )


def test_full_run_writes_manifests_and_triples(ray_session, corpus, tmp_path):
    from hinbox_ray.state.lineage import (
        load_manifests,
        resolve_from_checkpoint,
        run_extract_with_resume,
    )

    out = str(tmp_path / "run")
    manifests = run_extract_with_resume(corpus, out, concurrency=2, batch_size=64)
    assert len(manifests) == SHARDS
    for rec in manifests.values():
        assert rec["n_docs"] > 0
        assert os.path.isdir(rec["mentions_dir"])
        assert rec["url_min"].startswith("https://")
    res = resolve_from_checkpoint(out, num_partitions=4)
    assert res.triples.count() > 0
    assert os.path.isdir(os.path.join(out, "triples"))
    # manifests reload identically
    assert load_manifests(out).keys() == manifests.keys()


def test_resume_skips_done_and_matches_fresh_run(ray_session, corpus, tmp_path):
    from hinbox_ray.state.lineage import (
        load_manifests,
        resolve_from_checkpoint,
        run_extract_with_resume,
    )

    fresh = str(tmp_path / "fresh")
    run_extract_with_resume(corpus, fresh, concurrency=2, batch_size=64)
    resolve_from_checkpoint(fresh, num_partitions=4)
    expected = _triples(fresh)

    # simulate a crash after 2 of 4 partitions: copy manifests + mentions
    # of the first two, then resume
    part = str(tmp_path / "partial")
    os.makedirs(os.path.join(part, "_lineage"))
    os.makedirs(os.path.join(part, "mentions"))
    done = sorted(load_manifests(fresh))[:2]
    for stem in done:
        rec = json.load(open(os.path.join(fresh, "_lineage", f"{stem}.json")))
        dst_mentions = os.path.join(part, "mentions", f"part-{stem}")
        shutil.copytree(rec["mentions_dir"], dst_mentions)
        rec["mentions_dir"] = dst_mentions
        with open(os.path.join(part, "_lineage", f"{stem}.json"), "w") as f:
            json.dump(rec, f)
    # leave a stale tmp dir (simulated mid-write crash) — must be ignored
    os.makedirs(os.path.join(part, "mentions", "part-zzz.tmp"))

    manifests = run_extract_with_resume(corpus, part, concurrency=2, batch_size=64)
    assert len(manifests) == SHARDS
    resolve_from_checkpoint(part, num_partitions=4)
    assert _triples(part) == expected


def test_rerun_is_noop_when_complete(ray_session, corpus, tmp_path):
    from hinbox_ray.state.lineage import run_extract_with_resume

    out = str(tmp_path / "run2")
    first = run_extract_with_resume(corpus, out, concurrency=2, batch_size=64)
    mtimes = {
        stem: os.path.getmtime(os.path.join(out, "_lineage", f"{stem}.json"))
        for stem in first
    }
    second = run_extract_with_resume(corpus, out, concurrency=2, batch_size=64)
    assert second.keys() == first.keys()
    for stem in first:
        assert (
            os.path.getmtime(os.path.join(out, "_lineage", f"{stem}.json"))
            == mtimes[stem]
        )
