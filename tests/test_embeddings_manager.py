"""EmbeddingManager (A8): LRU, hit/miss split, modes, hybrid fallback.

Mirrors the reference's tests/embeddings/test_manager.py surface.
"""

from __future__ import annotations

import numpy as np
import pytest

from hinbox_ray.stages.embeddings import (
    EmbeddingManager,
    EmbeddingResult,
    EmbedTextStage,
    deterministic_provider,
    fingerprint_from_result,
    make_fingerprint,
)


def counting_provider(dim=8, model="m1"):
    calls = {"n": 0, "texts": []}

    def embed(texts):
        calls["n"] += 1
        calls["texts"].append(list(texts))
        return EmbeddingResult(
            embeddings=[[float(len(t))] * dim for t in texts],
            model=model,
            dimension=dim,
        )

    return embed, calls


# ── mode resolution (reference test_init_*) ──


def test_mode_param_beats_env(monkeypatch):
    monkeypatch.setenv("EMBEDDING_MODE", "local")
    p, _ = counting_provider()
    m = EmbeddingManager("cloud", cloud=p, local=p)
    assert m.mode == "cloud"


def test_mode_env_beats_default(monkeypatch):
    monkeypatch.setenv("EMBEDDING_MODE", "local")
    p, _ = counting_provider()
    assert EmbeddingManager(cloud=p, local=p).mode == "local"


def test_invalid_env_falls_back_to_default(monkeypatch):
    monkeypatch.setenv("EMBEDDING_MODE", "quantum")
    p, _ = counting_provider()
    assert EmbeddingManager(cloud=p).mode == "cloud"


def test_auto_resolves_on_local_availability(monkeypatch):
    monkeypatch.delenv("EMBEDDING_MODE", raising=False)
    p, _ = counting_provider()
    assert EmbeddingManager("auto", cloud=p, local=p).mode == "local"
    assert EmbeddingManager("auto", cloud=p).mode == "cloud"


def test_invalid_mode_param_raises():
    with pytest.raises(ValueError):
        EmbeddingManager("warp")


def test_missing_provider_raises():
    p, _ = counting_provider()
    with pytest.raises(ValueError, match="cloud provider"):
        EmbeddingManager("cloud", local=p).embed_batch(["x"])


# ── hit/miss split + LRU (reference test_embed_batch_*) ──


def test_batch_embeds_only_misses():
    p, calls = counting_provider()
    m = EmbeddingManager("cloud", cloud=p)
    out1 = m.embed_batch(["aa", "bbb"])
    assert calls["n"] == 1 and len(out1) == 2
    # second batch: one hit, one new miss → provider sees ONLY the miss
    out2 = m.embed_batch(["aa", "cccc"])
    assert calls["n"] == 2
    assert calls["texts"][1] == ["cccc"]
    assert out2[0] == out1[0]
    stats = m.cache_stats()
    assert stats["hits"] == 1 and stats["size"] == 3


def test_all_hits_skip_provider():
    p, calls = counting_provider()
    m = EmbeddingManager("cloud", cloud=p)
    m.embed_batch(["x", "y"])
    m.embed_batch(["y", "x"])
    assert calls["n"] == 1  # second batch fully served from cache


def test_use_cache_false_bypasses():
    p, calls = counting_provider()
    m = EmbeddingManager("cloud", cloud=p)
    m.embed_batch(["x"], use_cache=False)
    m.embed_batch(["x"], use_cache=False)
    assert calls["n"] == 2
    assert m.cache_stats()["size"] == 0


def test_lru_eviction():
    p, calls = counting_provider()
    m = EmbeddingManager("cloud", cloud=p, lru_max_items=2)
    for t in ("a", "bb", "ccc"):
        m.embed_batch([t])
    m.embed_batch(["a"])  # evicted by ccc → re-embedded
    assert calls["texts"][-1] == ["a"]


# ── hybrid fallback (reference test_embed_text_hybrid_mode_fallback) ──


def test_hybrid_falls_back_to_local_on_cloud_failure():
    def broken(texts):
        raise RuntimeError("cloud down")

    local, calls = counting_provider(model="local-m")
    m = EmbeddingManager("hybrid", cloud=broken, local=local)
    out = m.embed_batch(["hello"])
    assert calls["n"] == 1 and len(out) == 1
    # non-hybrid cloud failure propagates
    m2 = EmbeddingManager("cloud", cloud=broken)
    with pytest.raises(RuntimeError, match="cloud down"):
        m2.embed_batch(["hello"])


# ── fingerprint (reference test_make_fingerprint etc.) ──


def test_fingerprints():
    assert make_fingerprint("m", 64) == "m:64"
    assert make_fingerprint(None, 64) is None
    r = EmbeddingResult(embeddings=[[0.0] * 5], model="m")
    assert fingerprint_from_result(r) == "m:5"  # dim inferred


def test_cache_segregated_by_fingerprint():
    # same text under two models must not share cache slots
    p1, _ = counting_provider(model="m1")
    p2, c2 = counting_provider(model="m2")
    m1 = EmbeddingManager("cloud", cloud=p1)
    m1.embed_batch(["t"])
    m2 = EmbeddingManager("cloud", cloud=p2)
    m2.embed_batch(["t"])
    assert c2["n"] == 1  # m2 did not see m1's vector
    k1 = m1._key(m1._fingerprint, "t")
    k2 = m2._key(m2._fingerprint, "t")
    assert k1 != k2


def test_hybrid_fallback_does_not_poison_primary_cache():
    """ADVICE r3 (medium): after a hybrid fallback, the fallback model's
    vectors must be cached under ITS fingerprint, never the primary's,
    and a recovered primary must not serve them."""
    flaky = {"fail": True}

    def cloud(texts):
        if flaky["fail"]:
            raise RuntimeError("cloud down")
        return EmbeddingResult(
            embeddings=[[1.0, 0.0] for _ in texts], model="cloud-m", dimension=2
        )

    def local(texts):
        return EmbeddingResult(
            embeddings=[[0.0, 1.0] for _ in texts], model="local-m", dimension=2
        )

    m = EmbeddingManager("hybrid", cloud=cloud, local=local)
    v1 = m.embed_batch(["t"])[0]  # served by local fallback
    assert v1 == [0.0, 1.0]
    assert m._fingerprint == "local-m:2"
    assert m._lookup("local-m:2", "t") == [0.0, 1.0]
    assert m._lookup("cloud-m:2", "t") is None  # not filed under primary
    # primary recovers: a NEW text embeds via cloud and files under cloud's fp
    flaky["fail"] = False
    v2 = m.embed_batch(["u"])[0]
    assert v2 == [1.0, 0.0]
    assert m._fingerprint == "cloud-m:2"
    assert m._lookup("cloud-m:2", "u") == [1.0, 0.0]
    # and the old text, looked up under the now-current cloud namespace,
    # misses → re-embeds via cloud rather than serving the local vector
    v3 = m.embed_batch(["t"])[0]
    assert v3 == [1.0, 0.0]


# ── the Ray stage ──


def test_embed_stage_in_pipeline(ray_session):
    import ray.data as rd

    from hinbox_ray.functions.hashing import ngram_embedding

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = ds.map_batches(
        EmbedTextStage,
        fn_constructor_kwargs={"dim": 32},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
        num_cpus=1,
    ).to_pandas()
    assert len(out) == ds.count()
    assert all(len(v) == 32 for v in out["embedding"])
    # deterministic: equals the pure function
    row = out.iloc[0]
    src = ds.to_pandas().set_index("doc_id").loc[row["doc_id"], "text"]
    np.testing.assert_allclose(
        np.asarray(row["embedding"]),
        ngram_embedding(src, dim=32),
        rtol=1e-6,
    )


def test_embed_stage_empty_batch_keeps_fixed_size_list_type():
    """ADVICE r3: an empty batch must emit the SAME Arrow type
    (fixed_size_list<float32, dim>) as a non-empty one, or schema
    unification breaks when an empty block lands mid-pipeline."""
    import pyarrow as pa

    stage = EmbedTextStage(text_col="text", dim=8)
    empty = stage(pa.table({"text": pa.array([], type=pa.string())}))
    full = stage(pa.table({"text": ["hello"]}))
    assert empty.schema.field("embedding").type == full.schema.field(
        "embedding"
    ).type
    assert full.schema.field("embedding").type == pa.list_(pa.float32(), 8)


def test_embed_stage_dedupes_within_actor():
    import pyarrow as pa

    stage = EmbedTextStage.__new__(EmbedTextStage)
    p, calls = counting_provider(dim=4)
    stage.text_col = "text"
    stage.manager = EmbeddingManager("cloud", cloud=p)
    batch = pa.table({"text": ["same", "same", "other"]})
    out = stage(batch)
    assert out.num_rows == 3
    # the duplicate text hit the per-actor LRU on its second occurrence
    assert sum(len(t) for t in calls["texts"]) == 2
