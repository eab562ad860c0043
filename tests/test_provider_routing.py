"""Provider routing registry (A2 surface, reference provider_routing.py)."""

from __future__ import annotations

import pytest

from hinbox_ray.stages.provider_routing import (
    ProviderTarget,
    client_factory_for,
    cloud_model,
    extractor_kwargs_for_model,
    local_model,
    ollama_api_url,
    register_client_factory,
    resolve_chat_target,
    resolve_embedding_target,
    split_model_prefix,
)


def test_split_prefix_and_bare_default():
    assert split_model_prefix("gemini/gemini-2.0-flash") == (
        "gemini", "gemini-2.0-flash",
    )
    assert split_model_prefix("GEMINI/x") == ("gemini", "x")  # case-folded
    assert split_model_prefix("gpt-4o") == ("openai", "gpt-4o")


def test_chat_routing_table(monkeypatch):
    monkeypatch.setenv("GEMINI_API_KEY", "k1")
    t = resolve_chat_target("gemini/gemini-2.0-flash")
    assert t == ProviderTarget(
        sdk="openai",
        provider_label="gemini",
        api_model="gemini-2.0-flash",
        base_url="https://generativelanguage.googleapis.com/v1beta/openai/",
        api_key="k1",
    )
    assert resolve_chat_target("anthropic/claude-x").sdk == "anthropic"
    # openai/anthropic: the SDK reads its own key env → api_key None
    assert resolve_chat_target("openai/gpt-4o").api_key is None
    ol = resolve_chat_target("ollama/qwen")
    assert ol.is_local and ol.api_key == "ollama"
    assert ol.base_url == ollama_api_url()


def test_missing_provider_key_raises(monkeypatch):
    monkeypatch.delenv("OPENROUTER_API_KEY", raising=False)
    with pytest.raises(RuntimeError, match="OPENROUTER_API_KEY"):
        resolve_chat_target("openrouter/some-model")


def test_unknown_prefix_passthrough():
    t = resolve_chat_target("mystery/model-z")
    assert (t.sdk, t.provider_label, t.api_model) == (
        "openai", "mystery", "model-z",
    )
    assert t.base_url is None


def test_embedding_routing(monkeypatch):
    monkeypatch.setenv("JINA_API_KEY", "jk")
    t = resolve_embedding_target("jina_ai/jina-embeddings-v3")
    assert t.base_url == "https://api.jina.ai/v1" and t.api_key == "jk"
    assert resolve_embedding_target("openai/te3").base_url is None


def test_env_overrides_for_default_models(monkeypatch):
    monkeypatch.setenv("HINBOX_CLOUD_MODEL", "openai/gpt-4o-mini")
    monkeypatch.setenv("HINBOX_OLLAMA_MODEL", "ollama/llama3")
    monkeypatch.setenv("OLLAMA_API_URL", " http://other:1234/v1 ")
    assert cloud_model() == "openai/gpt-4o-mini"
    assert local_model() == "ollama/llama3"
    assert ollama_api_url() == "http://other:1234/v1"  # stripped


def test_factory_precedence_registered_beats_placeholder():
    marker = object()

    def fac():
        return marker

    register_client_factory("gemini", fac)
    try:
        assert client_factory_for("gemini/x")() is marker
    finally:
        from hinbox_ray.stages import provider_routing as pr

        del pr._CLIENT_FACTORIES["gemini"]
    # unregistered real provider: factory resolves but CALLING it errors
    f = client_factory_for("gemini/x")
    with pytest.raises(RuntimeError, match="No client factory registered"):
        f()


def test_builtin_test_double_builds_working_extractor():
    from hinbox_ray.stages.llm_client import ClientExtractor

    kw = extractor_kwargs_for_model("test/gazetteer")
    ext = ClientExtractor(**kw, sleep=lambda s: None)
    ents = ext._extract_doc_with_qc(
        "Carol Rosenberg visited Guantanamo Bay."
    )
    assert {e["name"] for e in ents} == {"Carol Rosenberg", "Guantanamo Bay"}
