"""Model-string → provider target / client-factory routing (A2 surface).

Mirrors the reference's explicit routing layer
(/root/reference/src/utils/provider_routing.py:83-190: prefix parse →
``ProviderTarget`` with sdk / base-url / api-key resolution, env-var
requirements per provider) and its env-overridable model defaults
(/root/reference/src/constants.py:7-50). Re-expressed as a declarative
registry instead of an if-chain, with a second registry mapping provider
prefixes to CLIENT FACTORIES so a resolved model string can directly
construct a ``ClientExtractor`` actor pool
(``extractor_kwargs={"client_factory": client_factory_for(model)}``).

No provider SDK exists in this container, so the built-in factories are
the deterministic test double (prefix ``test``) and a clearly-erroring
placeholder for real providers; registering a real SDK-backed factory is
one ``register_client_factory`` call and changes no pipeline code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

# ---------------------------------------------------------------------------
# Defaults + env overrides (reference constants.py:7-15)

GEMINI_OPENAI_BASE_URL = (
    "https://generativelanguage.googleapis.com/v1beta/openai/"
)
JINA_OPENAI_BASE_URL = "https://api.jina.ai/v1"
OPENROUTER_BASE_URL = "https://openrouter.ai/api/v1"


def cloud_model() -> str:
    return os.getenv("HINBOX_CLOUD_MODEL", "gemini/gemini-2.0-flash")


def local_model() -> str:
    return os.getenv(
        "HINBOX_OLLAMA_MODEL", "ollama/qwen2.5:32b-instruct-q5_K_M"
    )


def ollama_api_url() -> str:
    return os.getenv("OLLAMA_API_URL", "http://localhost:11434/v1").strip()


@dataclass(frozen=True)
class ProviderTarget:
    """Resolved target: which SDK, which endpoint, which key
    (reference provider_routing.py:23-48)."""

    sdk: str                      # "openai" | "anthropic"
    provider_label: str
    api_model: str
    base_url: Optional[str] = None
    api_key: Optional[str] = None
    is_local: bool = False


def split_model_prefix(model: str) -> Tuple[str, str]:
    """``"prefix/model-name"`` → ``(prefix, model-name)``; bare strings
    route to openai (reference :56-64)."""
    if "/" in model:
        prefix, _, rest = model.partition("/")
        return prefix.lower(), rest
    return "openai", model


def _require_env(var_name: str, provider_label: str) -> str:
    value = os.environ.get(var_name, "").strip()
    if not value:
        raise RuntimeError(
            f"Missing environment variable {var_name} required for "
            f"{provider_label} provider."
        )
    return value


# Declarative routing tables: prefix → spec. ``key_env`` is REQUIRED at
# resolve time (missing env raises, reference :66-75); ``api_key`` is a
# literal; neither set → the SDK reads its own default env var.
_CHAT_ROUTES: Dict[str, Dict[str, Any]] = {
    "gemini": {
        "sdk": "openai",
        "base_url": GEMINI_OPENAI_BASE_URL,
        "key_env": "GEMINI_API_KEY",
    },
    "openai": {"sdk": "openai"},
    "anthropic": {"sdk": "anthropic"},
    "ollama": {
        "sdk": "openai",
        "base_url_fn": ollama_api_url,
        "api_key": "ollama",
        "is_local": True,
    },
    "openrouter": {
        "sdk": "openai",
        "base_url": OPENROUTER_BASE_URL,
        "key_env": "OPENROUTER_API_KEY",
    },
}

_EMBED_ROUTES: Dict[str, Dict[str, Any]] = {
    "jina_ai": {
        "sdk": "openai",
        "base_url": JINA_OPENAI_BASE_URL,
        "key_env": "JINA_API_KEY",
    },
    "openai": {"sdk": "openai"},
    "gemini": {
        "sdk": "openai",
        "base_url": GEMINI_OPENAI_BASE_URL,
        "key_env": "GEMINI_API_KEY",
    },
}


def _resolve(routes: Dict[str, Dict[str, Any]], model: str) -> ProviderTarget:
    prefix, api_model = split_model_prefix(model)
    spec = routes.get(prefix)
    if spec is None:
        # unknown prefix → openai-compatible passthrough (reference :141-146)
        return ProviderTarget(
            sdk="openai", provider_label=prefix, api_model=api_model
        )
    base_url = spec.get("base_url")
    if "base_url_fn" in spec:
        base_url = spec["base_url_fn"]()
    api_key = spec.get("api_key")
    if "key_env" in spec:
        api_key = _require_env(spec["key_env"], prefix)
    return ProviderTarget(
        sdk=spec["sdk"],
        provider_label=prefix,
        api_model=api_model,
        base_url=base_url,
        api_key=api_key,
        is_local=bool(spec.get("is_local", False)),
    )


def resolve_chat_target(model: str) -> ProviderTarget:
    """Chat-completion routing (reference :83-146)."""
    return _resolve(_CHAT_ROUTES, model)


def resolve_embedding_target(model: str) -> ProviderTarget:
    """Embedding routing (reference :149-190)."""
    return _resolve(_EMBED_ROUTES, model)


# ---------------------------------------------------------------------------
# Client-factory registry: prefix → () -> client callable. This is the
# piece the Ray engine adds on top of the reference's routing: the
# resolved target picks a FACTORY, and the factory is what
# ClientExtractor's __init__ calls once per actor.

ClientFactory = Callable[[], Callable[..., Any]]

_CLIENT_FACTORIES: Dict[str, ClientFactory] = {}


def register_client_factory(prefix: str, factory: ClientFactory) -> None:
    """Install (or override) the client factory for a provider prefix."""
    _CLIENT_FACTORIES[prefix.lower()] = factory


def _unavailable_factory(prefix: str) -> ClientFactory:
    def factory() -> Callable[..., Any]:
        raise RuntimeError(
            f"No client factory registered for provider '{prefix}' "
            "(no provider SDK in this environment); call "
            "register_client_factory() with an SDK-backed factory."
        )

    return factory


def openai_sdk_client_factory(model: str) -> ClientFactory:
    """A real public-SDK chat client behind the routing seam — closes
    the reference capability gap (its working provider clients,
    src/utils/provider_routing.py:83-190 + src/utils/llm.py cloud
    generation). Everything is lazy: the ``openai`` package is imported
    and the target resolved (key env vars checked) only when an ACTOR
    constructs its client in ``ClientExtractor.__init__`` — importing
    or routing never needs a network, a key, or the SDK installed.

    Structured output uses the SDK's parse endpoint
    (``beta.chat.completions.parse``); ``list[Model]`` response models
    are wrapped in a one-field container model (OpenAI's response_format
    requires an object schema) and unwrapped on return, matching the
    client protocol of ``stages/llm_client.structured_generate``.
    API-level failures raise through to its retry/recovery ladder
    unchanged."""

    def factory() -> Callable[..., Any]:
        import importlib

        openai_mod = importlib.import_module("openai")
        target = resolve_chat_target(model)
        kwargs: Dict[str, Any] = {}
        if target.base_url:
            kwargs["base_url"] = target.base_url
        if target.api_key:
            kwargs["api_key"] = target.api_key
        client = openai_mod.OpenAI(**kwargs)

        def call(messages, *, response_model, mode, temperature):
            from typing import List as _List
            from typing import get_args, get_origin

            from pydantic import create_model

            item = None
            if get_origin(response_model) is list:
                args = get_args(response_model)
                if args:
                    item = args[0]
            fmt = (
                create_model("ItemList", items=(_List[item], ...))
                if item is not None
                else response_model
            )
            completion = client.beta.chat.completions.parse(
                model=target.api_model,
                messages=list(messages),
                temperature=temperature,
                response_format=fmt,
            )
            parsed = completion.choices[0].message.parsed
            return list(parsed.items) if item is not None else parsed

        return call

    return factory


def client_factory_for(model: str) -> ClientFactory:
    """Model string → client factory, by provider prefix. Precedence:
    explicitly registered factories win; any prefix that routes to the
    openai-compatible SDK (gemini / openai / ollama / openrouter /
    unknown-passthrough — the same consolidation the reference performs)
    gets the lazy SDK-backed factory; the rest (anthropic, absent an
    installed SDK) get a clearly-erroring placeholder. Resolution is
    lazy throughout — routing never needs a network or an SDK."""
    prefix, _ = split_model_prefix(model)
    if prefix in _CLIENT_FACTORIES:
        return _CLIENT_FACTORIES[prefix]
    spec = _CHAT_ROUTES.get(prefix)
    if spec is None or spec.get("sdk") == "openai":
        return openai_sdk_client_factory(model)
    return _unavailable_factory(prefix)


def _test_factory() -> Callable[..., Any]:
    from .llm_client import gazetteer_client_factory

    return gazetteer_client_factory()


# the deterministic double ships registered: model "test/gazetteer"
# builds a working extractor out of the box (integration tests + the
# kg_triples_client query use the same double).
register_client_factory("test", _test_factory)


def extractor_kwargs_for_model(model: str) -> Dict[str, Any]:
    """Convenience: ``build_kg(extractor_cls=ClientExtractor,
    extractor_kwargs=extractor_kwargs_for_model("test/gazetteer"))``."""
    return {"client_factory": client_factory_for(model)}
