"""Structured-generation core + model-backed extractor seam (reference
A1/A2/M16/M17).

The reference's whole value is configurable LLM extraction behind a
hardened structured-output layer
(/root/reference/src/utils/llm.py:271-556). This module reimplements
that layer's CONTROL FLOW — provider-agnostic, no network — so a real
client (or a test double) plugs into the same recovery semantics its
tests pin (reference tests/test_llm_multiple_tool_calls.py):

- parallel-tools mode for ``List[Model]`` response shapes, with the
  "NoneType is not iterable" → TOOLS-mode fallback (llm.py:333-366);
- "multiple tool calls" recovery ladder: strategy 0 parses the
  error's ``last_completion`` tool calls directly (llm.py:198-248),
  strategy 1 retries non-parallel with temperature=0, strategy 2
  falls back to JSON mode with the "Return exactly one JSON response."
  system suffix (llm.py:369-475);
- retryable-error backoff (503 / 529 / overloaded / rate limit /
  "try again"): MAX_RETRIES=3, base 2.0 s exponential + jitter
  (llm.py:477-500, constants src/constants.py:21-22) — the sleeper and
  jitter source are injectable so tests run instantly;
- envelope unwrap (M16, src/utils/profiles.py:11-37) and
  pydantic→dict normalization (M17,
  src/engine/article_processor.py:380-402).

``ClientExtractor`` is the Ray actor-pool extractor built on this
core: it subclasses ``MentionExtractor`` overriding ONLY
``_run_extraction`` (so the QC-retry ladder, within-doc collapse, and
batch interface are inherited) and adds the reference's
mention-validation gate — a hallucinated entity whose surface never
occurs in the article is dropped (quality_controls.py:323-425 via
``functions.qc.filter_entities_by_mention``).

Client protocol: ``client(messages, *, response_model, mode,
temperature)`` where mode ∈ {"parallel_tools", "tools", "json"};
raising an exception with a ``last_completion`` attribute mirrors
Instructor's multiple-tool-calls failure shape.
"""

from __future__ import annotations

import json
import random
import time
from typing import Any, Callable, Dict, List, Optional, get_args, get_origin

from pydantic import BaseModel, Field

from ..config import DomainConfig
from ..functions.names import normalize_display
from .mentions import MentionExtractor

MAX_RETRIES = 3     # reference: src/constants.py:21
BASE_DELAY = 2.0    # reference: src/constants.py:22

_RETRYABLE_MARKERS = ("503", "529", "overloaded", "rate limit", "try again")


class ExtractedEntity(BaseModel):
    """Provider-facing entity shape (the reference's dynamic per-domain
    models collapsed to the shared field set,
    src/dynamic_models.py:13-292)."""

    name: str = ""
    title: str = ""           # events use title (reference key shape)
    entity_type: str = ""
    type: str = ""
    start_date: str = ""
    end_date: str = ""
    event_type: str = ""
    description: str = ""
    aliases: List[str] = Field(default_factory=list)


def _list_item_model(response_model: Any) -> Optional[type]:
    if get_origin(response_model) is list:
        args = get_args(response_model)
        if args and isinstance(args[0], type) and issubclass(args[0], BaseModel):
            return args[0]
    return None


def recover_multiple_tool_calls(error: Exception, response_model: Any):
    """Strategy 0 (reference llm.py:198-248): parse each tool call in the
    error's ``last_completion`` as one ``List[Model]`` item. Returns None
    when inapplicable (non-list model, no completion, ≤1 call, missing
    arguments)."""
    completion = getattr(error, "last_completion", None)
    if completion is None:
        return None
    choices = getattr(completion, "choices", None)
    if not choices:
        return None
    message = getattr(choices[0], "message", None)
    if message is None:
        return None
    tool_calls = getattr(message, "tool_calls", None) or []
    if len(tool_calls) <= 1:
        return None
    item_model = _list_item_model(response_model)
    if item_model is None:
        return None
    recovered = []
    for call in tool_calls:
        fn = getattr(call, "function", None)
        args_payload = getattr(fn, "arguments", None)
        if args_payload is None:
            return None
        if isinstance(args_payload, str):
            payload = json.loads(args_payload)
        elif isinstance(args_payload, dict):
            payload = args_payload
        else:
            return None
        recovered.append(item_model.model_validate(payload, strict=False))
    return recovered


def unwrap_envelope(resp: Any) -> Optional[Dict[str, Any]]:
    """M16 (reference src/utils/profiles.py:11-37): accept either a plain
    payload dict or a ``{choices: [{message: {parsed: ...}}]}`` API
    envelope; None when nothing extractable."""
    if not resp:
        return None
    if isinstance(resp, dict):
        if "text" in resp:
            return resp
        choices = resp.get("choices")
        if choices:
            message = choices[0].get("message", {})
            if "parsed" in message:
                return message["parsed"]
    return None


def to_plain_dicts(items: Any) -> List[Dict[str, Any]]:
    """M17 (reference article_processor.convert_pydantic_to_dict):
    normalize a mixed list of dicts / pydantic models / junk to dicts."""
    results: List[Dict[str, Any]] = []
    for item in items or []:
        if item is None:
            continue
        if isinstance(item, dict):
            results.append(item)
        elif hasattr(item, "model_dump"):
            try:
                results.append(item.model_dump())
            except Exception:
                try:
                    results.append(item.dict())
                except Exception:
                    pass
        elif hasattr(item, "dict"):
            try:
                results.append(item.dict())
            except Exception:
                pass
    return results


def structured_generate(
    client: Callable[..., Any],
    messages: List[Dict[str, str]],
    response_model: Any,
    *,
    temperature: float = 0.0,
    max_retries: int = MAX_RETRIES,
    base_delay: float = BASE_DELAY,
    sleep: Callable[[float], None] = time.sleep,
    rand: Callable[[], float] = random.random,
) -> Any:
    """The reference's ``_structured_generation`` control flow
    (llm.py:271-500) over an injectable client."""
    item_model = _list_item_model(response_model)
    use_parallel = item_model is not None
    mode = "parallel_tools" if use_parallel else "tools"

    for attempt in range(max_retries + 1):
        try:
            resp = client(
                messages,
                response_model=response_model,
                mode=mode,
                temperature=temperature,
            )
            return list(resp) if use_parallel else resp
        except Exception as e:
            err = str(e)
            tools_mode_after_parallel_failure = False

            # parallel-tools responses with no tool calls → TOOLS mode
            if (
                use_parallel
                and "nonetype" in err.lower()
                and "not iterable" in err.lower()
            ):
                try:
                    return client(
                        messages,
                        response_model=response_model,
                        mode="tools",
                        temperature=temperature,
                    )
                except Exception as fe:
                    e, err = fe, str(fe)
                    tools_mode_after_parallel_failure = True

            if "multiple tool calls" in err.lower():
                # strategy 0: direct recovery from last_completion
                try:
                    recovered = recover_multiple_tool_calls(e, response_model)
                    if recovered is not None:
                        return recovered
                except Exception:
                    pass
                # strategy 1: deterministic non-parallel retry
                try:
                    mode1 = (
                        "tools" if tools_mode_after_parallel_failure else mode
                    )
                    resp = client(
                        messages,
                        response_model=response_model,
                        mode=mode1,
                        temperature=0,
                    )
                    return (
                        list(resp)
                        if use_parallel and mode1 == "parallel_tools"
                        else resp
                    )
                except Exception:
                    pass
                # strategy 2: JSON-mode fallback, modified system prompt
                try:
                    mm = [dict(m) for m in messages]
                    if mm and mm[0].get("role") == "system":
                        mm[0]["content"] += (
                            "\n\nIMPORTANT: Return exactly one JSON response."
                        )
                    return client(
                        mm,
                        response_model=response_model,
                        mode="json",
                        temperature=0,
                    )
                except Exception:
                    pass

            retryable = any(t in err.lower() for t in _RETRYABLE_MARKERS)
            if retryable and attempt < max_retries:
                sleep(base_delay * (2 ** attempt) + rand())
                continue
            raise


_SYSTEM_PROMPT = (
    "Extract every person, organization, location and event mentioned in "
    "the article as structured entities."
)


class ClientExtractor(MentionExtractor):
    """Actor-pool extractor backed by a structured-output client.

    ``client_factory`` is called once per actor in ``__init__`` —
    exactly where the reference builds its SDK client — and
    ``_run_extraction`` routes each doc through ``structured_generate``,
    the M16/M17 normalizers, and the mention-validation gate. The
    QC-retry ladder, within-doc variant collapse, and the batch
    interface are inherited from ``MentionExtractor``; the repair hint
    is appended to the system prompt on retry (reference
    article_processor semantics).
    """

    def __init__(
        self,
        client_factory: Callable[[], Callable[..., Any]],
        cfg: Optional[DomainConfig] = None,
        qc_retry: bool = True,
        system_prompt: str = _SYSTEM_PROMPT,
        sleep: Callable[[float], None] = time.sleep,
    ):
        super().__init__(cfg, qc_retry)
        self.client = client_factory()
        self.system_prompt = system_prompt
        self._sleep = sleep

    def _run_extraction(
        self, text: str, repair_hint: Optional[str] = None
    ) -> List[Dict[str, Any]]:
        from ..functions.qc import filter_entities_by_mention

        sys_prompt = self.system_prompt
        if repair_hint:
            sys_prompt = f"{sys_prompt}\n\n{repair_hint}"
        messages = [
            {"role": "system", "content": sys_prompt},
            {"role": "user", "content": text},
        ]
        raw = structured_generate(
            self.client,
            messages,
            List[ExtractedEntity],
            sleep=self._sleep,
        )
        items = to_plain_dicts(raw if isinstance(raw, list) else [raw])
        self._last_raw_count = len(items)

        # group by type for the mention-validation gate (F4/F5)
        by_type: Dict[str, List[Dict[str, Any]]] = {}
        for d in items:
            etype = str(d.get("entity_type", "") or "")
            if etype not in ("people", "organizations", "locations", "events"):
                continue
            by_type.setdefault(etype, []).append(d)

        ents: List[Dict[str, Any]] = []
        for etype, group in by_type.items():
            kept, _report = filter_entities_by_mention(
                group,
                text,
                entity_type=etype,
                equivalence_groups=self.cfg.groups_for(etype),
            )
            name_field = "title" if etype == "events" else "name"
            for d in kept:
                name = normalize_display(str(d.get(name_field, "") or ""))
                if not name:
                    continue
                ents.append(
                    {
                        "entity_type": etype,
                        "name": name,
                        "attr_type": str(d.get("type", "") or ""),
                        # event attributes stay empty on non-event types
                        # even if the model populated them, matching the
                        # deterministic extractor's shape and the
                        # reference's per-domain models (ADVICE r2)
                        "start_date": str(d.get("start_date", "") or "")
                        if etype == "events"
                        else "",
                        "end_date": str(d.get("end_date", "") or "")
                        if etype == "events"
                        else "",
                        "event_type": str(d.get("event_type", "") or "")
                        if etype == "events"
                        else "",
                        "description": str(d.get("description", "") or ""),
                        "aliases": [a for a in (d.get("aliases") or []) if a],
                        "n_mentions": 1,
                    }
                )
        return self._collapse_variants(ents)


def gazetteer_client_factory() -> Callable[..., Any]:
    """Network-free structured-output 'model' for the A1/A2 seam: wraps
    the deterministic lexicon scan behind the client interface (one
    ``ExtractedEntity`` per distinct entity in the message text, event
    dates read off the text like the scanner's date-suffix capture) and
    adds one hallucinated entity that the mention-validation gate (F4)
    must drop. ``build_kg(extractor_cls=ClientExtractor,
    extractor_kwargs={"client_factory": gazetteer_client_factory})``
    must reproduce the deterministic extractor's graph exactly — the
    integration proof that the model seam composes end-to-end
    (reference swaps models the same way via provider routing,
    src/utils/llm.py cloud/local generation)."""
    from .mentions import MentionExtractor

    scan = MentionExtractor(qc_retry=False)

    def client(messages, *, response_model, mode, temperature):
        text = messages[-1]["content"]
        out = []
        for d in scan._extract_doc(text):
            kw = {
                "entity_type": d["entity_type"],
                "type": d["attr_type"],
                "end_date": d["end_date"],
                "event_type": d["event_type"],
                "description": d["description"],
                "aliases": list(d["aliases"]),
            }
            if d["entity_type"] == "events":
                kw["title"] = d["name"]
                kw["start_date"] = d["start_date"]
            else:
                kw["name"] = d["name"]
            out.append(ExtractedEntity(**kw))
        out.append(
            ExtractedEntity(name="Zebulon Hallucination", entity_type="people")
        )
        return iter(out) if mode == "parallel_tools" else out

    return client
