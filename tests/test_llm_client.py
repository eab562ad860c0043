"""Structured-generation core recovery ladder + client-backed extractor
(reference A1/A2/M16/M17; behaviors pinned by the reference's
tests/test_llm_multiple_tool_calls.py)."""

from __future__ import annotations

import json
from types import SimpleNamespace
from typing import List

import pytest

from hinbox_ray.stages.llm_client import (
    ClientExtractor,
    ExtractedEntity,
    recover_multiple_tool_calls,
    structured_generate,
    to_plain_dicts,
    unwrap_envelope,
)


def _multi_tool_calls_error(payloads):
    tool_calls = [
        SimpleNamespace(function=SimpleNamespace(arguments=json.dumps(p)))
        for p in payloads
    ]
    completion = SimpleNamespace(
        choices=[SimpleNamespace(message=SimpleNamespace(tool_calls=tool_calls))]
    )
    err = RuntimeError(
        "Instructor does not support multiple tool calls, use List[Model] instead"
    )
    err.last_completion = completion
    return err


PAYLOADS = [
    {"name": "Alice", "entity_type": "people", "type": "detainee"},
    {"name": "Bob", "entity_type": "people", "type": "military"},
]


def test_recover_multiple_tool_calls_for_list_model():
    rec = recover_multiple_tool_calls(
        _multi_tool_calls_error(PAYLOADS), List[ExtractedEntity]
    )
    assert rec is not None and len(rec) == 2
    assert all(isinstance(r, ExtractedEntity) for r in rec)
    assert [r.name for r in rec] == ["Alice", "Bob"]


def test_recover_inapplicable_shapes():
    # ≤1 tool call → None
    assert (
        recover_multiple_tool_calls(
            _multi_tool_calls_error(PAYLOADS[:1]), List[ExtractedEntity]
        )
        is None
    )
    # non-list response model → None
    assert (
        recover_multiple_tool_calls(
            _multi_tool_calls_error(PAYLOADS), ExtractedEntity
        )
        is None
    )
    # no last_completion → None
    assert (
        recover_multiple_tool_calls(RuntimeError("multiple tool calls"), List[ExtractedEntity])
        is None
    )


def test_direct_recovery_before_retrying():
    """Strategy 0 recovers without a second client call."""
    calls = []

    def client(messages, *, response_model, mode, temperature):
        calls.append(mode)
        raise _multi_tool_calls_error(PAYLOADS)

    out = structured_generate(client, [], List[ExtractedEntity], sleep=lambda s: None)
    assert [o.name for o in out] == ["Alice", "Bob"]
    assert calls == ["parallel_tools"]  # one attempt, recovered directly


def test_parallel_tools_mode_for_list_models_and_scalar_tools():
    modes = []

    def client(messages, *, response_model, mode, temperature):
        modes.append(mode)
        if mode == "parallel_tools":
            return iter([ExtractedEntity(name="X", entity_type="people")])
        return ExtractedEntity(name="Y", entity_type="people")

    out = structured_generate(client, [], List[ExtractedEntity])
    assert isinstance(out, list) and out[0].name == "X"
    out2 = structured_generate(client, [], ExtractedEntity)
    assert out2.name == "Y"
    assert modes == ["parallel_tools", "tools"]


def test_parallel_none_type_falls_back_to_tools_mode():
    modes = []

    def client(messages, *, response_model, mode, temperature):
        modes.append(mode)
        if mode == "parallel_tools":
            raise TypeError("'NoneType' object is not iterable")
        return [ExtractedEntity(name="Z", entity_type="people")]

    out = structured_generate(client, [], List[ExtractedEntity])
    assert [o.name for o in out] == ["Z"]
    assert modes == ["parallel_tools", "tools"]


def test_strategy1_then_strategy2_json_fallback():
    """When direct recovery is inapplicable, strategy 1 retries at
    temperature=0; if that fails, strategy 2 goes to JSON mode with the
    modified system prompt."""
    seen = []

    def client(messages, *, response_model, mode, temperature):
        seen.append((mode, temperature, messages[0]["content"] if messages else ""))
        if mode == "json":
            return [ExtractedEntity(name="J", entity_type="people")]
        raise RuntimeError("multiple tool calls returned")  # no last_completion

    msgs = [{"role": "system", "content": "base prompt"}]
    out = structured_generate(client, msgs, List[ExtractedEntity])
    assert [o.name for o in out] == ["J"]
    modes = [s[0] for s in seen]
    assert modes == ["parallel_tools", "parallel_tools", "json"]
    # strategy-1 retry is deterministic
    assert seen[1][1] == 0
    # strategy-2 system suffix (reference llm.py:446-452)
    assert seen[2][2].endswith("IMPORTANT: Return exactly one JSON response.")
    # original messages not mutated
    assert msgs[0]["content"] == "base prompt"


def test_retryable_backoff_then_success():
    sleeps = []
    attempts = []

    def client(messages, *, response_model, mode, temperature):
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("503 service overloaded, try again")
        return [ExtractedEntity(name="OK", entity_type="people")]

    out = structured_generate(
        client, [], List[ExtractedEntity],
        sleep=sleeps.append, rand=lambda: 0.5,
    )
    assert [o.name for o in out] == ["OK"]
    # exponential backoff with jitter: 2*2^0+0.5, 2*2^1+0.5
    assert sleeps == [2.5, 4.5]


def test_non_retryable_raises_immediately():
    def client(messages, *, response_model, mode, temperature):
        raise ValueError("schema validation failed")

    with pytest.raises(ValueError):
        structured_generate(client, [], List[ExtractedEntity], sleep=lambda s: None)


def test_retry_budget_exhausted_raises():
    sleeps = []

    def client(messages, *, response_model, mode, temperature):
        raise RuntimeError("rate limit exceeded")

    with pytest.raises(RuntimeError):
        structured_generate(
            client, [], List[ExtractedEntity], sleep=sleeps.append,
            rand=lambda: 0.0,
        )
    assert sleeps == [2.0, 4.0, 8.0]  # MAX_RETRIES=3 backoffs then raise


def test_envelope_unwrap_shapes():
    assert unwrap_envelope(None) is None
    assert unwrap_envelope({"text": "t", "tags": []}) == {"text": "t", "tags": []}
    nested = {"choices": [{"message": {"parsed": {"text": "inner"}}}]}
    assert unwrap_envelope(nested) == {"text": "inner"}
    assert unwrap_envelope({"choices": []}) is None


def test_to_plain_dicts_mixed():
    class WithDictOnly:
        def dict(self):
            return {"name": "d"}

    items = [
        {"name": "a"},
        ExtractedEntity(name="b", entity_type="people"),
        None,
        WithDictOnly(),
        object(),  # nothing extractable → skipped
    ]
    out = to_plain_dicts(items)
    assert [d["name"] for d in out] == ["a", "b", "d"]


# ── the extractor seam end-to-end ──


def _gazetteer_client_factory():
    """A deterministic 'model': returns entities for known surfaces, plus
    one hallucinated entity that mention-validation must drop."""
    from hinbox_ray.config import GAZETTEER

    def client(messages, *, response_model, mode, temperature):
        text = messages[-1]["content"]
        out = []
        for e in GAZETTEER:
            if e.surface in text:
                d = {"entity_type": e.entity_type, "type": e.attrs.get("type", "")}
                if e.entity_type == "events":
                    d["title"] = e.surface
                    d["start_date"] = e.attrs.get("start_date", "")
                else:
                    d["name"] = e.surface
                out.append(ExtractedEntity(**d))
        out.append(
            ExtractedEntity(name="Zebulon Hallucination", entity_type="people")
        )
        return iter(out) if mode == "parallel_tools" else out

    return client


def test_client_extractor_validates_and_collapses():
    ext = ClientExtractor(_gazetteer_client_factory, sleep=lambda s: None)
    ents = ext._extract_doc_with_qc(
        "Carol Rosenberg of the Federal Bureau of Investigation (FBI) "
        "visited Guantanamo Bay."
    )
    names = {e["name"] for e in ents}
    assert "Zebulon Hallucination" not in names  # mention-validation gate
    assert "Carol Rosenberg" in names
    # FBI collapses into the full form as an alias (within-doc collapse)
    fbi = [e for e in ents if e["name"] == "Federal Bureau of Investigation"]
    assert fbi and "FBI" in fbi[0]["aliases"]


def test_client_extractor_blanks_event_attrs_on_non_events():
    """A model that populates start/end_date/event_type on a PERSON must
    not leak event attributes into non-event rows — matches the
    deterministic extractor's shape and the reference's per-domain
    models (ADVICE r2)."""

    def factory():
        def client(messages, *, response_model, mode, temperature):
            out = [
                ExtractedEntity(
                    name="Carol Rosenberg",
                    entity_type="people",
                    start_date="2004-01-01",
                    end_date="2004-12-31",
                    event_type="visit",
                ),
                ExtractedEntity(
                    title="Combatant Status Review Tribunals",
                    entity_type="events",
                    start_date="2004-07-30",
                    end_date="2005-01-01",
                    event_type="legal",
                ),
            ]
            return iter(out) if mode == "parallel_tools" else out

        return client

    ext = ClientExtractor(factory, sleep=lambda s: None)
    ents = ext._extract_doc_with_qc(
        "Carol Rosenberg covered the Combatant Status Review Tribunals."
    )
    by_name = {e["name"]: e for e in ents}
    person = by_name["Carol Rosenberg"]
    assert (person["start_date"], person["end_date"], person["event_type"]) == (
        "",
        "",
        "",
    )
    event = by_name["Combatant Status Review Tribunals"]
    assert event["start_date"] == "2004-07-30"
    assert event["end_date"] == "2005-01-01"
    assert event["event_type"] == "legal"


def test_client_extractor_build_kg_matches_gazetteer_graph(ray_session):
    """A1/A2 integration proof (round-2 VERDICT #4): the flagship run
    through ClientExtractor + the library's gazetteer client double
    produces the EXACT triple set of the deterministic extractor —
    the model seam composes beyond unit level."""
    import ray.data as rd

    from hinbox_ray.pipelines.kg import build_kg
    from hinbox_ray.sources.pages import generate_pages_table
    from hinbox_ray.stages.llm_client import gazetteer_client_factory

    pages = generate_pages_table(120)
    gaz = build_kg(rd.from_arrow(pages), concurrency=2).triples.to_pandas()
    cli = build_kg(
        rd.from_arrow(pages),
        concurrency=2,
        extractor_cls=ClientExtractor,
        extractor_kwargs={"client_factory": gazetteer_client_factory},
    ).triples.to_pandas()
    assert set(map(tuple, gaz.values)) == set(map(tuple, cli.values))
    assert len(gaz) == len(cli) > 0


def test_client_extractor_in_ray_pipeline(ray_session):
    """The seam works as a map_batches actor pool over real pages."""
    import ray.data as rd

    from hinbox_ray.sources.pages import generate_pages_table
    from hinbox_ray.stages.extract import extract_and_filter

    # defined INSIDE the test so cloudpickle ships it by value — a
    # test-module top-level function pickles by reference and Ray
    # workers cannot import the tests module
    def factory():
        from hinbox_ray.config import GAZETTEER
        from hinbox_ray.stages.llm_client import ExtractedEntity

        def client(messages, *, response_model, mode, temperature):
            text = messages[-1]["content"]
            out = []
            for e in GAZETTEER:
                if e.surface in text:
                    d = {"entity_type": e.entity_type, "type": e.attrs.get("type", "")}
                    if e.entity_type == "events":
                        d["title"] = e.surface
                        d["start_date"] = e.attrs.get("start_date", "")
                    else:
                        d["name"] = e.surface
                    out.append(ExtractedEntity(**d))
            out.append(
                ExtractedEntity(name="Zebulon Hallucination", entity_type="people")
            )
            return iter(out) if mode == "parallel_tools" else out

        return client

    docs = extract_and_filter(rd.from_arrow(generate_pages_table(40)))
    mentions = docs.map_batches(
        ClientExtractor,
        fn_constructor_kwargs={"client_factory": factory},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        num_cpus=1,
    )
    df = mentions.to_pandas()
    assert len(df) > 0
    assert set(df["entity_type"]) <= {"people", "organizations", "locations", "events"}
    assert not (df["name"] == "Zebulon Hallucination").any()
