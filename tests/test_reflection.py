"""Reflection loop (A6, reference llm.py:654-754) control-flow tests."""

from __future__ import annotations

from hinbox_ray.stages.profiles import build_versions, profile_kernel
from hinbox_ray.stages.reflection import (
    ReflectionResult,
    default_profile_reflector,
    iterative_improve,
)


def test_valid_first_try_short_circuits():
    calls = {"gen": 0}

    def gen(cur, r):
        calls["gen"] += 1
        return cur

    out = iterative_improve(
        "ok", gen, lambda t: ReflectionResult(valid=True), max_iterations=3
    )
    assert out["result"] == "ok"
    assert out["attempts"] == 1
    assert out["final_valid"] is True
    assert calls["gen"] == 0  # no regeneration when valid first try


def test_failing_validator_triggers_exactly_n_regenerations():
    calls = {"gen": 0}

    def gen(cur, r):
        calls["gen"] += 1
        return f"{cur}+fix{calls['gen']}"

    out = iterative_improve(
        "bad",
        gen,
        lambda t: ReflectionResult(valid=False, reasoning="nope", issues=["x"]),
        max_iterations=3,
    )
    # reference loop shape: reflect → (invalid) → regenerate, per round
    assert out["attempts"] == 3
    assert calls["gen"] == 3
    assert out["final_valid"] is False
    assert out["result"] == "bad+fix1+fix2+fix3"
    assert [h["iteration"] for h in out["reflection_history"]] == [1, 2, 3]


def test_improvement_accepted_midway():
    def reflect(t):
        return ReflectionResult(valid="fixed" in t, reasoning="needs fix")

    out = iterative_improve(
        "raw", lambda cur, r: cur + " fixed", reflect, max_iterations=5
    )
    assert out["attempts"] == 2  # fail, regenerate, pass
    assert out["final_valid"] is True
    assert out["result"] == "raw fixed"


def test_default_reflector_accepts_kernel_and_rejects_uncited():
    good = profile_kernel("Alice", "people", "", ["u1", "u2"])
    assert default_profile_reflector(good).valid
    bad = dict(good, text="no citations here")
    r = default_profile_reflector(bad)
    assert not r.valid
    assert any("^[u1]" in i for i in r.issues)
    assert not default_profile_reflector(dict(good, tags=[])).valid


def test_version_ladder_unchanged_for_valid_first_try():
    """With the deterministic kernel every version validates first try:
    the ladder is identical to the loop-free construction and the G3
    counter is exactly one attempt per version."""
    vp = build_versions("X", "people", "", ["a", "b", "c"])
    assert [v["profile"] for v in vp["versions"]] == [
        profile_kernel("X", "people", "", ["a", "b", "c"][:k])
        for k in (1, 2, 3)
    ]
    assert vp["reflection"] == {"total_attempts": 3, "final_valid": True}


def test_build_versions_repairing_profile_fn():
    """A profile_fn that only satisfies the contract when handed the
    critique: each version costs exactly 2 attempts (fail → repair)."""

    def flaky(name, etype, attr, urls, repair=None):
        p = profile_kernel(name, etype, attr, urls)
        if repair is None:
            p = dict(p, text="uncited")  # fails the citation check
        return p

    vp = build_versions("Y", "people", "", ["a", "b"], profile_fn=flaky)
    assert vp["reflection"] == {"total_attempts": 4, "final_valid": True}
    # repaired output equals the clean kernel's
    assert vp["versions"][-1]["profile"] == profile_kernel(
        "Y", "people", "", ["a", "b"]
    )


def test_build_versions_gives_up_after_max_iterations():
    def hopeless(name, etype, attr, urls, repair=None):
        return {"text": "", "tags": [], "confidence": 2.0, "sources": []}

    vp = build_versions("Z", "people", "", ["a"], profile_fn=hopeless,
                        max_iterations=3)
    assert vp["reflection"] == {"total_attempts": 3, "final_valid": False}
    assert vp["current_version"] == 1  # ladder still advances (best effort)
