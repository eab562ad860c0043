"""Generate → reflect → regenerate loop (reference A6 reflection).

Reimplements the CONTROL FLOW of the reference's ``iterative_improve``
(/root/reference/src/utils/llm.py:654-754) provider-agnostically: reflect
on the current candidate; if the reflector judges it valid, stop; else
regenerate with the reflector's critique attached, up to
``max_iterations`` rounds, recording a reflection history entry per
round. The reference's reflector is an LLM call returning a
``ReflectionResult`` (llm.py:107, reflect_and_check :564-614); here both
the generator and the reflector are injectable callables — the
deterministic default reflector validates the profile contract the same
way the reference's reflection prompt validates its profile text
(citations present, non-trivial text, tags populated), and a model-backed
reflector swaps in with no plumbing change (the A2 pattern:
stages/llm_client.py).

Used by stages/profiles.py (per profile version, mirroring
``generate_profile_with_reflection``, reference
src/engine/profiles.py:106-212) and surfaced as G3 reflection counters
(reference src/process_and_extract.py:343-362
``calculate_reflection_statistics``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List


@dataclass
class ReflectionResult:
    """Verdict of one reflection pass (reference llm.py:107-113)."""

    valid: bool
    reasoning: str = ""
    issues: List[str] = field(default_factory=list)


def iterative_improve(
    initial: Any,
    generate: Callable[[Any, ReflectionResult], Any],
    reflect: Callable[[Any], ReflectionResult],
    max_iterations: int = 3,
) -> Dict[str, Any]:
    """Reference llm.py:654-754 control flow over an arbitrary candidate
    value (the reference works on the JSON text of the structured
    response; the deterministic engine works on the profile dict itself —
    same loop, same history shape, same early-exit).

    ``generate(current, reflection)`` produces an improved candidate from
    the failed one plus the critique; ``reflect(candidate)`` judges it.
    Returns ``{"result", "reflection_history", "final_valid",
    "attempts"}`` where ``attempts == len(reflection_history)`` is the
    G3 counter unit (one reflection call per attempt).
    """
    current = initial
    history: List[Dict[str, Any]] = []
    for i in range(max_iterations):
        r = reflect(current)
        history.append(
            {
                "iteration": i + 1,
                "valid": bool(r.valid),
                "reasoning": str(r.reasoning),
                "issues": [str(x) for x in r.issues],
            }
        )
        if r.valid:
            break
        current = generate(current, r)
    return {
        "result": current,
        "reflection_history": history,
        "final_valid": history[-1]["valid"] if history else False,
        "attempts": len(history),
    }


def default_profile_reflector(profile: Dict[str, Any]) -> ReflectionResult:
    """Deterministic analog of the reference's profile reflection prompt
    (src/engine/profiles.py reflection template + llm.py:720-726 repair
    hint: citations in ``^[id]`` form, non-trivial text, populated tags,
    all required fields). Validates the engine's own profile contract:

    - ``text`` non-empty;
    - every listed source is cited in the text as ``^[source]``;
    - at least one tag;
    - ``confidence`` within [0, 1].
    """
    issues: List[str] = []
    text = str(profile.get("text", "") or "")
    if not text.strip():
        issues.append("empty profile text")
    for src in profile.get("sources") or []:
        if f"^[{src}]" not in text:
            issues.append(f"missing citation ^[{src}]")
    if not profile.get("tags"):
        issues.append("no tags")
    conf = profile.get("confidence")
    if not isinstance(conf, (int, float)) or not (0.0 <= float(conf) <= 1.0):
        issues.append("confidence outside [0, 1]")
    if issues:
        return ReflectionResult(
            valid=False,
            reasoning="; ".join(issues),
            issues=issues,
        )
    return ReflectionResult(valid=True, reasoning="profile contract satisfied")
