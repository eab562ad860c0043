"""Evidence-text construction: context windows around entity mentions.

Semantics-compatible with the reference's deterministic pseudo-profile
builder (/root/reference/src/engine/mergers.py:577-705): up to
``max_windows`` non-overlapping ~``window_chars`` snippets centered on
case-insensitive needle occurrences, joined with ``"\n\n---\n\n"``,
falling back to the head of the article; then a typed header, truncated
to ``max_chars``.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple


def extract_context_windows(
    article_content: str,
    needles: Sequence[str],
    window_chars: int = 240,
    max_windows: int = 3,
) -> str:
    if not article_content:
        return ""

    seen: set = set()
    clean: List[str] = []
    for n in needles:
        n = n.strip()
        if n and n.lower() not in seen:
            seen.add(n.lower())
            clean.append(n)
    if not clean:
        return article_content[: window_chars * max_windows]

    positions: List[Tuple[int, int]] = []
    lower = article_content.lower()
    for needle in clean:
        for m in re.finditer(re.escape(needle.lower()), lower):
            positions.append((m.start(), m.end()))
    positions.sort()
    if not positions:
        return article_content[: window_chars * max_windows]

    half = window_chars // 2
    windows: List[str] = []
    last_end = -1
    for start, end in positions:
        if len(windows) >= max_windows:
            break
        win_start = max(0, start - half)
        win_end = min(len(article_content), end + half)
        if win_start < last_end:
            continue
        windows.append(article_content[win_start:win_end].strip())
        last_end = win_end
    return "\n\n---\n\n".join(windows)


def build_evidence_text(
    entity_type: str,
    name: str,
    attrs: Dict[str, str],
    article_content: str,
    aliases: Sequence[str] = (),
    *,
    max_chars: int = 1500,
    window_chars: int = 240,
    max_windows: int = 3,
) -> str:
    """Typed header + context windows, truncated (mergers.py:635-705)."""
    needles = [name, *aliases]
    context = extract_context_windows(
        article_content, needles, window_chars=window_chars, max_windows=max_windows
    )

    parts: List[str] = []
    if entity_type == "people":
        parts.append(f"Name: {name}")
    elif entity_type in ("organizations", "locations"):
        parts.append(f"Name: {name}")
        if attrs.get("type"):
            parts.append(f"Type: {attrs['type']}")
    elif entity_type == "events":
        parts.append(f"Title: {name}")
        if attrs.get("start_date"):
            parts.append(f"Start date: {attrs['start_date']}")
        if attrs.get("event_type"):
            parts.append(f"Event type: {attrs['event_type']}")
        if attrs.get("description"):
            parts.append(f"Description: {attrs['description']}")

    if context:
        parts.append(f"\nCONTEXT:\n{context}")
    return "\n".join(parts)[:max_chars]
