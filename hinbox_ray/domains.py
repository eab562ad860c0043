"""Domain-package scaffolding (§2.11 user-extension surface).

The reference manages per-domain packages ``configs/<domain>/`` holding
``config.yaml`` (thresholds, blocking, evidence, equivalence groups),
``categories/*.yaml`` (entity types + tags) and ``prompts/*.md``, with
two helper scripts: ``scripts/init_domain.py`` (copy the template
package to a new name, /root/reference/scripts/init_domain.py:11-53)
and ``scripts/list_domains.py``. This module is the engine's analog:

- ``init_domain(name, configs_dir)`` creates ``<configs_dir>/<name>/``
  from the embedded template below (or by copying
  ``<configs_dir>/template`` when the user ships their own);
- ``list_domains(configs_dir)`` enumerates valid domain packages
  (a directory is a domain iff it holds a ``config.yaml``).

The template's ``config.yaml`` round-trips through
``DomainConfig.from_yaml`` — scaffold, edit, pass via
``python -m hinbox_ray --domain-config``.
"""

from __future__ import annotations

import os
import shutil
from typing import List

_TEMPLATE_CONFIG = """\
# Domain configuration — edit and pass via --domain-config.
# Unknown keys are ignored; omitted keys keep engine defaults
# (hinbox_ray/config.py DomainConfig).
domain: {name}

# per-type cosine merge thresholds ("default" covers unlisted types)
similarity_thresholds:
  people: 0.82
  organizations: 0.78
  locations: 0.80
  events: 0.76
  default: 0.75

# lexical + LSH blocking
blocking:
  score_cutoff: 60
  max_candidates: 50

# evidence-text windows
evidence:
  window_chars: 120
  max_windows: 3
  max_chars: 1500

# per-type alias equivalence groups (each inner list merges as one name)
equivalence_groups:
  organizations: []
  locations: []
"""

_TEMPLATE_CATEGORY = """\
# Entity-type category file: tags the extractor may assign.
# One file per entity type, same shape as the reference's
# configs/<domain>/categories/*.yaml.
tags:
  - name: default
    description: "Generic {etype} tag — replace with domain tags."
"""

_TEMPLATE_PROMPT = """\
# {etype} extraction prompt

Extract every {etype} mentioned in the article below. Return structured
records matching the domain schema. Replace this template with
domain-specific guidance and examples.
"""

_ENTITY_TYPES = ("people", "organizations", "locations", "events")


def init_domain(name: str, configs_dir: str = "configs") -> str:
    """Create ``<configs_dir>/<name>/`` (config.yaml + categories/ +
    prompts/). Mirrors the reference's validation: alphanumeric name,
    refuse to overwrite. If the user ships ``<configs_dir>/template``,
    it is copied verbatim (reference behavior); otherwise the embedded
    template above is written. Returns the created path."""
    if not name.isalnum():
        raise ValueError(f"domain name {name!r} must be alphanumeric")
    target = os.path.join(configs_dir, name)
    if os.path.exists(target):
        raise FileExistsError(f"domain {name!r} already exists at {target}")
    template = os.path.join(configs_dir, "template")
    if os.path.isdir(template):
        shutil.copytree(template, target)
        return target
    os.makedirs(os.path.join(target, "categories"))
    os.makedirs(os.path.join(target, "prompts"))
    with open(os.path.join(target, "config.yaml"), "w") as f:
        f.write(_TEMPLATE_CONFIG.format(name=name))
    for etype in _ENTITY_TYPES:
        with open(os.path.join(target, "categories", f"{etype}.yaml"), "w") as f:
            f.write(_TEMPLATE_CATEGORY.format(etype=etype))
        with open(os.path.join(target, "prompts", f"{etype}.md"), "w") as f:
            f.write(_TEMPLATE_PROMPT.format(etype=etype))
    return target


def list_domains(configs_dir: str = "configs") -> List[str]:
    """Domain packages under ``configs_dir`` (dirs holding config.yaml);
    the ``template`` package is excluded, as in the reference lister."""
    if not os.path.isdir(configs_dir):
        return []
    return sorted(
        d
        for d in os.listdir(configs_dir)
        if d != "template"
        and os.path.isfile(os.path.join(configs_dir, d, "config.yaml"))
    )
