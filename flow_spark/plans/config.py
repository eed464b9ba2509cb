"""Layered pipeline configuration.

Reference semantics (/root/reference/pkg/cfg, pkg/cast — SURVEY.md §1.2):
values merge from providers by priority weight default(0) < env(10) <
yaml(20) < cli(30); env vars use the FLOW_ prefix with '_' -> '.'
canonicalization (env_provider.go:15-18,64); unknown actor-config keys are
hard errors (cast/types.go:94-101).

The whole Go trie/mapper subsystem collapses to plain dict merging here —
config resolves eagerly at build time into an immutable plan (SURVEY.md
§3.3): no runtime lookups.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

try:
    import yaml as _yaml
except ImportError:  # pragma: no cover
    _yaml = None

ENV_PREFIX = "FLOW_"

#: allowed keys per actor block — types.CfgBlockActor (pkg/types/cfg.go)
_ACTOR_KEYS = {"module", "params"}
#: allowed keys per pipeline block — types.CfgBlockPipeline (cfg.go:148-150)
_PIPELINE_KEYS = {"connect"}


class ConfigError(ValueError):
    """Unknown key / malformed block — mirrors the reference's hard errors."""


@dataclass(frozen=True)
class PipelineConfig:
    actors: dict[str, dict[str, Any]]  # name -> {module, params}
    connections: dict[str, list[str]]  # name -> downstream peer names
    system: dict[str, Any] = field(default_factory=dict)


def _parse_yaml(text: str) -> dict[str, Any]:
    if _yaml is not None:
        return _yaml.safe_load(text) or {}
    return _mini_yaml(text)


def _mini_yaml(text: str) -> dict[str, Any]:
    """Minimal indentation-based parser for the pipeline YAML subset
    (mappings, string/int scalars, inline lists) — used only if PyYAML is
    unavailable in the image."""
    root: dict[str, Any] = {}
    stack: list[tuple[int, dict[str, Any]]] = [(-1, root)]
    for raw in text.splitlines():
        if not raw.strip() or raw.lstrip().startswith("#"):
            continue
        indent = len(raw) - len(raw.lstrip())
        key, _, val = raw.strip().partition(":")
        val = val.strip()
        while stack and stack[-1][0] >= indent:
            stack.pop()
        parent = stack[-1][1]
        if not val:
            child: dict[str, Any] = {}
            parent[key] = child
            stack.append((indent, child))
        elif val.startswith("[") and val.endswith("]"):
            items = [v.strip() for v in val[1:-1].split(",") if v.strip()]
            parent[key] = items
        else:
            if val.isdigit():
                parent[key] = int(val)
            elif val.lower() in ("true", "false"):
                parent[key] = val.lower() == "true"
            else:
                parent[key] = val.strip("'\"")
    return root


def _env_overrides() -> dict[str, Any]:
    """FLOW_SYSTEM_MAXPROCS=8 -> {'system.maxprocs': 8} (weight 10)."""
    out: dict[str, Any] = {}
    for k, v in os.environ.items():
        if k.startswith(ENV_PREFIX):
            key = k[len(ENV_PREFIX):].lower().replace("_", ".")
            out[key] = int(v) if v.isdigit() else v
    return out


def _apply_dotted(target: dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    cur = target
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
        if not isinstance(cur, dict):
            raise ConfigError(f"override {dotted!r} descends through a scalar")
    cur[parts[-1]] = value


def load_pipeline_config(
    yaml_text: str,
    cli_overrides: dict[str, Any] | None = None,
    defaults: dict[str, Any] | None = None,
) -> PipelineConfig:
    """Merge defaults < env < yaml < cli, validate blocks strictly."""
    merged: dict[str, Any] = dict(defaults or {"system": {"maxprocs": 0}})
    from flow_spark.plans.v0compat import translate_v0

    doc = translate_v0(_parse_yaml(yaml_text))
    for k, v in doc.items():
        merged[k] = v
    for dotted, v in _env_overrides().items():
        _apply_dotted(merged, dotted, v)
    for dotted, v in (cli_overrides or {}).items():
        _apply_dotted(merged, dotted, v)

    actors_raw = merged.get("actors")
    pipeline_raw = merged.get("pipeline")
    if not isinstance(actors_raw, dict) or not actors_raw:
        raise ConfigError("config must define a non-empty 'actors' mapping")
    if not isinstance(pipeline_raw, dict) or not pipeline_raw:
        raise ConfigError("config must define a non-empty 'pipeline' mapping")

    actors: dict[str, dict[str, Any]] = {}
    for name, block in actors_raw.items():
        if not isinstance(block, dict):
            raise ConfigError(f"actor {name!r}: block must be a mapping")
        unknown = set(block) - _ACTOR_KEYS
        if unknown:
            raise ConfigError(f"actor {name!r}: unknown keys {sorted(unknown)}")
        if "module" not in block:
            raise ConfigError(f"actor {name!r}: missing required key 'module'")
        actors[name] = {"module": block["module"], "params": dict(block.get("params") or {})}

    connections: dict[str, list[str]] = {}
    for name, block in pipeline_raw.items():
        if name not in actors:
            raise ConfigError(f"pipeline block references unknown actor {name!r}")
        block = block or {}
        unknown = set(block) - _PIPELINE_KEYS
        if unknown:
            raise ConfigError(f"pipeline {name!r}: unknown keys {sorted(unknown)}")
        conn = block.get("connect") or []
        if isinstance(conn, str):
            conn = [conn]
        connections[name] = list(conn)

    return PipelineConfig(actors=actors, connections=connections, system=merged.get("system", {}))
