"""Legacy v0 config syntax -> v1alpha1 translation.

The reference's README and half its examples use the v0 surface
(`components:` blocks, `receiver.udp` / `link.throttler` / `sink.dumper`
module names, `routes:` maps and `links:` arrays on pipeline blocks —
/root/reference/README.md:190-228, examples/routing-config.yml,
examples/udp2tcp_replicator-config.yml), while the v1alpha1 code only
accepts `actors:` + `connect:` (pkg/types/cfg.go:148-150).  Per SURVEY.md
§2.1 the engine treats v0 as syntax sugar and translates it before
validation, so every shipped example config loads unchanged:

- receiver.X           -> core.receiver, bind = "X://<bind_addr>"
- sink.dumper          -> core.sink,     bind = "file://<out>"
- sink.X               -> core.sink,     bind = "X://<bind_addr>"
- link.router          -> core.router (routing_key param preserved;
                          `routes: {value: peer}` becomes the router's
                          value->peer map + connect list)
- link.fanout          -> core.replicator mode=fanout
- link.demux           -> core.replicator mode=each
- link.replicator      -> core.replicator mode=rand (v0's consistent-hash
                          placement; `replicas` is recorded but one
                          destination per message is chosen, hash-keyed)
- link.mux             -> core.mux
- link.throttler       -> core.throttler
- link.buffer          -> core.buffer
- link.meta_parser / meta_perser (README's spelling) -> core.meta_parser
- `links: [...]`       -> connect list
"""

from __future__ import annotations

from typing import Any

_LINK_MAP = {
    "link.router": ("core.router", {}),
    "link.fanout": ("core.replicator", {"mode": "fanout"}),
    "link.demux": ("core.replicator", {"mode": "each"}),
    "link.replicator": ("core.replicator", {"mode": "rand"}),
    "link.mux": ("core.mux", {}),
    "link.throttler": ("core.throttler", {}),
    "link.buffer": ("core.buffer", {}),
    "link.meta_parser": ("core.meta_parser", {}),
    "link.meta_perser": ("core.meta_parser", {}),
}


def is_v0(doc: dict[str, Any]) -> bool:
    return "components" in doc and "actors" not in doc


def _translate_module(module: str, params: dict[str, Any]) -> tuple[str, dict[str, Any]]:
    params = {k: v for k, v in params.items() if k != "backend"}  # evio/net detail
    if module.startswith("receiver."):
        scheme = module.removeprefix("receiver.")
        bind = params.pop("bind_addr", "")
        return "core.receiver", {"bind": f"{scheme}://{bind}", **params}
    if module == "sink.dumper":
        out = params.pop("out", "STDOUT")
        return "core.sink", {"bind": f"file://{out}", **params}
    if module.startswith("sink."):
        scheme = module.removeprefix("sink.")
        bind = params.pop("bind_addr", "")
        return "core.sink", {"bind": f"{scheme}://{bind}", **params}
    if module in _LINK_MAP:
        target, extra = _LINK_MAP[module]
        return target, {**extra, **params}
    return module, params  # already v1alpha1 (or plugin.*)


def translate_v0(doc: dict[str, Any]) -> dict[str, Any]:
    """Return an equivalent v1alpha1 document; input is not mutated."""
    if not is_v0(doc):
        return doc
    actors: dict[str, Any] = {}
    for name, block in (doc.get("components") or {}).items():
        block = dict(block or {})
        module, params = _translate_module(
            str(block.get("module", "")), dict(block.get("params") or {})
        )
        actors[name] = {"module": module, "params": params}

    pipeline: dict[str, Any] = {}
    for name, block in (doc.get("pipeline") or {}).items():
        block = dict(block or {})
        out: dict[str, Any] = {}
        conn = block.get("connect") or []
        if isinstance(conn, str):
            conn = [conn]
        conn = list(conn)
        if "links" in block:  # v0 fan-out array
            conn += list(block["links"] or [])
        if "routes" in block:  # v0 named-route map: value -> peer
            routes = dict(block["routes"] or {})
            conn += [p for p in routes.values() if p not in conn]
            if name in actors:
                actors[name]["params"].setdefault("routes", routes)
        if conn:
            out["connect"] = conn
        pipeline[name] = out

    translated = {k: v for k, v in doc.items() if k not in ("components", "pipeline")}
    translated["actors"] = actors
    translated["pipeline"] = pipeline
    return translated
