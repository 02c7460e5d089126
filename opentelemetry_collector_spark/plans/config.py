"""Config resolver — the confmap analog (SURVEY §2.9).

The reference merges config maps from provider URIs, expands ``${...}``
references, and validates the pipeline graph before building it
(confmap/resolver.go:82-217, confmap/expand.go:39-178,
service/config.go:42-98). Re-expressed minimally:

* sources: YAML file(s) and/or dicts, later sources deep-merged over earlier
  ones (resolver merge order, resolver.go:128-177);
* expansion: ``${env:NAME}`` and ``${NAME}`` from the environment, applied
  to every string scalar (expand.go:39-133; only the env provider is
  meaningful here — file/http providers are the YAML files themselves);
* validation mirrors service/config.go: >=1 pipeline, each pipeline needs
  >=1 receiver and >=1 exporter, no duplicate processor in a pipeline,
  component references must be defined.
* provider URIs: ``file:``, ``env:``, ``yaml:``, ``http://``, ``https://``
  scheme dispatch like the reference's provider registry
  (confmap/provider/{fileprovider,envprovider,yamlprovider,httpprovider,
  httpsprovider}); a scheme-less string is a file path (resolver.go's
  default-scheme rule).
"""

from __future__ import annotations

import os
import re
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Any

_REF = re.compile(r"\$\{(?:env:)?([A-Za-z_][A-Za-z0-9_]*)\}")

#: URI scheme per confmap/resolver.go:229 (RFC 3986 scheme, >=2 chars so
#: Windows-style one-letter drive prefixes never match)
_SCHEME = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]+):")


def _fetch_http(uri: str, timeout: float = 10.0) -> str:
    """GET a config body over http/https (confmap/provider/httpprovider/
    provider.go:45-63 — plain GET, non-2xx is an error). Split out so tests
    and deployments can stub transport without a live endpoint.

    urlopen raises HTTPError for non-2xx before the body is readable —
    normalized here to the ValueError contract every other provider
    failure uses (an in-band status check would be dead code)."""
    try:
        with urllib.request.urlopen(uri, timeout=timeout) as resp:  # noqa: S310
            return resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:
        raise ValueError(f"config fetch {uri!r}: HTTP {e.code}") from e


def load_uri(uri: str, env: dict[str, str] | None = None) -> dict:
    """One provider URI -> config map (the provider registry dispatch,
    confmap/resolver.go:122-141).

    * ``file:path`` or plain path — YAML file (fileprovider);
    * ``env:NAME`` — the variable's VALUE parsed as YAML (envprovider;
      distinct from ``${env:NAME}`` scalar expansion); resolved against
      the SAME ``env`` mapping the caller passed for expansion (process
      environment only when none is given), so one resolve call never
      sees two different environments;
    * ``yaml:receivers::x: {}`` — inline YAML body (yamlprovider);
    * ``http(s)://...`` — remote YAML (http/httpsprovider; TLS handled by
      urllib; custom CA bundles are a deployment concern, gated like the
      reference's httpsprovider config).
    """
    import yaml

    m = _SCHEME.match(uri)
    scheme = m.group(1).lower() if m else "file"
    rest = uri[m.end():] if m else uri
    if scheme == "file":
        with open(rest) as f:
            return yaml.safe_load(f) or {}
    if scheme == "env":
        env_map = env if env is not None else dict(os.environ)
        if rest not in env_map:
            raise ValueError(f"config env provider: {rest!r} is not set")
        return yaml.safe_load(env_map[rest]) or {}
    if scheme == "yaml":
        data = yaml.safe_load(rest)
        if not isinstance(data, dict):
            raise ValueError(f"yaml: URI must parse to a map, got {type(data)}")
        return data
    if scheme in ("http", "https"):
        return yaml.safe_load(_fetch_http(uri)) or {}
    raise ValueError(f"unsupported config provider scheme {scheme!r}")


def expand_vars(value: Any, env: dict[str, str] | None = None) -> Any:
    """Recursively expand ${NAME} / ${env:NAME} in string scalars.

    ``$$`` escapes a literal ``$`` (confmap expand.go semantics — "$$x"
    stays "$x", never expanded). Unknown names resolve to "" (matching the
    reference's env provider when unset)."""
    environ = os.environ if env is None else env
    if isinstance(value, str):
        # split on the escape FIRST so "$${X}" survives as literal "${X}"
        parts = value.split("$$")
        return "$".join(
            _REF.sub(lambda m: environ.get(m.group(1), ""), p) for p in parts
        )
    if isinstance(value, dict):
        return {k: expand_vars(v, env) for k, v in value.items()}
    if isinstance(value, list):
        return [expand_vars(v, env) for v in value]
    return value


def deep_merge(base: dict, over: dict) -> dict:
    """Map-merge with `over` winning; nested maps merge recursively
    (confmap.Conf.Merge semantics)."""
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


@dataclass
class ServiceConfig:
    """Validated collector-style config: named components + pipeline wiring."""

    receivers: dict[str, dict] = field(default_factory=dict)
    processors: dict[str, dict] = field(default_factory=dict)
    exporters: dict[str, dict] = field(default_factory=dict)
    pipelines: dict[str, dict] = field(default_factory=dict)

    @classmethod
    def from_sources(cls, *sources: str | dict,
                     env: dict[str, str] | None = None) -> "ServiceConfig":
        """Resolve: load provider URIs / dicts in order, merge, expand,
        build. Strings go through the provider registry (load_uri); plain
        paths keep working via the default file scheme."""
        merged: dict = {}
        for src in sources:
            data = load_uri(src, env=env) if isinstance(src, str) else src
            merged = deep_merge(merged, data)
        merged = expand_vars(merged, env)
        cfg = cls(
            receivers=merged.get("receivers", {}) or {},
            processors=merged.get("processors", {}) or {},
            exporters=merged.get("exporters", {}) or {},
            pipelines=(merged.get("service", {}) or {}).get("pipelines", {}) or {},
        )
        cfg.validate()
        return cfg

    def validate(self) -> None:
        """service/config.go:42-98 rules."""
        if not self.pipelines:
            raise ValueError("config must have at least one pipeline")
        for name, p in self.pipelines.items():
            recvs = p.get("receivers") or []
            procs = p.get("processors") or []
            exps = p.get("exporters") or []
            if not recvs:
                raise ValueError(f"pipeline {name!r} must have at least one receiver")
            if not exps:
                raise ValueError(f"pipeline {name!r} must have at least one exporter")
            if len(set(procs)) != len(procs):
                raise ValueError(
                    f"pipeline {name!r} references processor more than once"
                )
            for r in recvs:
                if r not in self.receivers:
                    raise ValueError(f"pipeline {name!r}: unknown receiver {r!r}")
            for pr in procs:
                if pr not in self.processors:
                    raise ValueError(f"pipeline {name!r}: unknown processor {pr!r}")
            for e in exps:
                if e not in self.exporters:
                    raise ValueError(f"pipeline {name!r}: unknown exporter {e!r}")
