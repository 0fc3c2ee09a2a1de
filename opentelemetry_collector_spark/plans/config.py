"""YAML pipeline spec → PipelineSpec (the collector's config path, §3.1).

Reference analog: ``config/config.go (Load)`` decodes the service YAML into
``configmodels.Config{Receivers, Processors, Exporters, Service.Pipelines}``
and ``validateConfig`` rejects unknown references / empty pipelines before
the builders run.  Here the YAML decodes into :class:`PipelineSpec` (routes,
grok pattern, lookup defaults) and validation raises before any Spark plan
is built — same fail-fast contract, minus the builder phase (lazy DataFrames
need no reverse-topological construction).

Example spec::

    pipeline:
      raw_col: raw
      salt_buckets: 32
      grok:
        pattern: '^%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} k=%{INT:k}$'
        types: {k: int, ts: timestamp}
      routes:
        - {sink: sink_hot,     predicate: "source = 'src0'", priority: 0}
        - {sink: sink_default, predicate: "TRUE",            priority: 9}
      lookup_defaults: {env: unknown}
"""

from __future__ import annotations

import yaml

from ..functions.grok import GrokPattern
from ..operators.attraction import AttrAction
from ..operators.relabel import RelabelRule
from ..operators.router import Route
from .pipeline import PipelineSpec


class ConfigError(ValueError):
    """Invalid pipeline spec (mirrors validateConfig failures)."""


def spec_from_yaml(text: str) -> PipelineSpec:
    """Parse + validate a YAML pipeline spec."""
    doc = yaml.safe_load(text)
    if not isinstance(doc, dict) or "pipeline" not in doc:
        raise ConfigError("top-level 'pipeline' key required")
    p = doc["pipeline"]

    routes_cfg = p.get("routes") or []
    if not routes_cfg:
        raise ConfigError("pipeline must declare at least one route (empty pipeline)")
    routes = []
    seen = set()
    for r in routes_cfg:
        if "sink" not in r:
            raise ConfigError("route missing keys: ['sink']")
        if ("predicate" in r) == ("condition" in r):
            raise ConfigError(
                f"route {r['sink']!r} needs exactly one of 'predicate' (SQL) "
                "or 'condition' (OTTL)"
            )
        if r["sink"] in seen:
            raise ConfigError(f"duplicate sink name {r['sink']!r}")
        seen.add(r["sink"])
        if "condition" in r:
            # routing-connector table syntax: OTTL condition, parse-validated
            # at config load (same fail-fast contract as transform below)
            from ..functions.ottl import validate_condition

            try:
                validate_condition(r["condition"])
            except ValueError as e:
                raise ConfigError(str(e)) from e
            routes.append(Route(r["sink"], r["condition"], int(r.get("priority", 0)), ottl=True))
        else:
            routes.append(Route(r["sink"], r["predicate"], int(r.get("priority", 0))))
    default_sink = p.get("default_sink")
    if default_sink is not None:
        # routing-connector default_pipelines analog: lowest-priority catch-all
        if default_sink in seen:
            raise ConfigError(f"default_sink {default_sink!r} duplicates a route sink")
        routes.append(Route(default_sink, "TRUE", max(r.priority for r in routes) + 1))
    if not any(
        not r.ottl and r.predicate.strip().upper() == "TRUE"
        or r.ottl and r.predicate.strip().lower() == "true"
        for r in routes
    ):
        raise ConfigError(
            "no catch-all route (predicate TRUE / condition true / default_sink): "
            "rows could be dropped silently"
        )

    kwargs: dict = {"routes": routes}
    if "grok" in p:
        g = p["grok"]
        if "pattern" not in g:
            raise ConfigError("grok requires 'pattern'")
        kwargs["grok"] = GrokPattern(g["pattern"], types=dict(g.get("types") or {}))
    for key in ("raw_col", "source_col", "id_col", "size_col", "salt_buckets"):
        if key in p:
            kwargs[key] = p[key]
    if "lookup_defaults" in p:
        kwargs["lookup_defaults"] = dict(p["lookup_defaults"])
    if "attributes" in p:
        # attributesprocessor config analog: ordered action list
        actions = []
        for a in p["attributes"] or []:
            if "action" not in a or "key" not in a:
                raise ConfigError("attributes entry requires 'action' and 'key'")
            try:
                actions.append(
                    AttrAction(
                        a["action"],
                        a["key"],
                        value=a.get("value"),
                        from_attribute=a.get("from_attribute"),
                        pattern=a.get("pattern"),
                        converted_type=a.get("converted_type"),
                        types=dict(a.get("types") or {}),
                    )
                )
            except ValueError as e:
                raise ConfigError(str(e)) from e
        kwargs["attr_actions"] = actions
    if "relabel" in p:
        # prometheus relabel_configs analog: ordered rule list
        rules = []
        for r in p["relabel"] or []:
            if "action" not in r:
                raise ConfigError("relabel entry requires 'action'")
            try:
                rules.append(
                    RelabelRule(
                        action=r["action"],
                        source_labels=tuple(r.get("source_labels") or ()),
                        separator=r.get("separator", ";"),
                        regex=r.get("regex", "(.*)"),
                        target_label=r.get("target_label"),
                        replacement=r.get("replacement", "$1"),
                        modulus=int(r.get("modulus", 0)),
                    )
                )
            except ValueError as e:
                raise ConfigError(str(e)) from e
        kwargs["relabel"] = rules
    if "transform" in p:
        # transformprocessor config analog: ordered OTTL statement list,
        # parse-validated here so a bad statement fails at config load
        from ..functions.ottl import validate_statement

        stmts = list(p["transform"] or [])
        for st in stmts:
            if not isinstance(st, str):
                raise ConfigError("transform entries must be statement strings")
            try:
                validate_statement(st)
            except ValueError as e:
                raise ConfigError(str(e)) from e
        kwargs["transform"] = stmts
    if "filters" in p:
        # filterprocessor config analog: OTTL drop conditions (drop-if-any-true)
        from ..functions.ottl import validate_condition

        conds = list(p["filters"] or [])
        for c in conds:
            if not isinstance(c, str):
                raise ConfigError("filters entries must be OTTL condition strings")
            try:
                validate_condition(c)
            except ValueError as e:
                raise ConfigError(str(e)) from e
        kwargs["drop_conditions"] = conds
    if "group_by_attrs" in p:
        # groupbyattrs processor analog: list of attribute columns promoted
        # to the synthetic resource key
        keys = list(p["group_by_attrs"] or [])
        if not keys or not all(isinstance(k, str) and k for k in keys):
            raise ConfigError("group_by_attrs must be a non-empty list of column names")
        kwargs["group_by_attrs"] = keys
    return PipelineSpec(**kwargs)


def spec_to_yaml(spec: PipelineSpec) -> str:
    """Serialize back (round-trip support for golden-config tests)."""
    doc = {
        "pipeline": {
            "raw_col": spec.raw_col,
            "source_col": spec.source_col,
            "id_col": spec.id_col,
            "size_col": spec.size_col,
            "salt_buckets": spec.salt_buckets,
            "grok": {"pattern": spec.grok.pattern, "types": dict(spec.grok.types)},
            "routes": [
                {
                    "sink": r.sink,
                    ("condition" if r.ottl else "predicate"): r.predicate,
                    "priority": r.priority,
                }
                for r in spec.routes
            ],
            "lookup_defaults": dict(spec.lookup_defaults),
        }
    }
    if spec.attr_actions:
        doc["pipeline"]["attributes"] = [
            {
                k: v
                for k, v in {
                    "action": a.action,
                    "key": a.key,
                    "value": a.value,
                    "from_attribute": a.from_attribute,
                    "pattern": a.pattern,
                    "converted_type": a.converted_type,
                    "types": dict(a.types) or None,
                }.items()
                if v is not None
            }
            for a in spec.attr_actions
        ]
    if spec.relabel:
        doc["pipeline"]["relabel"] = [
            {
                k: v
                for k, v in {
                    "action": r.action,
                    "source_labels": list(r.source_labels) or None,
                    "separator": r.separator if r.separator != ";" else None,
                    "regex": r.regex,
                    "target_label": r.target_label,
                    "replacement": r.replacement if r.replacement != "$1" else None,
                    "modulus": r.modulus or None,
                }.items()
                if v is not None
            }
            for r in spec.relabel
        ]
    if spec.transform:
        doc["pipeline"]["transform"] = list(spec.transform)
    if spec.drop_conditions:
        doc["pipeline"]["filters"] = list(spec.drop_conditions)
    if spec.group_by_attrs:
        doc["pipeline"]["group_by_attrs"] = list(spec.group_by_attrs)
    return yaml.safe_dump(doc, sort_keys=False)
