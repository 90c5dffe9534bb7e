"""Search templates: the ES ``_search/template`` + ``_render/template``
surface (a deliberate Mustache SUBSET — the slices ES users actually put
in query templates), rendered driver-side into a query_string body.

Supported constructs, mirroring the ES search-template docs:

  * ``{{var}}``              — scalar substitution (str/int/float/bool);
  * ``{{#toJson}}var{{/toJson}}`` — JSON-encode a list/dict param;
  * ``{{var}}{{^var}}default{{/var}}`` — the ES default-value idiom:
    the inverted section renders its literal body only when ``var`` is
    absent/empty (per Mustache, and exactly how ES documents defaults);
  * ``{{#join}}var{{/join}}`` — the ES join-delimiter helper (comma).

Unknown ``{{...}}`` constructs raise rather than silently rendering the
empty string — a template typo must not become a match-nothing query.
Rendering is pure string work on the driver (no job), so the template
layer adds zero cost to the query plan.
"""

from __future__ import annotations

import json
import re

_TAG = re.compile(
    r"\{\{#(?P<fn>toJson|join)\}\}(?P<fnvar>[a-zA-Z0-9_.]+)\{\{/(?P=fn)\}\}"
    r"|\{\{\^(?P<negvar>[a-zA-Z0-9_.]+)\}\}(?P<default>.*?)\{\{/(?P=negvar)\}\}"
    r"|\{\{(?P<var>[a-zA-Z0-9_.]+)\}\}",
    re.DOTALL,
)


def _scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def render_template(source: str, params: dict | None = None) -> str:
    """Render a search-template ``source`` with ``params`` (the
    ``_render/template`` API). Missing scalar params render as the empty
    string ONLY when an adjacent ``{{^var}}...{{/var}}`` default section
    exists (the ES default idiom); a bare ``{{var}}`` with no param and
    no default raises KeyError."""
    params = params or {}
    # pass 1: which vars have a default section? (those may be absent)
    defaulted = {m.group("negvar") for m in _TAG.finditer(source) if m.group("negvar")}

    def _sub(m: re.Match) -> str:
        if m.group("fn"):
            name = m.group("fnvar")
            if name not in params:
                raise KeyError(f"search template: missing param {name!r}")
            v = params[name]
            if m.group("fn") == "toJson":
                return json.dumps(v, separators=(",", ":"))
            if not isinstance(v, (list, tuple)):
                raise TypeError(f"search template: {{#join}} needs a list, got {type(v).__name__}")
            return ",".join(_scalar(x) for x in v)
        if m.group("negvar"):
            name = m.group("negvar")
            v = params.get(name)
            return m.group("default") if v in (None, "", [], {}) else ""
        name = m.group("var")
        if name in params and params[name] not in (None, ""):
            return _scalar(params[name])
        if name in defaulted:
            return ""
        raise KeyError(f"search template: missing param {name!r}")

    out = _TAG.sub(_sub, source)
    leftover = re.search(r"\{\{.*?\}\}", out, re.DOTALL)
    if leftover:
        raise ValueError(
            f"search template: unsupported construct {leftover.group(0)!r}"
        )
    return out
