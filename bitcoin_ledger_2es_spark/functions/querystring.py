"""Lucene classic query_string parser (ES ``query_string`` analogue).

Grammar (the widely-used subset of Lucene's classic QueryParser syntax —
no external parser, one regex scan):

  query    := clause*
  clause   := occur? body
  occur    := '+' (must) | '-' (must_not)      # default: should
  body     := '"' text '"' slop?               # phrase; slop? = '~' INT
            | FIELD ':' value                  # metadata filter clause
            | WORD '~' INT?                    # fuzzy (default fuzziness 2)
            | WORD with '*' / '?'              # trailing-'*'-only = prefix,
            |                                  #   else wildcard
            | WORD                             # term (analyzed)

Semantics lowered onto the engine (plans/query.py ``query_string``):

  * bare clauses are ``should`` under ``default_operator='or'`` (ES
    default) and ``must`` under ``'and'``;
  * a clause that the analyzer splits into several tokens (e.g.
    ``foo-bar``) stays ONE clause: any member matching satisfies it,
    every member scores — Lucene scores per-term, counts per-clause;
  * multi-term expansions (prefix/wildcard/fuzzy) use the dictionary
    with rewrite=scoring_boolean (weight-1 per expanded term, capped at
    max_expansions by df desc) — the engine's existing expansion path;
  * ``field:value`` clauses filter on docmap metadata columns (ES filter
    context, non-scoring); '+'/'-' make the filter required/negated.
    ``text:value`` addresses the indexed field and is a term clause.

Escapes: a backslash quotes the next character inside a WORD (``foo\\:bar``
is the literal token ``foo:bar``). Unterminated quotes swallow the rest of
the input as the phrase body, as in Lucene's lenient mode.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .analyze import analyze_query
from ..config import DEFAULT, EngineConfig

# one scan token: optional occur prefix, then a quoted phrase (with
# optional ~slop) or a bare run of non-space chars (backslash-escapes kept)
_SCAN = re.compile(
    r"""(?P<occur>[+-]?)
        (?:"(?P<phrase>[^"]*)"?(?:~(?P<slop>\d+))?
          |(?P<word>(?:\\.|[^\s"])+))""",
    re.VERBOSE,
)
_FIELD = re.compile(r"^(?P<f>[A-Za-z_][A-Za-z0-9_]*):(?P<v>.+)$", re.DOTALL)
_FUZZY = re.compile(r"^(?P<stem>.+?)~(?P<n>\d*)$", re.DOTALL)

#: docmap metadata columns addressable as ``field:value`` filter clauses
FILTER_FIELDS = ("conv_id", "turn_idx", "doc_len", "is_rollup", "doc_id")

_ROLES = {"": "should", "+": "must", "-": "must_not"}


@dataclass
class TermClause:
    role: str
    terms: list[str]  # analyzed tokens; one clause = one group


@dataclass
class PhraseClause:
    role: str
    terms: list[str]
    slop: int = 0


@dataclass
class ExpandClause:
    role: str
    kind: str  # prefix | wildcard | fuzzy
    pattern: str  # stem (prefix/fuzzy) or full pattern (wildcard)
    fuzziness: int = 2


@dataclass
class FilterClause:
    role: str  # must/should are both "required" (a lone filter restricts)
    fld: str
    value: str


@dataclass
class ParsedQuery:
    terms: list[TermClause] = field(default_factory=list)
    phrases: list[PhraseClause] = field(default_factory=list)
    expands: list[ExpandClause] = field(default_factory=list)
    filters: list[FilterClause] = field(default_factory=list)
    # roles of clauses addressing UNKNOWN fields (ES unmapped-field
    # semantics: such a clause matches NOTHING — a must kills the query,
    # a should contributes nothing, a must_not excludes nothing)
    unmapped: list[str] = field(default_factory=list)

    def scoring_clauses(self) -> int:
        return (
            sum(1 for c in self.terms if c.role != "must_not")
            + sum(1 for c in self.phrases if c.role != "must_not")
            + sum(1 for c in self.expands if c.role != "must_not")
        )


def _unescape(w: str) -> str:
    return re.sub(r"\\(.)", r"\1", w)


def parse_query_string(
    qs: str,
    cfg: EngineConfig = DEFAULT,
    default_operator: str = "or",
) -> ParsedQuery:
    """Parse a classic query string into clause lists. Pure function of
    (qs, cfg, default_operator); raises ValueError only on a bad
    default_operator — never on user text (lenient like Lucene's
    escape-tolerant mode: unparseable fragments analyze to nothing and
    drop out; tokens addressing unknown fields — URLs, key:value text —
    become unmapped clauses that match nothing, the ES behavior)."""
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    bare = "should" if default_operator == "or" else "must"
    out = ParsedQuery()
    for m in _SCAN.finditer(qs):
        role = _ROLES[m.group("occur")]
        if role == "should" and bare == "must":
            role = "must"
        if m.group("phrase") is not None:
            toks = analyze_query(m.group("phrase"), cfg)
            if toks:
                out.phrases.append(
                    PhraseClause(role, toks, int(m.group("slop") or 0))
                )
            continue
        word = m.group("word")
        fm = _FIELD.match(word)
        if fm and "\\" not in word.split(":", 1)[0]:
            fld, value = fm.group("f"), _unescape(fm.group("v"))
            if fld in FILTER_FIELDS:
                out.filters.append(FilterClause(role, fld, value))
                continue
            if fld == "text":
                word = fm.group("v")  # text: addresses the indexed field
            else:
                # ES unmapped-field semantics: no error — the clause
                # matches nothing (URLs like http://x parse here too)
                out.unmapped.append(role)
                continue
        zm = _FUZZY.match(word)
        if zm and "*" not in word and "?" not in word:
            stem = _unescape(zm.group("stem")).lower()
            if stem:
                out.expands.append(
                    ExpandClause(role, "fuzzy", stem,
                                 int(zm.group("n") or 2))
                )
            continue
        if "*" in word or "?" in word:
            pat = _unescape(word).lower()
            if pat.endswith("*") and not re.search(r"[*?]", pat[:-1]):
                if pat[:-1]:
                    out.expands.append(ExpandClause(role, "prefix", pat[:-1]))
            elif pat.strip("*?"):
                out.expands.append(ExpandClause(role, "wildcard", pat))
            continue
        toks = analyze_query(_unescape(word), cfg)
        if toks:
            out.terms.append(TermClause(role, toks))
    return out
