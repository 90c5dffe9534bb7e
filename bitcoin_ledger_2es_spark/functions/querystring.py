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


# ---- ES simple_query_string ------------------------------------------

#: all operator features; pass a subset as ``flags`` to disable the rest
#: (disabled operator characters degrade to literal text, the ES
#: simple_query_string flag model — never a parse error)
SIMPLE_FLAGS = frozenset({"AND", "OR", "NOT", "PHRASE", "PREFIX", "FUZZY", "SLOP"})

# one simple-syntax token: '-' negation prefix, quoted phrase (~slop),
# bare word (may not contain the operator chars + | or quotes), or a
# standalone operator
_SIMPLE_SCAN = re.compile(
    r"""(?P<neg>-?)
        (?:"(?P<phrase>[^"]*)"?(?:~(?P<slop>\d+))?
          |(?P<word>(?:\\.|[^\s"+|])+))
        |(?P<plus>\+)
        |(?P<pipe>\|)""",
    re.VERBOSE,
)


def parse_simple_query_string(
    qs: str,
    cfg: EngineConfig = DEFAULT,
    default_operator: str = "or",
    flags: frozenset = SIMPLE_FLAGS,
) -> ParsedQuery:
    """ES ``simple_query_string`` parser: the user-facing lenient syntax
    (never raises on user text). Supported operators, each gated by a
    flag: ``|`` OR (binds tighter than AND — ``a + b | c`` is a AND
    (b OR c)), ``+`` AND, ``-`` prefix negation of one token, quoted
    phrases (``~N`` slop with SLOP), trailing-``*`` prefix, ``~N``
    fuzzy. No parentheses (ES's simple syntax HAS grouping; this subset
    documents it as unsupported — parens are analyzer-stripped text).

    Lowering: a ``|``-joined run of plain words becomes ONE TermClause
    group (any member matches, every member scores — the same Lucene
    per-term-score/per-clause-count shape the classic parser emits);
    phrases or expansions inside an OR run fall back to independent
    should clauses (documented lenient subset). Groups touching a ``+``
    are must; bare groups follow ``default_operator``; ``-`` always
    lowers to must_not regardless of grouping. Unknown-field syntax
    does not exist here (simple_query_string has no field:value
    clauses — colons are literal text)."""
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    bare = "should" if default_operator == "or" else "must"

    # scan into operands and operators
    items: list[tuple] = []  # ("op", "+"|"|") or ("operand", neg, kind, payload)
    for m in _SIMPLE_SCAN.finditer(qs):
        if m.group("plus"):
            items.append(("op", "+") if "AND" in flags else ("drop",))
            continue
        if m.group("pipe"):
            items.append(("op", "|") if "OR" in flags else ("drop",))
            continue
        neg = bool(m.group("neg")) and "NOT" in flags
        if m.group("phrase") is not None:
            if "PHRASE" not in flags:
                continue  # phrases disabled: quoted text drops (lenient)
            slop = int(m.group("slop") or 0) if "SLOP" in flags else 0
            items.append(("operand", neg, "phrase", (m.group("phrase"), slop)))
            continue
        items.append(("operand", neg, "word", m.group("word")))

    # group operands: consecutive operands joined by '|' form one OR run
    groups: list[list[tuple]] = []  # each: list of operand items
    must_mark: list[bool] = []
    pending_plus = False
    pending_pipe = False
    for it in items:
        if it[0] == "drop":
            pending_plus = pending_pipe = False
            continue
        if it[0] == "op":
            if not groups:
                continue  # leading operator: no left operand, drop
            if it[1] == "+":
                pending_plus = True
            else:
                pending_pipe = True
            continue
        if pending_pipe and groups:
            groups[-1].append(it)
        else:
            groups.append([it])
            must_mark.append(False)
            if pending_plus and len(groups) >= 2:
                must_mark[-1] = must_mark[-2] = True
        pending_plus = pending_pipe = False

    out = ParsedQuery()
    for grp, is_must in zip(groups, must_mark):
        role = "must" if is_must else bare
        # negated operands always leave the group as must_not clauses
        members = [op for op in grp if not op[1]]
        for _, _, kind, payload in (op for op in grp if op[1]):
            _simple_lower(out, "must_not", kind, payload, cfg, flags)
        if not members:
            continue
        plain_words = [
            p for _, _, kind, p in members
            if kind == "word" and not _is_expansion(p, flags)
        ]
        if len(members) > 1 and len(plain_words) == len(members):
            toks: list[str] = []
            for w in plain_words:
                toks.extend(analyze_query(_unescape(w), cfg))
            if toks:
                out.terms.append(TermClause(role, toks))
            continue
        if len(members) > 1:
            # mixed OR run (phrase/expansion member): lenient fallback —
            # independent should clauses preserve "any member may match"
            for _, _, kind, payload in members:
                _simple_lower(out, "should", kind, payload, cfg, flags)
            continue
        _, _, kind, payload = members[0]
        _simple_lower(out, role, kind, payload, cfg, flags)
    return out


def _is_expansion(word: str, flags: frozenset) -> bool:
    if "PREFIX" in flags and word.endswith("*") and len(word) > 1:
        return True
    return "FUZZY" in flags and bool(re.match(r"^.+~\d*$", word))


def _simple_lower(
    out: ParsedQuery, role: str, kind: str, payload, cfg, flags
) -> None:
    """Lower one simple-syntax operand into ParsedQuery clause lists."""
    if kind == "phrase":
        text, slop = payload
        toks = analyze_query(text, cfg)
        if toks:
            out.phrases.append(PhraseClause(role, toks, slop))
        return
    word = payload
    if "PREFIX" in flags and word.endswith("*") and len(word) > 1:
        stem = _unescape(word[:-1]).lower()
        if stem and "*" not in stem and "~" not in stem:
            out.expands.append(ExpandClause(role, "prefix", stem))
            return
    zm = re.match(r"^(?P<stem>.+?)~(?P<n>\d*)$", word)
    if "FUZZY" in flags and zm and "*" not in word:
        stem = _unescape(zm.group("stem")).lower()
        if stem:
            out.expands.append(
                ExpandClause(role, "fuzzy", stem, int(zm.group("n") or 2))
            )
        return
    toks = analyze_query(_unescape(word), cfg)
    if toks:
        out.terms.append(TermClause(role, toks))


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
