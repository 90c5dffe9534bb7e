"""ES intervals query: minimal-interval semantics over the positional
index — the full source algebra beyond the flat ``intervals_match``
alias (match / any_of / all_of / prefix / wildcard sources plus the
containing / contained_by / overlapping filter family).

Semantics are the published minimal-interval model (Clarke & Cormack,
"Shortest-substring retrieval and ranking", TOIS 2000 — the algebra
Lucene's ``IntervalsSource`` implements):

Interval model
--------------
An interval is ``(doc, l, r, w)``: inclusive token positions plus ``w``,
the number of matched leaf positions inside it. ``gaps = max(0,
(r - l + 1) - w)`` — the unmatched slack (clamped: unordered sources may
legally overlap, double-counting a position). Every source yields, per
document, its MINIMAL interval set: an antichain under containment —
sorted by ``l``, both endpoints strictly increasing within a doc.

Sources (all vectorized on int64 ``doc * 2^B + pos`` packed keys; the
single Python loop is the per-doc unordered minimal-window sweep, the
same cost shape as the engine's unordered sloppy phrase):

  * term: every occurrence, ``(p, p, 1)``;
  * ``match(text, max_gaps, ordered)`` == ``all_of`` over the analyzed
    terms' point sources;
  * ``any_of``: union of the children's intervals with dominated
    (containing-another) intervals removed; equal ``(l, r)`` duplicates
    keep the max ``w``;
  * ``all_of(ordered=True)``: one interval per child, in order, DISJOINT
    (each child's interval starts after the previous child's ends —
    Lucene's ORDERED). Greedy-earliest chaining is exact: antichains are
    sorted in both endpoints, so the first child interval starting after
    the previous end is also the earliest-ending; the chained envelopes
    are then minimalized;
  * ``all_of(ordered=False)``: one interval per child, overlap allowed
    (Lucene's UNORDERED) — generalized minimal-window sweep: events
    sorted by interval end; per child track the latest (max-``l``)
    interval ending at or before the sweep point; once every child has
    one, the window ``[min latest-l, sweep end]`` is a candidate, and
    the same-left / tighter-same-right rules of the engine's
    ``_minimal_windows_freq`` reduce candidates to the minimal set;
  * ``prefix`` / ``wildcard`` / ``fuzzy``: the union of the expanded
    dictionary terms' point sources (expansion is alphabetical, capped
    at ``max_expansions`` — the phrase-prefix rewrite shape; fuzzy
    expands within a Levenshtein bound, Lucene Intervals.fuzzyTerm);
  * ``max_gaps`` filters AFTER minimalization (Lucene
    ``Intervals.maxgaps``): a gaps-rejected minimal interval does NOT
    resurrect a wider interval it dominated;
  * filters (``containing`` / ``not_containing`` / ``contained_by`` /
    ``not_contained_by`` / ``not_overlapping``): subset selections via
    the packed-key mask primitives shared with operators/spans.py — no
    re-minimalization after filtering (a filter output is a subset of an
    antichain, hence an antichain).

Scoring
-------
freq(doc) = sum over the final intervals of ``1 / (1 + gaps)``, f64
accumulation folding intervals in (doc, l, r) ascending order; idf = the
sum of per-term idfs over the MAIN source tree's leaf terms in AST order
(filter reference sides do not score — Lucene extracts terms from the
scoring source only); a prefix/wildcard leaf contributes one blended
idf(max df among its expansions), the Lucene blended-rewrite shape;
out-of-vocabulary leaves contribute nothing. BM25 as everywhere in the
engine: f64 accumulate, f32 emit, ties (score_f32 desc, doc_id asc).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import pandas as pd

from .phrase import _POS_BITS, _slot_keys
from .spans import containing_mask, overlap_mask, within_mask

_B = np.int64(1 << _POS_BITS)
_I64_MAX = np.iinfo(np.int64).max


# ------------------------------------------------------------------ AST
# Driver-side query spec: plain frozen dataclasses with a fluent filter
# API. Resolution (analysis, dictionary lookup, prefix expansion, idf)
# happens in plans/query.py; the kernel sees only resolved term_id trees.


@dataclass(frozen=True)
class IvSource:
    """Base interval source; the filter family reads left-to-right:
    ``a.containing(b)`` keeps intervals of ``a`` that contain an
    interval of ``b``."""

    def containing(self, reference: "IvSource") -> "IvFilter":
        return IvFilter(self, reference, "containing")

    def not_containing(self, reference: "IvSource") -> "IvFilter":
        return IvFilter(self, reference, "not_containing")

    def contained_by(self, reference: "IvSource") -> "IvFilter":
        return IvFilter(self, reference, "contained_by")

    def not_contained_by(self, reference: "IvSource") -> "IvFilter":
        return IvFilter(self, reference, "not_contained_by")

    def not_overlapping(self, reference: "IvSource") -> "IvFilter":
        return IvFilter(self, reference, "not_overlapping")


@dataclass(frozen=True)
class IvMatch(IvSource):
    text: str
    max_gaps: int = -1  # -1 = unbounded
    ordered: bool = False


@dataclass(frozen=True)
class IvAnyOf(IvSource):
    sources: tuple = field(default_factory=tuple)


@dataclass(frozen=True)
class IvAllOf(IvSource):
    sources: tuple = field(default_factory=tuple)
    max_gaps: int = -1
    ordered: bool = False


@dataclass(frozen=True)
class IvPrefix(IvSource):
    prefix: str
    max_expansions: int = 50


@dataclass(frozen=True)
class IvWildcard(IvSource):
    pattern: str
    max_expansions: int = 50


@dataclass(frozen=True)
class IvFuzzy(IvSource):
    term: str
    fuzziness: int = 1
    max_expansions: int = 50


@dataclass(frozen=True)
class IvFilter(IvSource):
    source: IvSource = None
    reference: IvSource = None
    rule: str = "containing"


class Iv:
    """Constructor namespace: ``Iv.match("big data", max_gaps=2,
    ordered=True)``, ``Iv.any_of(a, b)``, ``Iv.all_of([a, b],
    max_gaps=3, ordered=True)``, ``Iv.prefix("dat")``,
    ``Iv.wildcard("d?ta*")`` — then chain filters:
    ``Iv.match("a b").not_containing(Iv.match("c"))``."""

    @staticmethod
    def match(text: str, max_gaps: int = -1, ordered: bool = False) -> IvMatch:
        return IvMatch(text, max_gaps, ordered)

    @staticmethod
    def any_of(*sources: IvSource) -> IvAnyOf:
        return IvAnyOf(tuple(sources))

    @staticmethod
    def all_of(sources, max_gaps: int = -1, ordered: bool = False) -> IvAllOf:
        return IvAllOf(tuple(sources), max_gaps, ordered)

    @staticmethod
    def prefix(prefix: str, max_expansions: int = 50) -> IvPrefix:
        return IvPrefix(prefix, max_expansions)

    @staticmethod
    def wildcard(pattern: str, max_expansions: int = 50) -> IvWildcard:
        return IvWildcard(pattern, max_expansions)

    @staticmethod
    def fuzzy(term: str, fuzziness: int = 1, max_expansions: int = 50) -> IvFuzzy:
        return IvFuzzy(term, fuzziness, max_expansions)


# --------------------------------------------------------------- kernel


class Ivl(NamedTuple):
    """Minimal interval set within one shard: per doc an antichain,
    globally sorted by (doc, l) with r strictly increasing per doc."""

    doc: np.ndarray  # int64, shard-local
    l: np.ndarray  # int64
    r: np.ndarray  # int64
    w: np.ndarray  # int64, matched leaf positions inside


EMPTY_IVL = Ivl(
    np.empty(0, np.int64), np.empty(0, np.int64),
    np.empty(0, np.int64), np.empty(0, np.int64),
)


def decode_term_points(by_tid: dict, tids, base: int):
    """Decode each term's occurrences once: returns (points, dl_pairs)
    where ``points[tid] = (doc, pos)`` sorted by packed key and
    ``dl_pairs`` is a list of posting-level (docs, dls) arrays for the
    BM25 dl lookup (operators/spans.py ``merge_dl`` consumes it).
    Terms absent from the shard are absent from ``points``."""
    points: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    dl_pairs: list[tuple[np.ndarray, np.ndarray]] = []
    for tid in tids:
        block = by_tid.get(tid)
        if block is None:
            continue
        kk, docs0, dls0 = _slot_keys(block, 0, 1, base)
        pos = (kk & np.int64((1 << _POS_BITS) - 1)) - 1  # undo +n_slots(=1)
        doc = (kk >> np.int64(_POS_BITS)).astype(np.int64)
        points[tid] = (doc, pos)
        dl_pairs.append((docs0, dls0))
    return points, dl_pairs


def _points_ivl(points: dict, tids) -> Ivl:
    """Union of term point sources. Distinct terms occupy distinct
    positions, so the union is already an antichain — one packed sort."""
    parts = [points[t] for t in tids if t in points]
    if not parts:
        return EMPTY_IVL
    if len(parts) == 1:
        doc, pos = parts[0]
    else:
        doc = np.concatenate([p[0] for p in parts])
        pos = np.concatenate([p[1] for p in parts])
        order = np.argsort(doc * _B + pos, kind="stable")
        doc, pos = doc[order], pos[order]
    return Ivl(doc, pos, pos.copy(), np.ones(pos.size, np.int64))


def minimalize(doc, l, r, w) -> Ivl:
    """Reduce candidate intervals to the minimal antichain: drop any
    interval that (non-strictly) contains a DIFFERENT interval; equal
    (l, r) duplicates keep the max ``w`` (fewest gaps — deterministic).
    One lexsort + one suffix-min over packed (doc, r) keys."""
    if doc.size == 0:
        return EMPTY_IVL
    order = np.lexsort((-w, r, l, doc))
    doc, l, r, w = doc[order], l[order], r[order], w[order]
    # per (doc, l): first row has the min r (max w on (l, r) ties)
    first = np.concatenate(([True], (doc[1:] != doc[:-1]) | (l[1:] != l[:-1])))
    doc, l, r, w = doc[first], l[first], r[first], w[first]
    # drop i iff a later row (same doc, l' > l) has r' <= r; later docs
    # pack strictly above, so the suffix min can only hit the same doc
    key_r = doc * _B + r
    nxt = np.empty(doc.size, np.int64)
    nxt[-1] = _I64_MAX
    if doc.size > 1:
        nxt[:-1] = np.minimum.accumulate(key_r[::-1])[::-1][1:]
    keep = nxt > key_r
    return Ivl(doc[keep], l[keep], r[keep], w[keep])


def iv_any_of(parts: list[Ivl]) -> Ivl:
    parts = [p for p in parts if p.doc.size]
    if not parts:
        return EMPTY_IVL
    if len(parts) == 1:
        return parts[0]
    return minimalize(
        np.concatenate([p.doc for p in parts]),
        np.concatenate([p.l for p in parts]),
        np.concatenate([p.r for p in parts]),
        np.concatenate([p.w for p in parts]),
    )


def iv_all_of_ordered(parts: list[Ivl]) -> Ivl:
    """Greedy-earliest chain of one interval per child, in order,
    disjoint — vectorized: one searchsorted per child (the
    operators/phrase.py ``_ordered_spans`` pattern lifted from positions
    to intervals), then minimalize the surviving envelopes."""
    if any(p.doc.size == 0 for p in parts):
        return EMPTY_IVL
    lead = parts[0]
    doc, l0 = lead.doc, lead.l
    cur_end = lead.r.copy()
    w = lead.w.copy()
    alive = np.ones(doc.size, dtype=bool)
    for s in parts[1:]:
        skey = s.doc * _B + s.l  # sorted: antichain in (doc, l) order
        j = np.searchsorted(skey, doc * _B + cur_end, side="right")
        ok = j < skey.size
        jc = np.minimum(j, skey.size - 1)
        ok &= s.doc[jc] == doc
        alive &= ok
        cur_end = np.where(alive, s.r[jc], cur_end)
        w = np.where(alive, w + s.w[jc], w)
    return minimalize(doc[alive], l0[alive], cur_end[alive], w[alive])


def iv_all_of_unordered(parts: list[Ivl]) -> Ivl:
    """Minimal windows containing one interval from each child, overlap
    allowed. Candidate docs are pre-intersected (vectorized); the sweep
    itself is the per-doc Python loop of the engine's unordered sloppy
    phrase (`_minimal_windows_freq`), generalized from points to
    intervals: events sorted by interval end, per child the latest
    (max-l) ended interval, window = [min latest-l, sweep end]."""
    if any(p.doc.size == 0 for p in parts):
        return EMPTY_IVL
    n = len(parts)
    if n == 1:
        return parts[0]
    cand = None
    for p in parts:
        u = np.unique(p.doc)
        cand = u if cand is None else np.intersect1d(cand, u, assume_unique=True)
        if cand.size == 0:
            return EMPTY_IVL
    docs_a, r_a, l_a, w_a, src_a = [], [], [], [], []
    for s, p in enumerate(parts):
        m = np.isin(p.doc, cand)
        docs_a.append(p.doc[m])
        r_a.append(p.r[m])
        l_a.append(p.l[m])
        w_a.append(p.w[m])
        src_a.append(np.full(int(m.sum()), s, dtype=np.int64))
    doc = np.concatenate(docs_a)
    r = np.concatenate(r_a)
    l = np.concatenate(l_a)
    w = np.concatenate(w_a)
    src = np.concatenate(src_a)
    order = np.lexsort((src, l, r, doc))
    doc, r, l, w, src = doc[order], r[order], l[order], w[order], src[order]
    starts = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1])))
    ends = np.concatenate((starts[1:], [doc.size]))
    out_doc, out_l, out_r, out_w = [], [], [], []
    lo = np.iinfo(np.int64).min
    for a, b_ in zip(starts, ends):
        latest_l = np.full(n, lo, dtype=np.int64)
        latest_w = np.zeros(n, dtype=np.int64)
        seen = 0
        kept_l: list[int] = []
        kept_r: list[int] = []
        kept_w: list[int] = []
        for i in range(a, b_):
            s = src[i]
            if latest_l[s] == lo:
                seen += 1
            latest_l[s] = l[i]
            latest_w[s] = w[i]
            if seen < n:
                continue
            wl = int(latest_l.min())
            wr = int(r[i])
            ww = int(latest_w.sum())
            if kept_l and kept_l[-1] == wl:
                continue  # same left, earlier (smaller) right already kept
            if kept_r and kept_r[-1] == wr and wl > kept_l[-1]:
                kept_l[-1] = wl  # same right, tighter left supersedes
                kept_w[-1] = ww
                continue
            kept_l.append(wl)
            kept_r.append(wr)
            kept_w.append(ww)
        d = int(doc[a])
        out_doc.extend([d] * len(kept_l))
        out_l.extend(kept_l)
        out_r.extend(kept_r)
        out_w.extend(kept_w)
    return Ivl(
        np.asarray(out_doc, dtype=np.int64),
        np.asarray(out_l, dtype=np.int64),
        np.asarray(out_r, dtype=np.int64),
        np.asarray(out_w, dtype=np.int64),
    )


def iv_gaps(ivl: Ivl, max_gaps: int) -> Ivl:
    """Post-minimalization gaps filter (Lucene Intervals.maxgaps)."""
    if max_gaps < 0 or ivl.doc.size == 0:
        return ivl
    keep = np.maximum(ivl.r - ivl.l + 1 - ivl.w, 0) <= max_gaps
    return Ivl(ivl.doc[keep], ivl.l[keep], ivl.r[keep], ivl.w[keep])


def iv_filter(ivl: Ivl, ref: Ivl, rule: str) -> Ivl:
    """Filter family: subset selections via the spans.py mask
    primitives. An empty reference keeps everything for the negated
    rules and nothing for the positive ones."""
    if ivl.doc.size == 0:
        return ivl
    if ref.doc.size == 0:
        if rule in ("containing", "contained_by"):
            return EMPTY_IVL
        return ivl
    if rule == "containing":
        keep = containing_mask(ivl.doc, ivl.l, ivl.r, ref.doc, ref.l, ref.r)
    elif rule == "not_containing":
        keep = ~containing_mask(ivl.doc, ivl.l, ivl.r, ref.doc, ref.l, ref.r)
    elif rule == "contained_by":
        keep = within_mask(ivl.doc, ivl.l, ivl.r, ref.doc, ref.l, ref.r)
    elif rule == "not_contained_by":
        keep = ~within_mask(ivl.doc, ivl.l, ivl.r, ref.doc, ref.l, ref.r)
    elif rule == "not_overlapping":
        keep = ~overlap_mask(ivl.doc, ivl.l, ivl.r, ref.doc, ref.l, ref.r)
    else:  # pragma: no cover - resolution validates
        raise ValueError(f"unknown intervals filter rule: {rule}")
    return Ivl(ivl.doc[keep], ivl.l[keep], ivl.r[keep], ivl.w[keep])


def eval_resolved(node, points: dict) -> Ivl:
    """Evaluate a resolved (term_id-level) interval tree within one
    shard. Node forms (plain tuples — picklable into the kernel
    closure): ``("empty",)``, ``("points", (tid, ...))``, ``("any",
    (node, ...))``, ``("all", (node, ...), ordered)``, ``("gaps", node,
    max_gaps)``, ``("filter", node, ref_node, rule)``."""
    k = node[0]
    if k == "empty":
        return EMPTY_IVL
    if k == "points":
        return _points_ivl(points, node[1])
    if k == "any":
        return iv_any_of([eval_resolved(c, points) for c in node[1]])
    if k == "all":
        parts = [eval_resolved(c, points) for c in node[1]]
        if node[2]:
            return iv_all_of_ordered(parts)
        return iv_all_of_unordered(parts)
    if k == "gaps":
        return iv_gaps(eval_resolved(node[1], points), node[2])
    if k == "filter":
        return iv_filter(
            eval_resolved(node[1], points), eval_resolved(node[2], points), node[3]
        )
    raise ValueError(f"unknown resolved intervals node: {k}")  # pragma: no cover


def iv_freqs(ivl: Ivl):
    """Per-doc interval frequency: sum of 1/(1 + gaps) folded in f64
    over intervals in (doc, l, r) ascending order — Ivl's invariant
    order, so no re-sort. Returns (docs, freq_f64)."""
    if ivl.doc.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    gaps = np.maximum(ivl.r - ivl.l + 1 - ivl.w, 0).astype(np.float64)
    wt = 1.0 / (1.0 + gaps)
    starts = np.flatnonzero(
        np.concatenate(([True], ivl.doc[1:] != ivl.doc[:-1]))
    )
    freq = np.add.reduceat(wt, starts)
    return ivl.doc[starts], freq


# ----------------------------------------------------- highlight face


def _levenshtein(a: str, b: str, bound: int) -> int:
    """Small DP edit distance with an early exit above ``bound`` —
    highlight-local only (doc vocabularies are tiny)."""
    if abs(len(a) - len(b)) > bound:
        return bound + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            best = min(best, v)
        if best > bound:
            return bound + 1
        prev = cur
    return prev[-1]


def eval_over_tokens(source: IvSource, tokens: list[str], analyze) -> Ivl:
    """Evaluate an Iv AST over ONE document's analyzed token list — the
    highlight/explain face of the algebra. Runs the SAME numpy kernels
    as the shard kernel (point sources built from token positions), so
    the intervals a highlighter marks are exactly the intervals the
    scorer weighted. ``analyze`` maps a match text to its term list
    (pass ``lambda t: analyze_query(t, cfg)``).

    Expansion leaves (prefix / wildcard / fuzzy) expand against the
    DOCUMENT's own vocabulary here (alphabetical, same max_expansions
    cap) — the local stand-in for the query path's dictionary
    expansion; a dictionary-expanded term absent from this doc could
    never produce an interval in it anyway. The one divergence is the
    cap's universe (doc vocab vs corpus dictionary), documented."""
    import re as _re

    arr = np.asarray(tokens, dtype=object)

    def points_of(terms: list[str]) -> dict[str, Ivl]:
        out = {}
        for t in set(terms):
            pos = np.flatnonzero(arr == t).astype(np.int64)
            if pos.size:
                out[t] = Ivl(
                    np.zeros(pos.size, np.int64), pos, pos.copy(),
                    np.ones(pos.size, np.int64),
                )
        return out

    def union_points(terms: list[str]) -> Ivl:
        pts = points_of(terms)
        return iv_any_of([pts[t] for t in sorted(pts)])

    def ev(n) -> Ivl:
        if isinstance(n, IvMatch):
            terms = analyze(n.text)
            if not terms:
                raise ValueError("an intervals match analyzed to zero terms")
            pts = points_of(terms)
            if any(t not in pts for t in terms):
                return EMPTY_IVL
            if len(terms) == 1:
                return pts[terms[0]]
            parts = [pts[t] for t in terms]
            out = (
                iv_all_of_ordered(parts) if n.ordered
                else iv_all_of_unordered(parts)
            )
            return iv_gaps(out, n.max_gaps) if n.max_gaps >= 0 else out
        if isinstance(n, IvPrefix):
            cand = sorted(
                {t for t in tokens if t.startswith(n.prefix.lower())}
            )[: n.max_expansions]
            return union_points(cand)
        if isinstance(n, IvWildcard):
            rx = "^" + "".join(
                ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
                for ch in n.pattern.lower()
            ) + "$"
            cand = sorted({t for t in tokens if _re.match(rx, t)})[
                : n.max_expansions
            ]
            return union_points(cand)
        if isinstance(n, IvFuzzy):
            base = n.term.lower()
            cand = sorted(
                {t for t in tokens if _levenshtein(t, base, n.fuzziness) <= n.fuzziness}
            )[: n.max_expansions]
            return union_points(cand)
        if isinstance(n, IvAnyOf):
            return iv_any_of([ev(c) for c in n.sources])
        if isinstance(n, IvAllOf):
            parts = [ev(c) for c in n.sources]
            if any(p.doc.size == 0 for p in parts):
                return EMPTY_IVL
            out = (
                iv_all_of_ordered(parts) if n.ordered
                else iv_all_of_unordered(parts)
            )
            return iv_gaps(out, n.max_gaps) if n.max_gaps >= 0 else out
        if isinstance(n, IvFilter):
            src = ev(n.source)
            ref = ev(n.reference)
            return iv_filter(src, ref, n.rule)
        raise TypeError(f"not an Iv source: {type(n).__name__}")

    return ev(source)


def merge_token_ranges(ivl: Ivl) -> list[tuple[int, int]]:
    """Overlap-merge an interval set into disjoint [l, r] token ranges
    (the highlight cover: one <em> span per merged range)."""
    if ivl.doc.size == 0:
        return []
    order = np.lexsort((ivl.r, ivl.l))
    out: list[tuple[int, int]] = []
    for i in order:
        l, r = int(ivl.l[i]), int(ivl.r[i])
        if out and l <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], r))
        else:
            out.append((l, r))
    return out
