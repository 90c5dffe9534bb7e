"""Lucene span-query composition: span_or, span_not, span_containing,
span_within over the positional index (the family beyond span_near /
span_first, which plans/query.py already serves).

Span model
----------
A span is ``(doc, start, end)`` — inclusive token positions — plus its
``gap`` = (end - start) - (n_terms - 1), the slack Lucene's sloppy
weighting charges. Clause spans:

  * single term: every occurrence, (p, p), gap 0;
  * multi term: ordered span_near via the engine's greedy-earliest chain
    (operators/phrase.py ``_ordered_spans`` — the SAME matcher
    phrase_query/span_near use, so span freq == phrase freq by
    construction): start = the slot-0 position, end = the matched last
    slot's position, gap <= slop admitted.

Composition (all vectorized on int64 ``doc * 2^B + pos`` packed keys —
no Python loop over docs or spans):

  * span_or: the union of the clauses' spans (identical spans produced
    by two clauses are BOTH kept — each clause matched);
  * span_not(include, exclude, pre, post): include spans with NO exclude
    span overlapping [start - pre, end + post] (Lucene SpanNotQuery's
    pre/post slack);
  * span_containing(big, little): big spans containing >= 1 little span;
  * span_within(little, big): little spans contained in >= 1 big span.

The overlap/containment tests are one sort + one prefix-max (or
suffix-min) + one searchsorted over packed keys: a prefix max of
``doc*2^B + end`` among excludes with ``start <= probe`` can only
reach a probe in the same doc (earlier docs pack strictly below), so
per-doc grouping falls out of the key arithmetic.

Scoring (Lucene SpanScorer sloppy freq): freq(doc) = sum over the doc's
surviving spans of 1 / (1 + gap) — term spans weigh 1, a slop-stretched
chain weighs less; the f64 accumulation folds spans in (doc, start, end,
gap) ascending order (np.add.reduceat, sequential), the engine's
byte-stable contract. idf = the sum of per-term idfs of the SCORING
side's terms (span_or: all clauses; span_not: include; containing: big;
within: little — Lucene builds the SpanWeight's similarity from exactly
those extracted terms). BM25 as everywhere else: f64 accumulate, f32
emit, ties (score_f32 desc, doc_id asc).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd

from .phrase import _POS_BITS, _ordered_spans, _slot_keys

_B = np.int64(1 << _POS_BITS)
_POS_MAX = np.int64((1 << _POS_BITS) - 1)


class Spans(NamedTuple):
    """Per-span arrays within one shard (doc is shard-local)."""

    doc: np.ndarray  # int64
    start: np.ndarray  # int64
    end: np.ndarray  # int64
    gap: np.ndarray  # int64, (end-start) - (n_terms-1)


EMPTY_SPANS = Spans(
    np.empty(0, np.int64), np.empty(0, np.int64),
    np.empty(0, np.int64), np.empty(0, np.int64),
)


def clause_spans(slot_blocks: list[pd.DataFrame], base: int, slop: int = 0):
    """Extract one clause's spans within a shard.

    ``slot_blocks``: one postings-blocks frame per term of the clause, in
    clause order. Returns ``(Spans, dl_docs, dl_vals)`` — dl arrays are
    slot-0's posting-level doc->length map (every span doc occurs in
    every slot, so slot 0 covers all span docs)."""
    if any(b_.empty for b_ in slot_blocks):
        return EMPTY_SPANS, np.empty(0, np.int64), np.empty(0, np.int64)
    if len(slot_blocks) == 1:
        kk, docs0, dls0 = _slot_keys(slot_blocks[0], 0, 1, base)
        pos = (kk & _POS_MAX) - 1  # undo the +n_slots(=1) slot encoding
        doc = (kk >> _POS_BITS).astype(np.int64)
        return Spans(doc, pos, pos.copy(), np.zeros(pos.size, np.int64)), docs0, dls0
    doc, p0, pe, docs0, dls0 = _ordered_spans(slot_blocks, base, slop)
    gap = (pe - p0) - np.int64(len(slot_blocks) - 1)
    return Spans(doc, p0, pe, gap), docs0, dls0


def span_or(parts: list[Spans]) -> Spans:
    """Union of the clauses' spans, sorted (doc, start, end, gap) asc —
    the deterministic fold order the scorer consumes."""
    parts = [p for p in parts if p.doc.size]
    if not parts:
        return EMPTY_SPANS
    doc = np.concatenate([p.doc for p in parts])
    start = np.concatenate([p.start for p in parts])
    end = np.concatenate([p.end for p in parts])
    gap = np.concatenate([p.gap for p in parts])
    order = np.lexsort((gap, end, start, doc))
    return Spans(doc[order], start[order], end[order], gap[order])


def overlap_mask(
    adoc: np.ndarray, alo: np.ndarray, ahi: np.ndarray,
    bdoc: np.ndarray, bs: np.ndarray, be: np.ndarray,
) -> np.ndarray:
    """Per A-row: does some B interval (s, e) in the same doc overlap
    [alo, ahi]? Overlap iff s <= ahi and e >= alo. One sort + prefix max
    of packed ends + one searchsorted; an earlier doc's packed end is
    strictly below this doc's range, so per-doc grouping falls out of the
    key arithmetic. B must be non-empty."""
    order = np.lexsort((be, bs, bdoc))
    b_start_key = bdoc[order] * _B + bs[order]
    b_end_pmax = np.maximum.accumulate(bdoc[order] * _B + be[order])
    j = np.searchsorted(b_start_key, adoc * _B + ahi, side="right")
    out = np.zeros(adoc.size, dtype=bool)
    has = j > 0
    out[has] = b_end_pmax[j[has] - 1] >= (adoc[has] * _B + alo[has])
    return out


def containing_mask(
    bdoc: np.ndarray, bs: np.ndarray, be: np.ndarray,
    ldoc: np.ndarray, ls: np.ndarray, le: np.ndarray,
) -> np.ndarray:
    """Per big-row: does it contain some little interval (little.s >=
    big.s and little.e <= big.e, same doc)? Suffix min of packed little
    ends among starts >= big.start. Little must be non-empty."""
    order = np.lexsort((le, ls, ldoc))
    li_start_key = ldoc[order] * _B + ls[order]
    li_end_key = ldoc[order] * _B + le[order]
    smin = np.minimum.accumulate(li_end_key[::-1])[::-1]
    i = np.searchsorted(li_start_key, bdoc * _B + bs, side="left")
    ok = i < li_start_key.size
    ic = np.minimum(i, li_start_key.size - 1)
    ok &= smin[ic] <= bdoc * _B + be
    return ok


def within_mask(
    ldoc: np.ndarray, ls: np.ndarray, le: np.ndarray,
    bdoc: np.ndarray, bs: np.ndarray, be: np.ndarray,
) -> np.ndarray:
    """Per little-row: is it contained in some big interval (big.s <=
    little.s and big.e >= little.e, same doc)? Prefix max of packed big
    ends among starts <= little.start. Big must be non-empty."""
    order = np.lexsort((be, bs, bdoc))
    bg_start_key = bdoc[order] * _B + bs[order]
    bg_end_pmax = np.maximum.accumulate(bdoc[order] * _B + be[order])
    j = np.searchsorted(bg_start_key, ldoc * _B + ls, side="right")
    ok = j > 0
    jc = np.maximum(j - 1, 0)
    ok &= bg_end_pmax[jc] >= ldoc * _B + le
    return ok


def span_not(inc: Spans, exc: Spans, pre: int = 0, post: int = 0) -> Spans:
    """Include spans with no exclude span overlapping
    [start - pre, end + post]."""
    if inc.doc.size == 0 or exc.doc.size == 0:
        return inc
    hi = np.minimum(inc.end + np.int64(post), _POS_MAX)
    lo = np.maximum(inc.start - np.int64(pre), np.int64(0))
    keep = ~overlap_mask(inc.doc, lo, hi, exc.doc, exc.start, exc.end)
    return Spans(inc.doc[keep], inc.start[keep], inc.end[keep], inc.gap[keep])


def span_containing(big: Spans, little: Spans) -> Spans:
    """Big spans that contain at least one little span."""
    if big.doc.size == 0 or little.doc.size == 0:
        return EMPTY_SPANS
    ok = containing_mask(
        big.doc, big.start, big.end, little.doc, little.start, little.end
    )
    return Spans(big.doc[ok], big.start[ok], big.end[ok], big.gap[ok])


def span_within(little: Spans, big: Spans) -> Spans:
    """Little spans contained in at least one big span."""
    if little.doc.size == 0 or big.doc.size == 0:
        return EMPTY_SPANS
    ok = within_mask(
        little.doc, little.start, little.end, big.doc, big.start, big.end
    )
    return Spans(little.doc[ok], little.start[ok], little.end[ok], little.gap[ok])


def span_freqs(spans: Spans):
    """Per-doc sloppy span frequency: sum of 1/(1+gap) folded in f64 over
    spans sorted (doc, start, end, gap) asc. Returns (docs, freq_f64)."""
    if spans.doc.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    order = np.lexsort((spans.gap, spans.end, spans.start, spans.doc))
    d = spans.doc[order]
    wt = 1.0 / (1.0 + spans.gap[order].astype(np.float64))
    starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
    freq = np.add.reduceat(wt, starts)
    return d[starts], freq


def merge_dl(pairs) -> tuple[np.ndarray, np.ndarray]:
    """Union posting-level (docs, dls) maps from several clauses into one
    sorted-unique lookup (docs sorted asc for searchsorted)."""
    pairs = [(d, v) for d, v in pairs if d.size]
    if not pairs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs = np.concatenate([d for d, _ in pairs])
    dls = np.concatenate([v for _, v in pairs])
    order = np.argsort(docs, kind="stable")
    docs, dls = docs[order], dls[order]
    keep = np.concatenate(([True], docs[1:] != docs[:-1]))
    return docs[keep], dls[keep]


def bm25_topk_frame(
    docs: np.ndarray,
    tf: np.ndarray,
    dl_docs: np.ndarray,
    dl_vals: np.ndarray,
    sum_idf: float,
    base: int,
    k: int,
    avgdl: float,
    k1: float,
    b: float,
) -> pd.DataFrame:
    """Shard-local BM25 top-k over (doc_local, f64 tf) candidates — the
    same select-then-order shape as the phrase scorers: f32 scores,
    partition at k, ties (score_f32 desc, doc_id asc)."""
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "score": pd.Series([], dtype=np.float32)}
    )
    if docs.size == 0:
        return empty
    dl = dl_vals[np.searchsorted(dl_docs, docs)].astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    s32 = (sum_idf * tf * (k1 + 1.0) / denom).astype(np.float32)
    if docs.size > k:
        kth = np.partition(-s32, k - 1)[k - 1]
        sup = np.flatnonzero(-s32 <= kth)
        order = sup[np.lexsort((docs[sup], -s32[sup].astype(np.float64)))][:k]
    else:
        order = np.lexsort((docs, -s32.astype(np.float64)))[:k]
    return pd.DataFrame(
        {"doc_id": (docs[order] + base).astype(np.int64), "score": s32[order]}
    )
