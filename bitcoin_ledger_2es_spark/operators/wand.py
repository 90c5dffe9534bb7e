"""Per-shard top-k scoring: block-max WAND + vectorized exact scorer (C7-C9).

Sharding mirrors Elasticsearch's architecture: every shard holds the full
posting data for its contiguous doc_id range, so top-k within a shard is
exact and shards are embarrassingly parallel; the coordinator (driver)
merges per-shard heaps rank-stably (SURVEY.md §3.2/§3.4, B20).

Posting blocks are impact-style: they inline the exact doc lengths, so the
scorer is self-contained — a query reads ONLY the (term-pruned) postings,
never the docmap (no per-query Arrow shipping of doc metadata).

Two rank-identical scorers:

  * ``score_shard_bmw`` — document-at-a-time WAND with per-block max-score
    skipping (Ding & Suel, SIGIR 2011): blocks whose upper bound cannot
    beat the running threshold theta are never decoded. Wins when posting
    lists are long (head terms at 100 TB scale).
  * ``score_shard_exact`` — decode all candidate blocks, one fused numpy
    pass over a dense per-shard score array. Wins when the candidate set
    is small; also the oracle-shaped reference for the BMW path.

Both honor the determinism contract (functions/bm25.py): f64 accumulation
in ascending term_id order, f32 emission, ties (score desc, doc_id asc).
Safety of pruning under f32 quantization: stored block maxes are rounded
UP one ulp and upper-bound sums are inflated by 1e-6 relative before the
strict ``> theta`` comparison, so a pruned document provably cannot enter
the heap; evaluation of survivors is exact.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from ..functions.bm25 import contrib
from ..functions.codec import decode_doc_gaps, decode_tfs, decode_varints

_INF = np.int64(2**62)
_UB_SLACK = 1.0 + 1e-6


class _TermList:
    """Cursor over one term's posting blocks within a shard (lazy decode)."""

    __slots__ = (
        "term_id", "idf", "weight", "firsts", "lasts", "ns", "maxs",
        "deltas", "tfbufs", "dlbufs", "bi", "docs", "tfs", "dls", "ii",
        "cur", "sigma",
    )

    def __init__(self, term_id, t_idf, weight, blocks: pd.DataFrame):
        b = blocks.sort_values("block_id")
        self.term_id = term_id
        self.idf = float(t_idf)
        self.weight = float(weight)
        self.firsts = b["first_doc_id"].to_numpy(np.int64)
        self.lasts = b["last_doc_id"].to_numpy(np.int64)
        self.ns = b["n_docs"].to_numpy(np.int64)
        self.maxs = b["block_max_score"].to_numpy(np.float64)
        self.deltas = b["doc_id_deltas"].tolist()
        self.tfbufs = b["tfs"].tolist()
        self.dlbufs = b["dls"].tolist()
        self.bi = -1
        self.docs = self.tfs = self.dls = None
        self.ii = 0
        self.cur = _INF
        self.sigma = self.weight * float(self.maxs.max())  # shard-local list bound
        self._load(0)

    def _load(self, bi: int):
        if bi >= len(self.firsts):
            self.bi = len(self.firsts)
            self.cur = _INF
            return
        self.bi = bi
        self.docs = decode_doc_gaps(self.deltas[bi], int(self.firsts[bi]), int(self.ns[bi]))
        self.tfs = decode_tfs(self.tfbufs[bi])
        self.dls = decode_tfs(self.dlbufs[bi])
        self.ii = 0
        self.cur = self.docs[0]

    def block_max(self) -> float:
        """Upper bound (weighted) for any doc at/after cur in current block."""
        if self.bi >= len(self.firsts):
            return 0.0
        return self.weight * self.maxs[self.bi]

    def next(self):
        """Advance one posting."""
        self.ii += 1
        if self.docs is not None and self.ii < len(self.docs):
            self.cur = self.docs[self.ii]
        else:
            self._load(self.bi + 1)

    def seek(self, target: np.int64):
        """Advance to first doc >= target, skipping whole blocks undecoded."""
        if self.cur >= target:
            return
        bi = self.bi
        # skip blocks whose last doc < target WITHOUT decoding
        if self.lasts[bi] < target:
            bi = int(np.searchsorted(self.lasts, target, side="left"))
            if bi >= len(self.firsts):
                self.bi = bi
                self.cur = _INF
                return
            self._load(bi)
        j = int(np.searchsorted(self.docs, target, side="left"))
        if j < len(self.docs):
            self.ii = j
            self.cur = self.docs[j]
        else:
            self._load(self.bi + 1)

    def tf_at_cur(self) -> int:
        return int(self.tfs[self.ii])

    def dl_at_cur(self) -> int:
        return int(self.dls[self.ii])


def _push(heap, k, score32: np.float32, doc_id: int) -> float:
    """Maintain min-heap of (score_f32, -doc_id); return new theta."""
    item = (float(score32), -int(doc_id))
    if len(heap) < k:
        heapq.heappush(heap, item)
    elif item > heap[0]:
        heapq.heapreplace(heap, item)
    return heap[0][0] if len(heap) == k else -np.inf


def _after_ok(score32: np.float32, doc_id: int, after) -> bool:
    """ES search_after admission: keep only hits ranked STRICTLY after the
    cursor under the engine's total order (score_f32 desc, doc_id asc)."""
    if after is None:
        return True
    s, d = after
    fs = float(score32)
    return fs < s or (fs == s and int(doc_id) > d)


def _score_doc(lists_at_doc: list[_TermList], avgdl: float, k1: float, b: float) -> np.float32:
    """Exact doc score: f64 accumulation in ascending term_id order."""
    s = 0.0
    dl = np.float64(lists_at_doc[0].dl_at_cur())
    for tl in sorted(lists_at_doc, key=lambda t: t.term_id):
        s += tl.weight * float(contrib(np.float64(tl.tf_at_cur()), dl, tl.idf, avgdl, k1, b))
    return np.float32(s)


def _emit(heap) -> pd.DataFrame:
    items = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return pd.DataFrame(
        {
            "doc_id": np.array([-d for _, d in items], dtype=np.int64),
            "score": np.array([s for s, _ in items], dtype=np.float32),
        }
    )


def score_shard_bmw(
    term_lists: list[_TermList],
    k: int,
    avgdl: float,
    k1: float,
    b: float,
    after: tuple[float, int] | None = None,
) -> pd.DataFrame:
    """Exact top-k via block-max WAND (OR / weak-AND semantics).
    ``after``: ES search_after cursor (score_f32, doc_id) — only hits
    strictly after it in rank order are admitted (deep pagination without
    materializing earlier pages)."""
    heap: list[tuple[float, int]] = []
    theta = -np.inf
    lists = [t for t in term_lists if t.cur < _INF]
    while lists:
        lists.sort(key=lambda t: t.cur)
        # pivot: first prefix whose sigma-sum could beat theta
        acc, pivot = 0.0, -1
        for i, tl in enumerate(lists):
            acc += tl.sigma
            if acc * _UB_SLACK > theta:
                pivot = i
                break
        if pivot == -1:
            break  # no prefix can beat theta -> done
        pivot_doc = lists[pivot].cur
        if pivot_doc >= _INF:
            break
        if lists[0].cur == pivot_doc:
            # aligned: lists[0..m] sit on pivot_doc; BMW refinement check
            at_doc = [tl for tl in lists if tl.cur == pivot_doc]
            ub = sum(tl.block_max() for tl in at_doc)
            if len(heap) < k or ub * _UB_SLACK > theta:
                s32 = _score_doc(at_doc, avgdl, k1, b)
                if _after_ok(s32, int(pivot_doc), after):
                    theta = _push(heap, k, s32, int(pivot_doc))
            for tl in at_doc:
                tl.next()
        else:
            # not aligned: seek the lagging list up to the pivot doc
            lists[0].seek(pivot_doc)
        lists = [t for t in lists if t.cur < _INF]
    return _emit(heap)


def score_shard_conjunction(
    term_lists: list[_TermList],
    k: int,
    avgdl: float,
    k1: float,
    b: float,
    after: tuple[float, int] | None = None,
) -> pd.DataFrame:
    """Exact top-k for bool-must (AND): lead with the rarest list, block-skip
    seek the others; score docs present in every list."""
    heap: list[tuple[float, int]] = []
    if not term_lists or any(t.cur >= _INF for t in term_lists):
        return _emit(heap)
    lead = min(term_lists, key=lambda t: len(t.firsts))
    others = [t for t in term_lists if t is not lead]
    while lead.cur < _INF:
        target = lead.cur
        ok = True
        for tl in others:
            tl.seek(target)
            if tl.cur != target:
                ok = False
                if tl.cur >= _INF:
                    return _emit(heap)
                lead.seek(tl.cur)
                break
        if ok:
            s32 = _score_doc(term_lists, avgdl, k1, b)
            if _after_ok(s32, int(target), after):
                _push(heap, k, s32, int(target))
            lead.next()
    return _emit(heap)


def _decode_term_blocks(blocks: pd.DataFrame, shard_base: int):
    """Decode one term's blocks -> (local_docs, tfs, dls) numpy arrays.

    Batch-vectorized across the term's blocks: each varint stream is
    decoded in ONE pass over the concatenated block buffers (varints are
    self-delimiting, so concatenated streams decode to the concatenated
    values; the per-block python loop paid ~30 numpy-call overheads per
    128-posting block). doc_ids come back from the gap streams via an
    exact segmented integer cumsum seeded with each block's absolute
    first_doc_id."""
    nb = len(blocks)
    if nb == 0:
        return None
    npb = blocks["n_docs"].to_numpy(np.int64)
    n_post = int(npb.sum())
    firsts = blocks["first_doc_id"].to_numpy(np.int64)
    gaps = decode_varints(b"".join(blocks["doc_id_deltas"])).astype(np.int64)
    tfs = decode_tfs(b"".join(blocks["tfs"]))
    dls = decode_tfs(b"".join(blocks["dls"]))
    starts = np.concatenate(([0], np.cumsum(npb)[:-1]))
    is_start = np.zeros(n_post, dtype=bool)
    is_start[starts] = True
    vals = np.empty(n_post, dtype=np.int64)
    vals[~is_start] = gaps
    vals[is_start] = firsts
    cs = np.cumsum(vals)
    # cancel the running carry at each block start so every block's
    # cumsum restarts from its absolute first_doc_id (exact in int64)
    docs = cs - np.repeat(cs[starts] - firsts, npb)
    return docs - shard_base, tfs, dls


def decode_term_contrib(
    blocks: pd.DataFrame, shard_base: int, t_idf: float,
    avgdl: float, k1: float, b: float,
):
    """Decode one term's blocks and compute its UNWEIGHTED per-posting
    f64 BM25 contribution once: (local_docs, contrib). The inline scorer
    computes ``weight * contrib(tfs, dls, idf, ...)``; callers multiply
    the same weight onto this shared base — elementwise-identical f64.
    Lets the msearch batch kernel share one decode+score per term across
    every query that uses it."""
    dec = _decode_term_blocks(blocks, shard_base)
    if dec is None:
        return None
    docs, tfs, dls = dec
    return docs, contrib(tfs, dls, t_idf, avgdl, k1, b)


def score_shard_bool(
    must_meta: list[tuple[int, float, float, pd.DataFrame]],
    should_meta: list[tuple[int, float, float, pd.DataFrame]],
    excl_blocks: list[pd.DataFrame],
    shard_base: int,
    span: int,
    allowed: np.ndarray | None,
    k: int,
    min_should: int,
    avgdl: float,
    k1: float,
    b: float,
    after: tuple[float, int] | None = None,
) -> pd.DataFrame:
    """ES bool query within one shard (B4 full surface): ``must`` clauses
    all required and scoring, ``should`` clauses scoring with at least
    ``min_should`` matching (Lucene minimum_should_match), ``must_not``
    postings building a non-scoring forbidden mask — the same exclusion
    shape as the ``allowed`` filter mask, derived from postings instead of
    docmap columns. Scores accumulate f64 in ascending term_id order over
    the union of scoring clauses (the engine's standard determinism
    contract); ties (score_f32 desc, doc_id asc)."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "score": pd.Series([], dtype=np.float32)})
    if not must_meta and not should_meta:
        # a shard whose pruned scan carried ONLY must_not postings has no
        # scoring clause here: without this guard the mask would default
        # to all-ones and emit every doc in the span as a score-0 ghost
        return empty
    scores = np.zeros(span, dtype=np.float64)
    seen_must = np.zeros(span, dtype=np.int32)
    seen_should = np.zeros(span, dtype=np.int32)

    # scoring pass: one combined weight per term_id (a term in both must
    # and should scores once per clause — ES sums clause scores), strict
    # ascending-term_id accumulation across the union
    by_tid: dict[int, dict] = {}
    for role, metas in (("must", must_meta), ("should", should_meta)):
        for tid, t_idf, w, blocks in metas:
            e = by_tid.setdefault(tid, {"idf": t_idf, "w": 0.0, "blocks": blocks,
                                        "must": False, "should": False})
            e["w"] += w
            e[role] = True
    for tid in sorted(by_tid):
        e = by_tid[tid]
        dec = _decode_term_blocks(e["blocks"], shard_base)
        if dec is None:
            continue
        docs, tfs, dls = dec
        scores[docs] += e["w"] * contrib(tfs, dls, e["idf"], avgdl, k1, b)
        if e["must"]:
            seen_must[docs] += 1
        if e["should"]:
            seen_should[docs] += 1

    n_must = sum(1 for _ in must_meta)
    mask = seen_must == n_must if n_must else np.ones(span, dtype=bool)
    if min_should > 0:
        mask &= seen_should >= min_should
    elif n_must == 0 and should_meta:
        mask &= seen_should > 0  # pure-should bool: at least one clause
    for blocks in excl_blocks:
        dec = _decode_term_blocks(blocks, shard_base)
        if dec is not None:
            mask[dec[0]] = False
    if allowed is not None:
        mask &= allowed
    if after is not None:
        s_cut, d_cut = np.float32(after[0]), int(after[1])
        s32_all = scores.astype(np.float32)
        ids = np.arange(span, dtype=np.int64) + shard_base
        mask &= (s32_all < s_cut) | ((s32_all == s_cut) & (ids > d_cut))

    cand = np.flatnonzero(mask)
    if cand.size == 0:
        return empty
    s32 = scores[cand].astype(np.float32)
    if cand.size > k:
        kth = np.partition(-s32, k - 1)[k - 1]
        sup = np.flatnonzero(-s32 <= kth)
        order = sup[np.lexsort((cand[sup], -s32[sup].astype(np.float64)))][:k]
    else:
        order = np.lexsort((cand, -s32.astype(np.float64)))[:k]
    return pd.DataFrame(
        {
            "doc_id": (cand[order] + shard_base).astype(np.int64),
            "score": s32[order],
        }
    )


def score_shard_qs(
    term_meta: list[tuple[int, float, float, pd.DataFrame]],
    must_groups: list[list[int]],
    should_groups: list[list[int]],
    excl_blocks: list[pd.DataFrame],
    phrase_meta: list[tuple[list[pd.DataFrame], float, float, str, int, bool]],
    shard_base: int,
    span: int,
    allowed: np.ndarray | None,
    k: int,
    min_should: int,
    avgdl: float,
    k1: float,
    b: float,
    after: tuple[float, int] | None = None,
) -> pd.DataFrame:
    """Lucene classic query_string within one shard: the bool kernel
    generalized to CLAUSE GROUPS and embedded phrase clauses.

    * ``term_meta``: every scoring term once — (term_id, idf, weight,
      blocks), weight pre-summed across clauses (a term in two clauses
      scores twice, as in ES bool).
    * ``must_groups`` / ``should_groups``: each entry is the term_id set
      of ONE clause; a multi-term expansion (``pre*`` -> 50 terms) or a
      multi-token analyzed clause is a single group that counts as
      matched when ANY member matches (Lucene BooleanQuery counts
      clauses, not terms). Groups may reference term_ids absent from
      this shard's scan — those members simply never match here.
    * ``phrase_meta``: (slot_blocks, sum_idf, weight, role, slop,
      ordered) per phrase clause; role in must/should/must_not. Phrase
      score = BM25 with tf = phrase freq (operators/phrase.py); a must
      phrase counts toward the must total, a must_not phrase extends the
      exclusion mask.

    Determinism contract extension: f64 accumulation runs ascending
    term_id over ``term_meta`` FIRST, then phrase clauses in query
    order — mirrored by the DuckDB oracle's left-to-right ``+`` of the
    term-sum and phrase contributions. Ties (score_f32 desc, doc_id asc).
    """
    from .phrase import phrase_doc_freqs

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "score": pd.Series([], dtype=np.float32)})
    if not term_meta and not any(p[3] != "must_not" for p in phrase_meta):
        return empty  # no scoring clause reached this shard
    scores = np.zeros(span, dtype=np.float64)
    tid_docs: dict[int, np.ndarray] = {}
    for tid, t_idf, w, blocks in sorted(term_meta, key=lambda m: m[0]):
        dec = _decode_term_blocks(blocks, shard_base)
        if dec is None:
            continue
        docs, tfs, dls = dec
        scores[docs] += w * contrib(tfs, dls, t_idf, avgdl, k1, b)
        tid_docs[tid] = docs
    phrase_hits: list[tuple[str, np.ndarray]] = []
    for slot_blocks, sum_idf, w, role, slop, ordered in phrase_meta:
        docs, pf, dl_docs, dl_vals = phrase_doc_freqs(
            slot_blocks, shard_base, slop, ordered
        )
        if docs.size and role != "must_not":
            dl = dl_vals[np.searchsorted(dl_docs, docs)].astype(np.float64)
            scores[docs] += (
                w * sum_idf * pf * (k1 + 1.0)
                / (pf + k1 * (1.0 - b + b * dl / avgdl))
            )
        phrase_hits.append((role, docs))

    def group_mask(tids: list[int]) -> np.ndarray:
        m = np.zeros(span, dtype=bool)
        for tid in tids:
            d = tid_docs.get(tid)
            if d is not None:
                m[d] = True
        return m

    # membership: n_must counts EVERY must clause in the query (including
    # ones whose terms are absent from this shard — a doc here cannot
    # contain them, so the shard correctly emits nothing)
    n_must = len(must_groups) + sum(1 for r, _ in phrase_hits if r == "must")
    seen_must = np.zeros(span, dtype=np.int32)
    for g in must_groups:
        seen_must += group_mask(g)
    seen_should = np.zeros(span, dtype=np.int32)
    for g in should_groups:
        seen_should += group_mask(g)
    n_should = len(should_groups) + sum(1 for r, _ in phrase_hits if r == "should")
    for role, docs in phrase_hits:
        if role == "must":
            seen_must[docs] += 1
        elif role == "should":
            seen_should[docs] += 1

    mask = seen_must == n_must if n_must else np.ones(span, dtype=bool)
    if min_should > 0:
        mask &= seen_should >= min_should
    elif n_must == 0 and n_should:
        mask &= seen_should > 0  # pure-should: at least one clause
    for blocks in excl_blocks:
        dec = _decode_term_blocks(blocks, shard_base)
        if dec is not None:
            mask[dec[0]] = False
    for role, docs in phrase_hits:
        if role == "must_not":
            mask[docs] = False
    if allowed is not None:
        mask &= allowed
    if after is not None:
        s_cut, d_cut = np.float32(after[0]), int(after[1])
        s32_all = scores.astype(np.float32)
        ids = np.arange(span, dtype=np.int64) + shard_base
        mask &= (s32_all < s_cut) | ((s32_all == s_cut) & (ids > d_cut))

    cand = np.flatnonzero(mask)
    if cand.size == 0:
        return empty
    s32 = scores[cand].astype(np.float32)
    if cand.size > k:
        kth = np.partition(-s32, k - 1)[k - 1]
        sup = np.flatnonzero(-s32 <= kth)
        order = sup[np.lexsort((cand[sup], -s32[sup].astype(np.float64)))][:k]
    else:
        order = np.lexsort((cand, -s32.astype(np.float64)))[:k]
    return pd.DataFrame(
        {
            "doc_id": (cand[order] + shard_base).astype(np.int64),
            "score": s32[order],
        }
    )


def score_shard_exact(
    term_meta: list[tuple[int, float, float, pd.DataFrame]],
    shard_base: int,
    span: int,
    allowed: np.ndarray | None,
    k: int,
    mode: str,
    avgdl: float,
    k1: float,
    b: float,
    after: tuple[float, int] | None = None,
    ordered: bool = True,
) -> pd.DataFrame:
    """Vectorized exact scorer over a dense per-shard array.

    ``term_meta``: [(term_id, idf, weight, blocks_pdf)] sorted by term_id.
    ``span``: shard width (dense doc_id range size).
    ``allowed``: optional boolean mask indexed by doc_id - shard_base
    (non-scoring filter context, B4/B6).
    ``after``: ES search_after cursor (score_f32, doc_id) — hits at or
    before it in (score desc, doc_id asc) rank order are masked out.
    ``ordered=False`` skips the (score desc, doc_id asc) output sort WHEN
    no cap applies (``cand.size <= k``): callers that re-sort or
    re-aggregate downstream (the global TakeOrdered of top_k, the
    per-query rank window of msearch, every compound/all-match fold) pay
    a full-match-set lexsort per shard for nothing. Emission is then
    doc_id-ascending (flatnonzero order) — still deterministic. The
    capped branch always sorts (the cap IS a rank selection).
    """
    scores = np.zeros(span, dtype=np.float64)
    seen = np.zeros(span, dtype=np.int32)
    for term_id, t_idf, weight, blocks in sorted(term_meta, key=lambda m: m[0]):
        if isinstance(blocks, tuple):
            # pre-decoded (docs, base_contrib) from decode_term_contrib —
            # the msearch batch kernel decodes and scores each term ONCE
            # per shard and shares it across every query using the term.
            # weight * base is the identical elementwise f64 product the
            # inline path computes (c = weight * contrib(...)).
            docs, base = blocks
            scores[docs] += weight * base
            seen[docs] += 1
            continue
        dec = _decode_term_blocks(blocks, shard_base)
        if dec is None:
            continue
        docs, tfs, dls = dec
        c = weight * contrib(tfs, dls, t_idf, avgdl, k1, b)
        scores[docs] += c
        seen[docs] += 1
    mask = seen == len(term_meta) if mode == "and" else seen > 0
    if allowed is not None:
        mask &= allowed
    if after is not None:
        s_cut, d_cut = np.float32(after[0]), int(after[1])
        s32_all = scores.astype(np.float32)
        ids = np.arange(span, dtype=np.int64) + shard_base
        mask &= (s32_all < s_cut) | ((s32_all == s_cut) & (ids > d_cut))
    cand = np.flatnonzero(mask)
    if cand.size == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float32)})
    s32 = scores[cand].astype(np.float32)
    if cand.size > k:
        # partial-select a tie-safe superset, then exact ordering within it
        kth = np.partition(-s32, k - 1)[k - 1]
        sup = np.flatnonzero(-s32 <= kth)
        order = sup[np.lexsort((cand[sup], -s32[sup].astype(np.float64)))][:k]
    elif not ordered:
        return pd.DataFrame(
            {
                "doc_id": (cand + shard_base).astype(np.int64),
                "score": s32,
            }
        )
    else:
        order = np.lexsort((cand, -s32.astype(np.float64)))[:k]
    return pd.DataFrame(
        {
            "doc_id": (cand[order] + shard_base).astype(np.int64),
            "score": s32[order],
        }
    )
