"""Brute-force pandas/numpy BM25 oracle (SURVEY.md §5.3).

Scores EVERY document for a query — no index, no pruning — and sorts by
(score_f32 desc, doc_id asc). The engine's indexed/BMW path must return
rank-identical (doc_id, score_f32) sequences. Golden outputs are produced
by this oracle, never hand-written (FIXTURES.md §2).

Scoring rules shared with the engine (functions/bm25.py):
  * contributions accumulated in float64 in ascending term_id order
    (term_id = rank of term in sorted vocab), quantized to float32 at the
    end;
  * duplicate query terms are occurrence-weighted (ES sums one clause per
    occurrence);
  * mode="and" requires every distinct in-vocabulary query term to occur —
    and an out-of-vocabulary required term matches nothing (empty result),
    mirroring an ES bool.must of a non-matching TermQuery.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from .config import DEFAULT, EngineConfig
from .functions.analyze import analyze_query, tokenize_series
from .functions.bm25 import contrib, idf


class PandasOracle:
    def __init__(self, docs: pd.DataFrame, cfg: EngineConfig = DEFAULT):
        """docs: DataFrame with columns (doc_id int64, text str)."""
        self.cfg = cfg
        d = docs.sort_values("doc_id").reset_index(drop=True)
        toks = tokenize_series(d["text"], cfg)
        self._toks = toks
        self.doc_ids = d["doc_id"].to_numpy(dtype=np.int64)
        self.doc_len = toks.str.len().to_numpy(dtype=np.int64)
        self.n_docs = len(d)
        self.avgdl = float(self.doc_len.mean()) if self.n_docs else 0.0
        # postings: term -> (row indices, tfs)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        by_term: dict[str, dict[int, int]] = {}
        for row, ts in enumerate(toks):
            for t, c in Counter(ts).items():
                by_term.setdefault(t, {})[row] = c
        for t, m in by_term.items():
            rows = np.fromiter(m.keys(), dtype=np.int64)
            tfs = np.fromiter(m.values(), dtype=np.int64)
            order = np.argsort(rows)
            self.postings[t] = (rows[order], tfs[order])
        # term_id = rank in sorted vocabulary (matches engine dictionary)
        self.term_id = {t: i for i, t in enumerate(sorted(by_term))}

    def top_k(self, query_text: str, k: int = 10, mode: str = "or") -> pd.DataFrame:
        """Returns (rank, doc_id, score) with score float32, rank 1-based."""
        cfg = self.cfg
        terms = analyze_query(query_text, cfg)
        weights = Counter(terms)
        in_vocab = [t for t in weights if t in self.postings]
        empty = pd.DataFrame({"rank": pd.Series([], dtype=np.int32),
                              "doc_id": pd.Series([], dtype=np.int64),
                              "score": pd.Series([], dtype=np.float32)})
        if not terms:
            return empty
        if mode == "and" and (len(in_vocab) < len(weights)):
            return empty  # a required term matches nothing
        if not in_vocab:
            return empty

        scores = np.zeros(self.n_docs, dtype=np.float64)
        seen_count = np.zeros(self.n_docs, dtype=np.int64)
        # accumulate in ascending term_id order (determinism contract)
        for t in sorted(in_vocab, key=lambda t: self.term_id[t]):
            rows, tfs = self.postings[t]
            t_idf = idf(float(len(rows)), self.n_docs)
            c = contrib(tfs, self.doc_len[rows], t_idf, self.avgdl, cfg.k1, cfg.b)
            scores[rows] += weights[t] * c
            seen_count[rows] += 1
        if mode == "and":
            mask = seen_count == len(in_vocab)
        else:
            mask = seen_count > 0
        cand = np.flatnonzero(mask)
        if cand.size == 0:
            return empty
        s32 = scores[cand].astype(np.float32)
        order = np.lexsort((self.doc_ids[cand], -s32.astype(np.float64)))
        top = order[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
                "doc_id": self.doc_ids[cand][top],
                "score": s32[top],
            }
        )

    def _phrase_topk_unordered(self, terms, k, slop, empty) -> pd.DataFrame:
        """Unordered minimal-window sloppy phrase oracle: for every
        candidate right endpoint (any slot occurrence), the tightest window
        ending there uses each slot's latest occurrence <= it; minimal
        windows are the containment-minimal of those candidates (explicit
        pairwise filter — independent of the engine's streaming reduce,
        so the two implementations pin each other)."""
        if len(set(terms)) < len(terms):
            raise ValueError("unordered slop oracle: repeated terms unsupported")
        cfg = self.cfg
        sum_idf = 0.0
        for t in terms:
            sum_idf += float(idf(float(len(self.postings[t][0])), self.n_docs))
        rows, pfs = [], []
        for row, ts in enumerate(self._toks):
            occ = []
            for slot, t in enumerate(terms):
                ps = [i - slot for i, x in enumerate(ts) if x == t]
                if not ps:
                    occ = None
                    break
                occ.append(ps)
            if occ is None:
                continue
            occ_np = [np.asarray(ps, dtype=np.int64) for ps in occ]
            allpos = np.unique(np.concatenate(occ_np))
            wins = set()
            for p in allpos:
                lefts = []
                for ps in occ_np:
                    i = int(np.searchsorted(ps, p, side="right")) - 1
                    if i < 0:
                        lefts = None
                        break
                    lefts.append(int(ps[i]))
                if lefts is not None:
                    wins.add((min(lefts), int(p)))
            minimal = [
                (l, r)
                for l, r in wins
                if not any(
                    (l2, r2) != (l, r) and l2 >= l and r2 <= r for l2, r2 in wins
                )
            ]
            # sum in increasing window order — the engine streams windows
            # left-to-right, and f64 addition order is part of the contract
            minimal.sort()
            pf = 0.0
            for l, r in minimal:
                if r - l <= slop:
                    pf += 1.0 / (1.0 + (r - l))
            if pf > 0.0:
                rows.append(row)
                pfs.append(pf)
        if not rows:
            return empty
        rows = np.asarray(rows, dtype=np.int64)
        pf = np.asarray(pfs, dtype=np.float64)
        dl = self.doc_len[rows].astype(np.float64)
        denom = pf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / self.avgdl)
        s32 = (sum_idf * pf * (cfg.k1 + 1.0) / denom).astype(np.float32)
        order = np.lexsort((self.doc_ids[rows], -s32.astype(np.float64)))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(order) + 1, dtype=np.int32),
                "doc_id": self.doc_ids[rows][order],
                "score": s32[order],
                "phrase_freq": pf[order],
            }
        )

    def bool_topk(
        self,
        must: str = "",
        should: str = "",
        must_not: str = "",
        k: int = 10,
        minimum_should_match: int | None = None,
    ) -> pd.DataFrame:
        """ES bool query oracle (mirrors BM25Searcher.bool_query /
        operators/wand.py score_shard_bool, same determinism contract):
        must all required + scoring, should scoring with >= min_m matching,
        must_not a non-scoring exclusion; a term in both must and should
        scores once per clause (summed weights)."""
        cfg = self.cfg
        must_terms = analyze_query(must, cfg)
        should_terms = analyze_query(should, cfg)
        not_terms = analyze_query(must_not, cfg)
        empty = pd.DataFrame({"rank": pd.Series([], dtype=np.int32),
                              "doc_id": pd.Series([], dtype=np.int64),
                              "score": pd.Series([], dtype=np.float32)})
        if not must_terms and not should_terms:
            return empty
        w_must, w_should = Counter(must_terms), Counter(should_terms)
        if any(t not in self.postings for t in w_must):
            return empty
        min_m = minimum_should_match
        if min_m is None:
            min_m = 1 if (should_terms and not must_terms) else 0
        should_in = [t for t in w_should if t in self.postings]
        if min_m > len(should_in):
            return empty
        if not w_must and not should_in:
            return empty

        scores = np.zeros(self.n_docs, dtype=np.float64)
        seen_must = np.zeros(self.n_docs, dtype=np.int64)
        seen_should = np.zeros(self.n_docs, dtype=np.int64)
        weights = {t: 0.0 for t in {*w_must, *should_in}}
        for t, w in w_must.items():
            weights[t] += w
        for t in should_in:
            weights[t] += w_should[t]
        for t in sorted(weights, key=lambda t: self.term_id[t]):
            rows, tfs = self.postings[t]
            t_idf = idf(float(len(rows)), self.n_docs)
            scores[rows] += weights[t] * contrib(
                tfs, self.doc_len[rows], t_idf, self.avgdl, cfg.k1, cfg.b
            )
            if t in w_must:
                seen_must[rows] += 1
            if t in should_in or (t in w_should):
                seen_should[rows] += 1
        mask = seen_must == len(w_must) if w_must else np.ones(self.n_docs, dtype=bool)
        if min_m > 0:
            mask &= seen_should >= min_m
        elif not w_must and should_in:
            mask &= seen_should > 0
        for t in set(not_terms):
            if t in self.postings:
                mask[self.postings[t][0]] = False
        cand = np.flatnonzero(mask)
        if cand.size == 0:
            return empty
        s32 = scores[cand].astype(np.float32)
        order = np.lexsort((self.doc_ids[cand], -s32.astype(np.float64)))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(order) + 1, dtype=np.int32),
                "doc_id": self.doc_ids[cand][order],
                "score": s32[order],
            }
        )

    def phrase_topk(
        self, query_text: str, k: int = 10, slop: int = 0, ordered: bool = True
    ) -> pd.DataFrame:
        """match_phrase oracle (B5): brute-force scan of every doc's token
        stream — slop=0 requires consecutive occurrences; slop>0 ordered
        counts start positions p0 from which the terms appear in order with
        total span <= len + slop; slop>0 UNordered uses minimal-window
        semantics with 1/(1+width) weighting (same contract as
        operators/phrase.py score_shard_phrase_unordered — implemented
        independently here over raw token streams). BM25 with tf = phrase
        freq, idf = sum of per-term idfs in query order."""
        cfg = self.cfg
        terms = analyze_query(query_text, cfg)
        unordered = not ordered and slop > 0
        freq_np = np.float64 if unordered else np.int64
        empty = pd.DataFrame({"rank": pd.Series([], dtype=np.int32),
                              "doc_id": pd.Series([], dtype=np.int64),
                              "score": pd.Series([], dtype=np.float32),
                              "phrase_freq": pd.Series([], dtype=freq_np)})
        if not terms or any(t not in self.postings for t in terms):
            return empty
        if unordered:
            return self._phrase_topk_unordered(terms, k, slop, empty)
        sum_idf = 0.0
        for t in terms:
            sum_idf += float(idf(float(len(self.postings[t][0])), self.n_docs))
        rows, pfs = [], []
        n = len(terms)

        def _window_match(ts, i):  # ordered within span <= n + slop, from p0=i
            if ts[i] != terms[0]:
                return False
            cur = i
            for j in range(1, n):
                q = next(
                    (p for p in range(cur + 1, i + j + slop + 1)
                     if p < len(ts) and ts[p] == terms[j]),
                    None,
                )
                if q is None:
                    return False
                cur = q
            return True

        for row, ts in enumerate(self._toks):
            if slop == 0:
                pf = sum(
                    1
                    for i in range(len(ts) - n + 1)
                    if all(ts[i + j] == terms[j] for j in range(n))
                )
            else:
                pf = sum(1 for i in range(len(ts)) if _window_match(ts, i))
            if pf:
                rows.append(row)
                pfs.append(pf)
        if not rows:
            return empty
        rows = np.asarray(rows, dtype=np.int64)
        pf = np.asarray(pfs, dtype=np.float64)
        dl = self.doc_len[rows].astype(np.float64)
        denom = pf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / self.avgdl)
        s32 = (sum_idf * pf * (cfg.k1 + 1.0) / denom).astype(np.float32)
        order = np.lexsort((self.doc_ids[rows], -s32.astype(np.float64)))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(order) + 1, dtype=np.int32),
                "doc_id": self.doc_ids[rows][order],
                "score": s32[order],
                "phrase_freq": pf[order].astype(np.int64),
            }
        )
