"""BM25 scoring math (Lucene-style, k1=1.2 b=0.75 — BASELINE.json).

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    contrib(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q, d)   = sum over q's terms (occurrence-weighted) of contrib,
                    accumulated in float64 in ascending term_id order,
                    then quantized to float32 at emission.

The fixed accumulation order + f32 quantization is what makes the engine,
the brute-force oracle, and any-parallelism runs *rank-identical* including
ties (tie order: score_f32 desc, doc_id asc) — SURVEY.md §7 hard-part 1.
Exact doc lengths are used (not Lucene's quantized norm byte): exactness
beats byte-compat, and the oracle uses the same lengths (§7 hard-part 3).
"""

from __future__ import annotations

import numpy as np


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def contrib(
    tf: np.ndarray,
    doc_len: np.ndarray,
    term_idf: np.ndarray | float,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> np.ndarray:
    """float64 per-posting BM25 contribution (vectorized)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    norm = k1 * (1.0 - b + b * dl / avgdl)
    return term_idf * (tf * (k1 + 1.0)) / (tf + norm)


def quantize(scores_f64: np.ndarray) -> np.ndarray:
    """Emission quantization: float64 -> float32 (Lucene emits float scores)."""
    return np.asarray(scores_f64, dtype=np.float64).astype(np.float32)


def block_upper_bound(scores_f64: np.ndarray) -> np.float32:
    """Per-block max score, rounded UP one f32 ulp so the stored bound
    provably dominates every member's quantized score (safe BMW pruning
    despite f32 rounding)."""
    m = np.float32(np.max(scores_f64))
    return np.nextafter(m, np.float32(np.inf), dtype=np.float32)
