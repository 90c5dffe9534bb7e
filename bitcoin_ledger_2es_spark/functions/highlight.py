"""Highlighting (B18): wrap matched query terms in the analyzed token
stream (ES `highlight` with the unified highlighter's default <em> tags).

Operates on the ANALYZED token stream, not raw character offsets: the
engine's analyzer is lowercase + [a-z0-9_]+ runs, so the highlighted text
is the normalized token stream with query-term tokens wrapped. This is
deterministic, whole-stage-codegen JVM-side (transform/array_join — no
UDF), and exactly expressible in the DuckDB oracle (list_transform), which
is what makes it driver-checkable. A fragment (snippet) column around the
first hit mirrors ES's fragmenter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig

PRE, POST = "<em>", "</em>"


def _toks(text: Column, cfg: EngineConfig) -> Column:
    t = F.coalesce(text, F.lit(""))
    if cfg.lowercase:
        t = F.lower(t)
    return F.regexp_extract_all(t, F.lit(cfg.token_pattern), 0)


def _marked(toks: Column, terms: list[str]) -> Column:
    return F.transform(
        toks,
        lambda t: F.when(
            t.isin(terms), F.concat(F.lit(PRE), t, F.lit(POST))
        ).otherwise(t),
    )


def highlight_col(text: Column, terms: list[str], cfg: EngineConfig = DEFAULT) -> Column:
    """Full-stream highlight: every analyzed token, hits wrapped."""
    return F.array_join(_marked(_toks(text, cfg), terms), " ")


def fragment_col(
    text: Column,
    terms: list[str],
    n_tokens: int = 7,
    cfg: EngineConfig = DEFAULT,
) -> Column:
    """Snippet around the FIRST hit: ``n_tokens`` marked tokens starting
    at most 3 tokens before it (1-based slice, like ES fragment windows).
    NULL-safe: no hit -> the first ``n_tokens`` tokens."""
    toks = _toks(text, cfg)
    hit = F.array_position(
        F.transform(toks, lambda t: t.isin(terms)), F.lit(True)
    )  # 1-based; 0 if absent
    start = F.greatest(F.lit(1), hit - F.lit(3))
    return F.array_join(F.slice(_marked(toks, terms), start, n_tokens), " ")


def with_highlight(
    hits: DataFrame,
    source: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_fragment_tokens: int = 7,
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Attach highlight + fragment columns to a (small) hits frame by
    broadcasting it into the source scan — the same fetch-phase shape as
    BM25Searcher.top_k's meta join (hits build-side, source scan-only)."""
    t = F.col(text_col)
    return (
        source.select(
            F.col(id_col).alias("doc_id"),
            highlight_col(t, terms, cfg).alias("highlighted"),
            fragment_col(t, terms, n_fragment_tokens, cfg).alias("fragment"),
        )
        .join(F.broadcast(hits), "doc_id", "inner")
    )
