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


def _phrase_starts(toks: Column, terms: list[str]) -> Column:
    """1-based start positions of exact (slop-0, ordered) occurrences of
    ``terms`` in the token stream. Guarded so a doc shorter than the
    phrase yields [] (F.sequence(1, 0) would count DOWN)."""
    n = len(terms)
    last = F.size(toks) - F.lit(n - 1)

    def matches(s):  # ONE parameter: PySpark derives lambda arity from it
        conds = [
            F.element_at(toks, (s + F.lit(j)).cast("int")) == F.lit(t)
            for j, t in enumerate(terms)
        ]
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    return F.when(
        last >= 1, F.filter(F.sequence(F.lit(1), last), matches)
    ).otherwise(F.array().cast("array<int>"))


def phrase_highlight(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_fragment_tokens: int = 7,
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Phrase-aware highlighting (the ES unified highlighter over a
    match_phrase query): ONLY tokens inside an actual phrase occurrence
    are wrapped — a stray 'data' far from 'the data' stays unmarked,
    unlike the per-term highlighter — and the snippet is the BEST-scoring
    fragment (the ``n_fragment_tokens`` window covering the most marked
    tokens; ties -> earliest window), not the first hit.

    Returns (doc_id, highlighted, fragment, n_phrase_hits) for docs with
    at least one occurrence. Pure column expressions end to end (arrays +
    higher-order functions, whole-stage codegen): at any corpus size this
    is a single scan, no UDF, no shuffle."""
    if not terms:
        raise ValueError("phrase_highlight needs at least one term")
    w = int(n_fragment_tokens)
    toks = _toks(F.col(text_col), cfg)
    n = len(terms)
    starts = _phrase_starts(toks, terms)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_tk"),
        starts.alias("_st"),
    ).filter(F.size("_st") > 0)
    # positions covered by any occurrence (ascending; flatten preserves
    # the ascending span order, array_distinct keeps first occurrences)
    marked = F.array_distinct(
        F.flatten(F.transform(F.col("_st"), lambda s: F.sequence(s, s + F.lit(n - 1))))
    )
    hl_toks = F.transform(
        F.col("_tk"),
        lambda t, i: F.when(
            F.array_contains(F.col("_mk"), (i + F.lit(1)).cast("int")),
            F.concat(F.lit(PRE), t, F.lit(POST)),
        ).otherwise(t),
    )
    # best fragment: candidate windows start 3 tokens before each marked
    # position; score = marked positions covered; first max wins (the
    # candidate list is ascending, so array_position picks the earliest)
    cand = F.array_distinct(
        F.transform(F.col("_mk"), lambda p: F.greatest(p - F.lit(3), F.lit(1)))
    )
    hits_per = F.transform(
        F.col("_cand"),
        lambda s: F.size(
            F.filter(F.col("_mk"), lambda p: (p >= s) & (p < s + F.lit(w)))
        ),
    )
    best = F.element_at(
        F.col("_cand"),
        F.array_position(F.col("_hits"), F.array_max(F.col("_hits"))).cast("int"),
    )
    return (
        base.withColumn("_mk", marked)
        .withColumn("_cand", cand)
        .withColumn("_hits", hits_per)
        .withColumn("_hl", hl_toks)
        .withColumn("_best", best)
        .select(
            "doc_id",
            F.array_join("_hl", " ").alias("highlighted"),
            F.array_join(F.slice("_hl", F.col("_best"), F.lit(w)), " ").alias("fragment"),
            F.size("_st").alias("n_phrase_hits"),
        )
    )


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


def intervals_highlight_col(
    text: Column, source, cfg: EngineConfig = DEFAULT
) -> Column:
    """Interval-aware highlighting: evaluate an Iv AST
    (operators/intervals.py) over each row's analyzed token stream with
    the SAME numpy kernels the scorer runs (eval_over_tokens), then wrap
    each overlap-merged final interval in ONE ``<em>...</em>`` span over
    the normalized token stream — the phrase-highlight convention
    extended to the full intervals algebra (span queries highlight the
    same way: a span IS an interval). Arrow-batched pandas UDF; the
    per-row Python is acceptable because highlighting runs over the k
    HIT rows, never the corpus."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..operators.intervals import eval_over_tokens, merge_token_ranges
    from .analyze import analyze_query, tokenize_series

    def _mark(toks: list[str], ranges: list[tuple[int, int]]) -> str:
        if not ranges:
            return " ".join(toks)
        out = []
        ri, n = 0, len(ranges)
        i = 0
        while i < len(toks):
            if ri < n and i == ranges[ri][0]:
                l, r = ranges[ri]
                out.append(PRE + " ".join(toks[l : r + 1]) + POST)
                i = r + 1
                ri += 1
            else:
                out.append(toks[i])
                i += 1
        return " ".join(out)

    @pandas_udf("string")
    def _hl(s):
        tok_lists = tokenize_series(s, cfg)
        out = []
        for toks in tok_lists:
            ivl = eval_over_tokens(source, list(toks), lambda t: analyze_query(t, cfg))
            out.append(_mark(list(toks), merge_token_ranges(ivl)))
        return pd.Series(out)

    return _hl(text)
