"""Analyzer: vectorized tokenization (ES standard-analyzer-ish).

The north star mandates "tokenize turn text via vectorized Arrow/pandas UDFs
(no per-row Python)" — so the hot path is a pandas UDF over Arrow batches
using pandas' vectorized string kernels; there is no row-at-a-time Python
anywhere. The same pure-pandas function is reused driver-side for query
analysis and by the brute-force oracle so engine and oracle can never drift.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import DEFAULT, EngineConfig


def tokenize_series(s: pd.Series, cfg: EngineConfig = DEFAULT) -> pd.Series:
    """Vectorized: Series[str] -> Series[list[str]]."""
    s = s.fillna("")
    if cfg.lowercase:
        s = s.str.lower()
    return s.str.findall(cfg.token_pattern)


def tokenize_udf(cfg: EngineConfig = DEFAULT):
    """pandas UDF: text -> array<string> of analyzed tokens."""

    @pandas_udf("array<string>")
    def _tokenize(s: pd.Series) -> pd.Series:
        return tokenize_series(s, cfg)

    return _tokenize


def tokenize_col(text: Column, cfg: EngineConfig = DEFAULT) -> Column:
    return tokenize_udf(cfg)(text)


def tokenize_sql_builtin(text: Column, cfg: EngineConfig = DEFAULT) -> Column:
    """JVM-side equivalent (regexp_extract_all) — used to cross-check the
    pandas UDF and available as a whole-stage-codegen alternative."""
    t = F.lower(text) if cfg.lowercase else text
    return F.regexp_extract_all(t, F.lit(cfg.token_pattern), 0)


def analyze_query(query_text: str, cfg: EngineConfig = DEFAULT) -> list[str]:
    """Driver-side query analysis: same analyzer as indexing."""
    q = query_text or ""
    if cfg.lowercase:
        q = q.lower()
    return re.findall(cfg.token_pattern, q)


def analyze_tokens(text: str, cfg: EngineConfig = DEFAULT) -> list[dict]:
    """ES ``_analyze`` API response shape: one dict per token with
    ``token``, ``start_offset``, ``end_offset`` (character offsets into
    the input) and ``position`` — the same token pattern and lowercase
    fold as indexing, so ``[t["token"] for t in ...]`` is exactly
    ``analyze_query``'s output. Offsets index the ORIGINAL text: the
    token pattern is ASCII, and ASCII lowercasing is length-preserving,
    so folding before the scan cannot shift offsets. Driver-side, no
    job — the introspection API, not a hot path."""
    src = text or ""
    hay = src.lower() if cfg.lowercase else src
    return [
        {
            "token": m.group(0),
            "start_offset": m.start(),
            "end_offset": m.end(),
            "position": pos,
        }
        for pos, m in enumerate(re.finditer(cfg.token_pattern, hay))
    ]


def analyze_offsets(df, doc_col: str, text_col: str,
                    cfg: EngineConfig = DEFAULT):
    """Distributed ``_analyze``: one row per token of ``text_col`` with
    ``position`` and character ``start_offset``/``end_offset`` — the
    column-level face of :func:`analyze_tokens`, entirely JVM-side
    (regexp_extract_all + split + posexplode + ``aggregate`` prefix
    sums; whole-stage codegen, no Python in the path, so it scales to
    the full corpus unlike the driver-side API).

    Offset derivation (the trick that avoids per-row Python): with
    ``toks = regexp_extract_all(t, pat)`` and ``seps = split(t, pat)``
    (the non-token text AROUND the matches; ``len(seps) == len(toks)+1``
    because the token pattern cannot match empty),

        start(i) = sum(len(seps[0..i])) + sum(len(toks[0..i-1]))
        end(i)   = start(i) + len(toks[i])

    Lowercasing before the scan cannot shift offsets: the token pattern
    is ASCII and ASCII case-folding is length-preserving (the same
    argument analyze_tokens documents). Returns (doc_col, position,
    token, start_offset, end_offset)."""
    pat = cfg.token_pattern
    t = F.coalesce(F.col(text_col), F.lit(""))
    if cfg.lowercase:
        t = F.lower(t)
    base = df.select(
        F.col(doc_col),
        F.regexp_extract_all(t, F.lit(pat), 0).alias("_toks"),
        F.split(t, pat, -1).alias("_seps"),
    )
    ex = base.select(
        doc_col, "_toks", "_seps",
        F.posexplode("_toks").alias("position", "token"),
    )
    def _len_sum(arr, n):
        # sum of lengths of the first n elements (n may be 0)
        return F.aggregate(
            F.slice(arr, F.lit(1), n), F.lit(0),
            lambda acc, x: acc + F.length(x),
        )
    start = (
        _len_sum(F.col("_seps"), F.col("position") + F.lit(1))
        + _len_sum(F.col("_toks"), F.col("position"))
    )
    return ex.select(
        doc_col,
        F.col("position").cast("long").alias("position"),
        "token",
        start.cast("long").alias("start_offset"),
        (start + F.length("token")).cast("long").alias("end_offset"),
    )
