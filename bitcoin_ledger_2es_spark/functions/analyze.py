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
