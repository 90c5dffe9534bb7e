"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Every operator here is pure JVM-side expression work (whole-stage
codegen; no Python in the path) so it runs at scan speed over 100 TB —
these are the per-document map stages of a curation pipeline. Each is
also ANSI-SQL-expressible, so the driver oracle can verify them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..functions.parity import duck_round

TOK = r"[a-z0-9_]+"
STOPWORDS = ["the", "a", "of", "to", "and", "in"]
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "data": ["data", "row", "table"],
    "tech": ["spark", "query", "join"],
}
FP_MOD = 1_000_000_007


def _toks(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(TOK), 0)


def token_count(col: Column) -> Column:
    """Whitespace/word tokens."""
    return F.size(_toks(col))


def bpe_ish_count(col: Column, piece: int = 4) -> Column:
    """BPE-ish subword proxy: each word contributes ceil(len/piece) pieces."""
    return F.aggregate(
        F.transform(_toks(col), lambda t: F.ceil(F.length(t) / F.lit(float(piece)))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score (length, mean word
    length, stopword ratio) — the standard cheap curation signals."""
    toks = _toks(F.col(text_col))
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    mean_len = F.when(n_toks > 0, F.length(F.regexp_replace(F.lower(F.col(text_col)), r"[^0-9a-z_]", "")) / n_toks).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, stop_hits / n_toks).otherwise(F.lit(0.0))
    score = (
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.5
        + (F.lit(1.0) - F.least(stop_ratio * 2.0, F.lit(1.0))) * 0.3
        + F.least(mean_len / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.length(text_col).alias("n_chars_raw"),
        duck_round(mean_len, 6).alias("mean_token_len"),
        duck_round(stop_ratio, 6).alias("stopword_ratio"),
        duck_round(score, 6).alias("quality_score"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language-ID heuristic: argmax over fixed marker lists
    (count desc, lang asc tie-break); 'und' when no marker occurs."""
    toks = _toks(F.col(text_col))
    counts = [
        F.size(F.filter(toks, lambda t: t.isin(markers))).alias(f"c_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    d = docs.select("doc_id", *counts)
    # argmax with deterministic tie-break: build (count, neg-ordinal) structs
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"c_{l}") for l in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier lang wins ties -> apply last
        pred = F.when((best > 0) & (F.col(f"c_{lang}") == best), F.lit(lang)).otherwise(pred)
    return d.select("doc_id", pred.alias("pred_lang"), best.alias("marker_hits"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Positional polynomial fingerprint over the token stream:
    fp = sum_i (i+1) * (31*len(tok_i) + ascii(first char)) mod 1e9+7 —
    a rolling-hash-style content signature, identical in Spark and SQL."""
    toks = _toks(F.col(text_col))
    exploded = docs.select("doc_id", F.posexplode(toks).alias("i", "tok"))
    return (
        exploded.groupBy("doc_id")
        .agg(
            (F.sum((F.col("i") + 1) * (F.length("tok") * 31 + F.ascii("tok"))) % FP_MOD).alias(
                "fp"
            ),
            F.count("*").alias("n_tokens"),
        )
    )
