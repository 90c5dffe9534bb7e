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


URL_RX = r"https?://[^\s]+"
EMAIL_RX = r"[^\s@]+@[^\s@]+\.[^\s@]+"


def clean_text(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Curation scrub stage: drop URLs and e-mail addresses, collapse
    whitespace runs, trim. Pure codegen regexp_replace chain (scan-speed
    at 100 TB); the same RE2-compatible patterns run in the DuckDB oracle."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    cleaned = F.regexp_replace(t, URL_RX, "")
    cleaned = F.regexp_replace(cleaned, EMAIL_RX, "")
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        cleaned.alias("clean_text"),
        (F.length(t) - F.length(cleaned)).alias("n_removed_chars"),
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_token_frac: float = 0.2,
    max_top_bigram_frac: float = 0.18,
    min_tokens: int = 3,
) -> DataFrame:
    """Gopher/C4-style repetition filters: per doc, the fraction of tokens
    taken by the most frequent token and by the most frequent bigram, plus
    the keep/drop decision. Two bounded hash aggregations (token- and
    bigram-keyed with map-side partial agg) — no all-pairs, no Python."""
    toks = _toks(F.coalesce(F.col(text_col), F.lit("")))
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).select(
        "doc_id",
        "toks",
        F.size("toks").alias("n_tokens"),
        F.when(
            F.size("toks") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat(
                    F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("bigrams"),
    )
    top_tok = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_token_count"))
    )
    top_bg = (
        base.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bigram_count"))
    )
    out = (
        base.select("doc_id", "n_tokens")
        .join(top_tok, "doc_id", "left")
        .join(top_bg, "doc_id", "left")
        .withColumn("top_token_count", F.coalesce("top_token_count", F.lit(0)))
        .withColumn("top_bigram_count", F.coalesce("top_bigram_count", F.lit(0)))
        .withColumn(
            "top_token_frac",
            F.when(F.col("n_tokens") > 0, F.col("top_token_count") / F.col("n_tokens")).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "top_bigram_frac",
            F.when(F.col("n_tokens") >= 2, F.col("top_bigram_count") / (F.col("n_tokens") - 1)).otherwise(F.lit(0.0)),
        )
    )
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("top_token_frac") <= max_top_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "top_token_count",
        "top_bigram_count",
        duck_round("top_token_frac", 6).alias("top_token_frac"),
        duck_round("top_bigram_frac", 6).alias("top_bigram_frac"),
        keep.alias("keep"),
    )


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


# ---------------------------------------------------------------------------
# PII redaction + chunking (training-data pipeline ops, session 4)

# Redaction patterns: deliberately conservative, documented regexes —
# the standard pre-training scrub set. Order matters: emails before
# phones (an email's digits must not half-match the phone pattern
# after the '@' is gone... it can't: patterns apply to the ORIGINAL
# text sequentially, each rewriting its own matches only).
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("cc", r"\b(?:\d[ \-]?){13,16}\b", "<CC>"),
    ("phone", r"(?:\+\d{1,2}[ \-]?)?\(?\d{3}\)?[ \-]\d{3}[ \-]\d{4}\b",
     "<PHONE>"),
]


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    kinds: "list[str] | None" = None,
) -> DataFrame:
    """Training-data PII scrub: rewrite emails / IPv4s / SSN-shaped /
    credit-card-shaped / phone-shaped spans to typed placeholder tokens
    and count what was hit. Pure ``regexp_replace`` +
    ``regexp_count`` column expressions — whole-stage codegen, zero
    exchanges, linear in bytes scanned (the only shape that survives
    100 TB). Appends ``<text_col>_redacted`` plus one ``pii_<kind>``
    count per pattern and ``pii_total``. The patterns are the
    DOCUMENTED conservative set in :data:`PII_PATTERNS`; ``kinds``
    selects a subset (unknown names raise). Counting happens on the
    ORIGINAL text, replacement sequentially — a span matching two
    patterns is counted by both but rewritten by the first."""
    sel = PII_PATTERNS if kinds is None else [
        p for p in PII_PATTERNS if p[0] in set(kinds)]
    if kinds is not None and len(sel) != len(set(kinds)):
        known = {p[0] for p in PII_PATTERNS}
        raise ValueError(
            f"unknown PII kinds: {sorted(set(kinds) - known)}")
    out = docs
    red = F.col(text_col)
    total = F.lit(0).cast("long")
    for name, rx, token in sel:
        cnt = F.regexp_count(F.col(text_col), F.lit(rx)).cast("long")
        out = out.withColumn(f"pii_{name}", cnt)
        total = total + F.col(f"pii_{name}")
        red = F.regexp_replace(red, rx, token)
    return (out.withColumn("pii_total", total)
               .withColumn(f"{text_col}_redacted", red))


def chunk_text(
    docs: DataFrame,
    max_chars: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG/packing-side chunker: split each document into fixed-size
    character windows with optional overlap, emitting one row per
    chunk with byte-exact provenance — (id, chunk_idx, chunk_start
    0-based, chunk). The inverse of concat-chunk packing
    (operators/batching.py): packing joins small docs, chunking splits
    large ones; a pipeline typically chunks then packs.

    Lowered as ``posexplode(sequence(...)) + substring`` — per-row
    codegen, no UDF, no shuffle: a chunker that shuffles is wrong at
    any scale. Stride = max_chars - overlap; the final chunk may be
    short (never empty); empty/null texts yield zero rows (explode of
    an empty sequence). Determinism: chunk boundaries are a pure
    function of (length, max_chars, overlap) — never of partitioning."""
    if max_chars <= 0:
        raise ValueError("max_chars must be positive")
    if not (0 <= overlap < max_chars):
        raise ValueError("overlap must satisfy 0 <= overlap < max_chars")
    stride = max_chars - overlap
    ln = F.length(F.col(text_col))
    # number of stride-steps whose window start lies inside the text:
    # ceil((len - overlap) / stride), at least 1 for non-empty text
    n = F.greatest(
        F.ceil((ln - F.lit(overlap)).cast("double") / F.lit(stride))
        .cast("int"),
        F.lit(1),
    )
    starts = F.when(ln > 0, F.sequence(F.lit(0), n - F.lit(1)))
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "__step"),
            F.col(text_col),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("__step") * F.lit(stride)).alias("chunk_start"),
            F.substring(
                F.col(text_col),
                (F.col("__step") * F.lit(stride) + 1).cast("int"),
                max_chars,
            ).alias("chunk"),
        )
    )
