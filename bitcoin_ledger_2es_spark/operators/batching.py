"""Training-batch preparation operators: deterministic splits, length
bucketing, and GPT-style concat-and-chunk sequence packing.

All three are pure functions of the data (no RNG, no wall clock), so
assignments are reproducible across runs, parallelism, and resume — the
same determinism contract as the index builder.

  * train_val_split — split assignment by a salted multiplicative hash of
    the id (Knuth's 2654435761 mod 2^32): streaming-friendly (a doc's
    split never depends on other docs), exactly expressible in SQL, and
    uniform enough for ratio splits. Changing the salt re-deals the split.
  * length_histogram — docs bucketed by next-power-of-two token count;
    the batching-shape diagnostic (how many pad tokens a naive batcher
    would waste per bucket).
  * concat_chunk_spans — the standard LLM pretraining packing: documents
    concatenated in doc_id order into one virtual token stream, cut into
    fixed ``capacity``-token chunks; emits each doc's global token offset
    and the chunk span it lands in. The global offset is the engine's own
    distributed exclusive prefix sum (operators/ids.with_global_rank) — no
    single-task window, so the op holds at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ids import with_global_rank

_KNUTH = 2654435761  # golden-ratio multiplicative hash constant
_M32 = 1 << 32


def _token_count(text_col):
    return F.size(
        F.regexp_extract_all(
            F.lower(F.coalesce(text_col, F.lit(""))), F.lit(r"[a-z0-9_]+"), 0
        )
    )


def train_val_split(
    docs: DataFrame,
    val_fraction: float = 0.1,
    salt: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add ``split`` ('train' | 'val') + the underlying hash bucket.

    h = ((doc_id + salt) * 2654435761) mod 2^32; val iff
    h < val_fraction * 2^32. Per-doc deterministic — safe to apply
    independently on any shard or stream micro-batch.

    The multiply is done in overflow-safe 16/32-bit halves: (x*K) mod 2^32
    depends only on x mod 2^32, and splitting x into (hi<<16)+lo keeps
    every intermediate < 2^49, so the op is exact for ANY int64 doc_id
    (segment ids start at 2^40; the naive int64 product overflows — and
    under ANSI mode throws — from doc_id ~ 3.47e9)."""
    x = F.pmod(F.pmod(F.col(id_col), F.lit(_M32)) + F.lit(int(salt)), F.lit(_M32))
    hi, lo = F.floor(x / F.lit(1 << 16)), x % F.lit(1 << 16)
    h = F.pmod(
        F.pmod(hi * F.lit(_KNUTH), F.lit(_M32)) * F.lit(1 << 16) + lo * F.lit(_KNUTH),
        F.lit(_M32),
    )
    return docs.withColumn("split_hash", h.cast("long")).withColumn(
        "split",
        F.when(F.col("split_hash") < F.lit(int(val_fraction * _M32)), "val").otherwise(
            "train"
        ),
    )


def length_histogram(
    docs: DataFrame, text_col: str = "text", max_pow: int = 20
) -> DataFrame:
    """(bucket, n_docs, sum_tokens, pad_waste): bucket = smallest power of
    two >= token count (empty docs land in bucket 1); pad_waste = tokens a
    pad-to-bucket batcher would add."""
    tc = _token_count(F.col(text_col))
    bucket = F.pow(
        F.lit(2.0), F.ceil(F.log2(F.greatest(tc.cast("double"), F.lit(1.0))))
    ).cast("long")
    return (
        docs.select(tc.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(F.col("bucket") - F.col("n_tokens")).alias("pad_waste"),
        )
    )


def concat_chunk_spans(
    docs: DataFrame,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style packing spans: concatenate all docs in ``id_col`` order
    into one virtual token stream and cut chunks of ``capacity`` tokens.

    Returns (doc_id, n_tokens, token_offset, first_chunk, last_chunk):
    ``token_offset`` is the doc's exact global start position (distributed
    exclusive prefix sum — parallelism-invariant), ``first_chunk``/
    ``last_chunk`` the chunk ids its tokens span. Zero-token docs occupy
    no stream space (first_chunk = last_chunk = the chunk at their
    offset). One chunk therefore packs multiple short docs and long docs
    straddle chunks — the standard concat-then-chunk pretraining layout."""
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        _token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    ranked = with_global_rank(
        sized, ["doc_id"], rank_col="_r", value_col="n_tokens", psum_col="token_offset"
    )
    cap = F.lit(int(capacity))
    return ranked.select(
        "doc_id",
        "n_tokens",
        "token_offset",
        F.floor(F.col("token_offset") / cap).alias("first_chunk"),
        F.floor(
            (F.col("token_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0))) / cap
        ).alias("last_chunk"),
    )
