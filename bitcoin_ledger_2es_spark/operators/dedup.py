"""Deduplication operators for large-scale training-data pipelines.

All operators run over a (doc_id, text) table and are designed for the
100 TB regime:

  * exact_dedup        — hash groupBy on a normalized text digest; partial
                         aggregation makes this one bounded shuffle.
  * ngram_jaccard_pairs— exact token-set (or shingle-set) Jaccard via a
                         relational self-join on tokens. Quadratic in
                         cluster size — apply only within candidate buckets
                         at scale; exposed directly for oracle parity.
  * minhash_lsh_pairs  — MinHash signatures (vectorized numpy inside a
                         pandas UDF) + banded LSH bucketing + bucket-local
                         candidate join + exact Jaccard verification. The
                         scale path: shuffle is bounded by bucket size, a
                         hot bucket is capped (explicit skew guard).
  * simhash_pairs      — 64-bit SimHash per doc (vectorized), bucketed by
                         rotated prefixes, Hamming-distance verified.

Determinism: all hash seeds fixed; no RNG at runtime. MinHash permutations
use the splitmix64 mix of xxhash64(token) with fixed per-permutation salts,
so signatures are reproducible across runs/parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..functions.parity import duck_round
from pyspark.sql.functions import pandas_udf

from ..functions.analyze import tokenize_series

# ---------------------------------------------------------------------------
# exact


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: representative id (min), dup count.
    Grouping on sha2 of the text keeps shuffle rows narrow at scale."""
    return (
        docs.withColumn("_h", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256))
        .groupBy("_h")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count("*").alias("n_dups"),
        )
        .drop("_h")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (relational; candidate-verify building block)


def token_set(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 1) -> DataFrame:
    """Distinct n-gram set per doc (word shingles)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9_]+"), 0)
    if n > 1:
        toks = F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("gram"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact: all pairs (a < b) with |A ∩ B| / |A ∪ B| >= threshold."""
    grams = token_set(docs, text_col, id_col, n)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    g2 = grams.withColumnRenamed("doc_id", "doc_b")
    inter = (
        grams.join(g2, "gram")
        .filter(F.col("doc_id") < F.col("doc_b"))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", duck_round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH

_MERSENNE = np.uint64((1 << 61) - 1)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit FNV-1a hashes of a token list, vectorized ACROSS
    tokens: the only Python loop is over byte *positions* (max token
    length, ~tens), each iteration a whole-array gather+xor+multiply.
    Values are bit-identical to the per-byte scalar FNV-1a reference
    (pinned by tests/test_pipeline_ops.py golden)."""
    n = len(tokens)
    out = np.full(n, _FNV_OFF, dtype=np.uint64)
    if n == 0:
        return out
    enc = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter(map(len, enc), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    alive = np.arange(n)
    for j in range(int(lens.max(initial=0))):
        alive = alive[lens[alive] > j]
        if alive.size == 0:
            break
        b = buf[starts[alive] + j].astype(np.uint64)
        out[alive] = (out[alive] ^ b) * _FNV_PRIME  # uint64 mul wraps mod 2^64
    return out


def _flat_token_hashes(tok_lists: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Hash every token of every doc in ONE vectorized pass.
    Returns (hashes over the flattened token stream, token count per doc)."""
    counts = np.fromiter(map(len, tok_lists), dtype=np.int64, count=len(tok_lists))
    flat: list[str] = [t for ts in tok_lists for t in ts]
    return _token_hashes(flat), counts


def minhash_signatures_udf(num_perm: int = 64):
    """pandas UDF: text -> array<long> MinHash signature (fixed seeds).

    Fully batch-vectorized: one flattened FNV pass over every token in the
    batch, then per permutation one splitmix64 mix + a segmented min
    (``np.minimum.reduceat``). Duplicates need no dedup — min() is
    duplicate-invariant — so signatures equal the per-doc unique-token
    reference exactly."""
    salts = _splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)
        th, counts = _flat_token_hashes(toks)
        sig = np.zeros((len(toks), num_perm), dtype=np.int64)
        nonempty = counts > 0
        if th.size:
            seg_starts = (np.concatenate(([0], np.cumsum(counts)))[:-1])[nonempty]
            for p in range(num_perm):
                v = _splitmix64(th ^ salts[p])
                sig[nonempty, p] = np.minimum.reduceat(v, seg_starts).astype(np.int64)
        return pd.Series(list(sig.tolist()))

    return _sig


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 2000,
    verify_exact: bool = True,
    metrics_out: dict | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH candidate generation.

    bands x rows layout (rows = num_perm // bands); docs sharing any full
    band land in a candidate bucket; candidates are verified with the
    estimated (or exact) Jaccard. ``max_bucket`` caps pathological buckets
    (e.g. empty/boilerplate texts) — the explicit skew guard: a bucket over
    the cap is dropped rather than quadratically exploding a task. Pass
    ``metrics_out={}`` to make the truncation OBSERVABLE: it is filled with
    dropped_buckets / dropped_bucket_rows (one tiny extra aggregation job)
    so a boilerplate-heavy corpus can't silently lose its most duplicated
    cluster. The signature frame is persisted for reuse across the branches
    — call :func:`release_cached` on the result when done to unpersist.
    """
    rows = num_perm // bands
    assert bands * rows == num_perm
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        minhash_signatures_udf(num_perm)(F.col(text_col)).alias("sig"),
    ).persist()

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.slice("sig", b * rows + 1, rows).cast("string")).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    sizes = buckets.groupBy("band", "bh").agg(F.count("*").alias("n"))
    _record_drops(sizes, "n", max_bucket, metrics_out)
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket)).select("band", "bh")
    b1 = buckets.join(ok, ["band", "bh"])
    b2 = b1.select("band", "bh", F.col("doc_id").alias("doc_b"))
    cand = (
        b1.join(b2, ["band", "bh"])
        .filter(F.col("doc_id") < F.col("doc_b"))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    # estimator: matching signature positions / num_perm
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard_est",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.lit(float(num_perm)),
        )
        .select("doc_a", "doc_b", duck_round("jaccard_est", 6).alias("jaccard_est"))
    )
    if not verify_exact:
        return _with_cached(est.filter(F.col("jaccard_est") >= threshold), sig)
    # exact verification scoped to the LSH candidates ONLY: join each
    # candidate pair to its two token sets and count the intersection.
    # Cost is bounded by |candidates| x tokens-per-doc — never the full
    # quadratic token self-join (which LSH exists to avoid).
    grams = token_set(docs, text_col, id_col)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ga = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        est.select("doc_a", "doc_b")
        .join(ga, "doc_a")
        .join(gb, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        est.join(inter, ["doc_a", "doc_b"])
        .join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .withColumn(
            "jaccard",
            duck_round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard", "jaccard_est")
    )
    return _with_cached(out, sig)


# ---------------------------------------------------------------------------
# SimHash


def simhash_udf():
    """pandas UDF: text -> 64-bit SimHash (long).

    Batch-vectorized: one flattened FNV pass, ``np.unpackbits`` to a
    (tokens x 64) bit matrix, a segmented per-doc bit-count
    (``np.add.reduceat``), and a power-of-two matmul to repack the sign
    vector — no per-token Python. tf weighting comes from token
    repetition in the stream, exactly like the scalar reference."""

    @pandas_udf("long")
    def _sim(texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)
        th, counts = _flat_token_hashes(toks)
        out = np.zeros(len(toks), dtype=np.int64)
        nonempty = counts > 0
        if th.size:
            # (T, 64) bit matrix, bit 0 = LSB (little-endian byte view +
            # bitorder='little' matches (h >> b) & 1)
            bits = np.unpackbits(
                th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int64)
            seg_starts = (np.concatenate(([0], np.cumsum(counts)))[:-1])[nonempty]
            ones = np.add.reduceat(bits, seg_starts, axis=0)  # per-doc bit counts
            acc = 2 * ones - counts[nonempty, None]  # sum over tokens of (2*bit - 1)
            pow2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))
            out[nonempty] = ((acc > 0).astype(np.uint64) @ pow2).astype(np.int64)
        return pd.Series(out)

    return _sim


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tables: int = 4,
    max_bucket: int = 2000,
    metrics_out: dict | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidate generation: split the 64-bit hash into ``n_tables`` 16-bit
    chunks; by pigeonhole any pair within Hamming distance n_tables-1 (and
    most within max_hamming) shares at least one exact chunk -> bucket
    join per chunk, then exact popcount verification. ``max_bucket`` is the
    skew guard (same contract as minhash_lsh_pairs): a degenerate chunk
    bucket — e.g. a corpus of identical boilerplate — is dropped instead of
    exploding one task quadratically; pass ``metrics_out={}`` to observe
    dropped_buckets / dropped_bucket_rows. Call :func:`release_cached` on
    the result to unpersist the hash frame.
    """
    docs_h = docs.select(
        F.col(id_col).alias("doc_id"), simhash_udf()(F.col(text_col)).alias("sh")
    ).persist()
    chunk_w = 64 // n_tables
    chunks = docs_h.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.shiftrightunsigned("sh", t * chunk_w).bitwiseAND(
                            F.lit((1 << chunk_w) - 1)
                        ).alias("ck"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sh", F.col("c.tbl").alias("tbl"), F.col("c.ck").alias("ck"))
    bsizes = chunks.groupBy("tbl", "ck").agg(F.count("*").alias("_n"))
    _record_drops(bsizes, "_n", max_bucket, metrics_out)
    ok = bsizes.filter((F.col("_n") > 1) & (F.col("_n") <= max_bucket)).select("tbl", "ck")
    chunks = chunks.join(ok, ["tbl", "ck"])
    c2 = chunks.select("tbl", "ck", F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    cand = (
        chunks.join(c2, ["tbl", "ck"])
        .filter(F.col("doc_id") < F.col("doc_b"))
        .select(F.col("doc_id").alias("doc_a"), "doc_b", F.col("sh").alias("sh_a"), "sh_b")
        .distinct()
    )
    return _with_cached(
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming"),
        docs_h,
    )

# ---------------------------------------------------------------------------
# shared plumbing: skew-drop observability + cache lifecycle


def _record_drops(sizes: DataFrame, n_col: str, max_bucket: int, metrics_out: dict | None) -> None:
    """Fill ``metrics_out`` with how much the max_bucket skew guard dropped
    (bucket-stats-sized aggregation — one tiny job, only when requested)."""
    if metrics_out is None:
        return
    row = (
        sizes.filter(F.col(n_col) > max_bucket)
        .agg(F.count("*").alias("b"), F.coalesce(F.sum(n_col), F.lit(0)).alias("r"))
        .collect()[0]
    )
    metrics_out["dropped_buckets"] = int(row["b"])
    metrics_out["dropped_bucket_rows"] = int(row["r"])


def _with_cached(df: DataFrame, *cached: DataFrame) -> DataFrame:
    """Track the persisted intermediates a result depends on, so callers
    can free them once the result is consumed (the frames must stay cached
    until then — the returned plan reads them)."""
    df._graft_cached = list(cached)
    return df


def release_cached(df: DataFrame) -> None:
    """Unpersist the intermediates a pair-generation result pinned
    (signature / hash frames). Call after the result is materialized;
    prevents cache leaks across many pipeline invocations in one session."""
    for c in getattr(df, "_graft_cached", []):
        c.unpersist()


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination — the published n-gram overlap test for
    LLM training corpora (GPT-3 appendix C used 13-grams; 8 is a common
    modern choice): flag every training doc sharing at least one word
    n-gram with the benchmark/eval set.

    Scale shape: the benchmark's DISTINCT n-gram set is the small side
    by construction (eval sets are tiny next to a training corpus) — it
    broadcasts; the training side streams through one hash join with
    map-side partial aggregation per doc. No shuffle is proportional to
    the corpus beyond the per-doc count.

    Returns (doc_id, n_ngrams, n_hit, hit_frac) for CONTAMINATED docs
    only (n_hit >= 1), where n_ngrams counts the doc's DISTINCT n-grams
    and hit_frac = n_hit / n_ngrams. Docs shorter than ``n`` tokens have
    no n-grams and cannot be flagged."""
    tg = token_set(train, text_col, id_col, n)
    bg = token_set(bench, text_col, id_col, n).select("gram").distinct()
    totals = tg.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    hits = (
        tg.join(F.broadcast(bg), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return hits.join(totals, "doc_id").select(
        "doc_id", "n_ngrams", "n_hit",
        (F.col("n_hit") / F.col("n_ngrams")).alias("hit_frac"),
    )
