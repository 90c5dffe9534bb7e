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


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of a token list (FNV-1a, pure numpy-per-token)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = np.uint64(0xCBF29CE484222325)
        for b in t.encode("utf-8"):
            h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3) & np.uint64(0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def minhash_signatures_udf(num_perm: int = 64):
    """pandas UDF: text -> array<long> MinHash signature (fixed seeds)."""
    salts = _splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)
        sigs = []
        for ts in toks:
            uniq = list(dict.fromkeys(ts))
            if not uniq:
                sigs.append([0] * num_perm)
                continue
            th = _token_hashes(uniq)  # (T,)
            # h_i(t) = splitmix64(token_hash ^ salt_i); min over tokens
            m = _splitmix64(th[None, :] ^ salts[:, None]).min(axis=1)
            sigs.append(m.astype(np.int64).tolist())
        return pd.Series(sigs)

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
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH candidate generation.

    bands x rows layout (rows = num_perm // bands); docs sharing any full
    band land in a candidate bucket; candidates are verified with the
    estimated (or exact) Jaccard. ``max_bucket`` caps pathological buckets
    (e.g. empty/boilerplate texts) — the explicit skew guard: a bucket over
    the cap is dropped with its size logged in the plan rather than
    quadratically exploding a task.
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
        return est.filter(F.col("jaccard_est") >= threshold)
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
    return (
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


# ---------------------------------------------------------------------------
# SimHash


def simhash_udf():
    """pandas UDF: text -> 64-bit SimHash (long)."""

    @pandas_udf("long")
    def _sim(texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)
        out = np.zeros(len(toks), dtype=np.int64)
        bits = np.arange(64, dtype=np.uint64)
        for i, ts in enumerate(toks):
            if not ts:
                continue
            th = _token_hashes(list(ts))  # weight = tf via repetition
            acc = np.zeros(64, dtype=np.int64)
            for h in th:
                bitvec = ((h >> bits) & np.uint64(1)).astype(np.int64)
                acc += 2 * bitvec - 1
            sh = np.uint64(0)
            for b in range(64):
                if acc[b] > 0:
                    sh |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sh.astype(np.int64))
        return pd.Series(out)

    return _sim


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tables: int = 4,
    max_bucket: int = 2000,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidate generation: split the 64-bit hash into ``n_tables`` 16-bit
    chunks; by pigeonhole any pair within Hamming distance n_tables-1 (and
    most within max_hamming) shares at least one exact chunk -> bucket
    join per chunk, then exact popcount verification. ``max_bucket`` is the
    skew guard (same contract as minhash_lsh_pairs): a degenerate chunk
    bucket — e.g. a corpus of identical boilerplate — is dropped instead of
    exploding one task quadratically.
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
    ok = (
        chunks.groupBy("tbl", "ck")
        .agg(F.count("*").alias("_n"))
        .filter((F.col("_n") > 1) & (F.col("_n") <= max_bucket))
        .select("tbl", "ck")
    )
    chunks = chunks.join(ok, ["tbl", "ck"])
    c2 = chunks.select("tbl", "ck", F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    cand = (
        chunks.join(c2, ["tbl", "ck"])
        .filter(F.col("doc_id") < F.col("doc_b"))
        .select(F.col("doc_id").alias("doc_a"), "doc_b", F.col("sh").alias("sh_a"), "sh_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
