"""Deterministic synthetic transcripts + reference query set (FIXTURES.md).

Everything is a pure function of (n_conv, seed): no wall-clock, no
environment dependence, so the same corpus regenerates bit-identically for
unit tests, the correctness gate, and the two-parallelism-level benchmark
(BASELINE.json: deterministic synthesis, per-turn text equality invariant).

Schema (BASELINE.json input_hint):
    conv_id string, turn_idx int32, role string, text string,
    tool string, ts timestamp
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 1000
ZIPF_S = 1.1  # vocab skew: head terms genuinely hot (exercises skew handling)
TURN_ZIPF_A = 1.3
MAX_TURNS = 40
MIN_TOKENS, MAX_TOKENS = 5, 120
EMPTY_FRAC = 0.02
TOOLS = np.array(["bash", "search", "read", "write", "browser"])
EPOCH = np.datetime64("2024-01-01T00:00:00")

_VOCAB = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)])


def vocab() -> np.ndarray:
    return _VOCAB.copy()


def _zipf_probs(n: int, s: float) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return p / p.sum()


def gen_transcripts_pdf(n_conv: int, seed: int = 42) -> pd.DataFrame:
    """Generate the transcripts corpus as a pandas DataFrame.

    Row order is a deterministic shuffle of conversations (NOT
    (conv_id, turn_idx) order) to prove docID assignment is independent of
    input row order (FIXTURES.md §1).
    """
    rng = np.random.default_rng(seed)

    n_turns_per_conv = np.minimum(1 + rng.zipf(TURN_ZIPF_A, size=n_conv), MAX_TURNS)
    total = int(n_turns_per_conv.sum())

    conv_idx = np.repeat(np.arange(n_conv), n_turns_per_conv)
    turn_idx = (
        np.arange(total) - np.repeat(np.cumsum(n_turns_per_conv) - n_turns_per_conv, n_turns_per_conv)
    ).astype(np.int32)

    # roles: even=user, odd=assistant; 10% of conversations open with system;
    # 15% of turns are tool turns (never the system turn).
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    sys_conv = rng.random(n_conv) < 0.10
    is_sys = (turn_idx == 0) & sys_conv[conv_idx]
    is_tool = (rng.random(total) < 0.15) & ~is_sys
    role[is_sys] = "system"
    role[is_tool] = "tool"
    tool = np.full(total, None, dtype=object)
    tool[is_tool] = TOOLS[rng.integers(0, len(TOOLS), size=int(is_tool.sum()))]

    # text: Zipfian vocab, 5-120 tokens, ~2% empty turns
    n_tok = rng.integers(MIN_TOKENS, MAX_TOKENS + 1, size=total)
    n_tok[rng.random(total) < EMPTY_FRAC] = 0
    flat = rng.choice(VOCAB_SIZE, size=int(n_tok.sum()), p=_zipf_probs(VOCAB_SIZE, ZIPF_S))
    flat_words = _VOCAB[flat]
    bounds = np.cumsum(n_tok)[:-1]
    text = np.array([" ".join(ws) for ws in np.split(flat_words, bounds)], dtype=object)

    # ts: epoch + conv_start(hash of conv index) + 37s * turn_idx
    conv_start = (np.arange(n_conv, dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(86400 * 365)
    ts = EPOCH + ((conv_start[conv_idx].astype(np.int64) + 37 * turn_idx.astype(np.int64)) * np.timedelta64(1, "s"))

    pdf = pd.DataFrame(
        {
            "conv_id": np.array([f"c{i:08d}" for i in range(n_conv)], dtype=object)[conv_idx],
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts).dt.tz_localize("UTC"),
        }
    )

    # deterministic shuffle of conversation order (row order != key order)
    perm = rng.permutation(n_conv)
    order = np.argsort(perm[conv_idx], kind="stable")
    return pdf.iloc[order].reset_index(drop=True)


TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def gen_transcripts(spark, n_conv: int, seed: int = 42, n_partitions: int | None = None):
    """Spark DataFrame variant (Arrow-accelerated createDataFrame)."""
    pdf = gen_transcripts_pdf(n_conv, seed)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS_DDL)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df


def write_transcripts_parquet(
    path: str, n_conv: int, seed: int = 42, row_group_size: int = 65536
) -> int:
    """Write the corpus straight to parquet (fast path for benchmarks).

    Small row groups keep the single file splittable: Spark parallelizes
    parquet scans at row-group granularity, so a 1M-row file with default
    (1M-row) groups would serialize every source scan to ~1 task."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = gen_transcripts_pdf(n_conv, seed)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(tbl, path, compression="zstd", row_group_size=row_group_size)
    return len(pdf)


def gen_query_set(seed: int = 42, n_or: int = 20, n_and: int = 10) -> pd.DataFrame:
    """The reference query set (FIXTURES.md §2): single rare/head terms,
    2-5 term OR, AND, duplicate terms, OOV, empty; k in {1, 10, 100}."""
    rng = np.random.default_rng(seed + 1)
    rows: list[tuple[str, str]] = []

    head = _VOCAB[:8]
    rare = _VOCAB[-200:]
    rows += [(t, "or") for t in head[:4]]  # single head terms
    rows += [(rare[int(i)], "or") for i in rng.integers(0, len(rare), 4)]  # single rare
    for _ in range(n_or):  # multi-term OR
        n = int(rng.integers(2, 6))
        terms = _VOCAB[rng.choice(VOCAB_SIZE, size=n, replace=False, p=_zipf_probs(VOCAB_SIZE, 0.6))]
        rows.append((" ".join(terms), "or"))
    for _ in range(n_and):  # AND (bool must)
        n = int(rng.integers(2, 4))
        terms = _VOCAB[rng.choice(60, size=n, replace=False)]  # headish so matches exist
        rows.append((" ".join(terms), "and"))
    rows.append((f"{head[0]} {head[0]} {head[1]}", "or"))  # duplicate query terms
    rows.append((f"{head[0]} {head[0]}", "and"))
    rows.append(("zz_out_of_vocab_zz", "or"))  # OOV
    rows.append((f"zz_out_of_vocab_zz {head[2]}", "or"))  # OOV mixed
    rows.append((f"zz_out_of_vocab_zz {head[2]}", "and"))  # AND w/ OOV -> empty
    rows.append(("", "or"))  # empty query

    ks = [int(k) for k in rng.choice([1, 10, 100], size=len(rows), p=[0.2, 0.5, 0.3])]
    return pd.DataFrame(
        {
            "query_id": np.arange(len(rows), dtype=np.int64),
            "query_text": [r[0] for r in rows],
            "k": np.array(ks, dtype=np.int32),
            "mode": [r[1] for r in rows],
        }
    )
