"""ES ``_reindex``: rebuild an index into a new destination from the
retained ``_source`` documents, with an optional query filter and an
optional script transform.

Semantics mirrored from the public ES API:

  * the source of truth is ``_source`` (here: the raw transcripts — a
    DataFrame, a transcripts parquet path, or a segment store whose
    segments retained their ``transcripts/`` dirs);
  * ``query`` restricts which documents are copied (here: a Spark SQL
    predicate over the transcript columns — the non-scoring subset of
    the ES reindex query, which is what reindex filters are in practice);
  * ``script`` may rewrite each document before it is re-analyzed (the
    painless-on-``_source`` step). Here it is a schema-preserving
    DataFrame transform — column expressions, so the rewrite stays
    JVM-side and codegen'd;
  * ``max_docs`` bounds the copy. ES takes documents in query order; a
    distributed engine has no implicit order, so we pin the explicit
    stable one the whole engine uses — ``(conv_id, turn_idx)`` ascending
    — making the selection deterministic across parallelism levels;
  * the destination appears atomically (staging dir + rename, the same
    rename-is-commit discipline as snapshot restore), so the zero-
    downtime idiom works: reindex to a new path, then ``put_alias`` the
    serving alias onto it in one atomic registry swap.

Determinism contract: the destination index is byte-identical to
``write_index(build_index(filtered_and_transformed_source, cfg))`` —
reindex adds routing and atomicity, never content
(tests/test_reindex.py pins this).

Scale note: everything data-sized is a Spark job (one source scan →
filter/transform → the standard build); the driver only stages/renames
directories. A 100-TB reindex is exactly the 100-TB build plus one
pushed-down source filter.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from .build import build_index, write_index

#: columns reindex requires to survive a script transform — the analyzer
#: and docID assignment read exactly these (sources/transcripts.py).
REQUIRED_COLS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _source_frame(spark: SparkSession, source) -> DataFrame:
    """Resolve the ``_source`` documents: a DataFrame is used as-is; a
    segment store root reads every retained ``transcripts/`` dir (after
    crash recovery, so a mid-merge store reads consistently); any other
    path is a transcripts parquet dir."""
    if isinstance(source, DataFrame):
        return source
    p = Path(str(source))
    seg_root = p / "segments"
    if seg_root.is_dir():
        from ..streaming.compaction import recover_merges
        from ..streaming.incremental import _seg_dirs, recover_rewrites

        recover_merges(str(p))
        recover_rewrites(str(p))
        dirs = _seg_dirs(str(p))
        if not dirs:
            raise ValueError(f"segment store at {p} has no segments")
        missing = [d.name for d in dirs if not (d / "transcripts").is_dir()]
        if missing:
            raise ValueError(
                "reindex needs retained _source; segments without a "
                f"transcripts/ dir: {missing} (posting-level compaction "
                "may drop raw sources — reindex from the original table "
                "instead)"
            )
        return spark.read.parquet(*[str(d / "transcripts") for d in dirs])
    return spark.read.parquet(str(p))


def reindex(
    spark: SparkSession,
    source,
    dest_path: str,
    *,
    query: Column | str | None = None,
    script: Callable[[DataFrame], DataFrame] | None = None,
    max_docs: int | None = None,
    cfg: EngineConfig = DEFAULT,
    overwrite: bool = False,
) -> dict:
    """Reindex ``source`` into a fresh on-disk index at ``dest_path``.

    Returns the ES-shaped stats dict ``{"created": <docs in dest, incl.
    conversation rollups>, "total": <source turns matched>, "dest":
    dest_path}``. Refuses an
    existing destination unless ``overwrite=True`` (then the old tree is
    retired aside only after the new one is complete — never deleted
    first, matching restore_snapshot)."""
    dst = Path(dest_path)
    if dst.exists() and not overwrite:
        raise FileExistsError(f"reindex destination exists: {dest_path}")

    docs = _source_frame(spark, source)
    have = dict(docs.dtypes)
    absent = [c for c in REQUIRED_COLS if c not in have]
    if absent:
        raise ValueError(f"source is missing transcript columns: {absent}")
    if query is not None:
        docs = docs.filter(F.expr(query) if isinstance(query, str) else query)
    if script is not None:
        before = [(c, have[c]) for c in REQUIRED_COLS]
        docs = script(docs)
        after = dict(docs.dtypes)
        broke = [
            (c, t) for c, t in before if after.get(c) != t
        ]
        if broke:
            raise ValueError(
                "script must preserve the transcript schema; changed or "
                f"dropped: {broke}"
            )
    if max_docs is not None:
        # ES takes max_docs in query order; the engine's stable total
        # order makes that deterministic under any parallelism
        docs = docs.orderBy("conv_id", "turn_idx").limit(int(max_docs))

    total = docs.count()
    ix = build_index(docs, cfg)

    staging = dst.parent / (dst.name + ".__reindexing__")
    if staging.exists():
        shutil.rmtree(staging)  # crash residue, never committed
    write_index(ix, str(staging))
    aside = dst.parent / (dst.name + ".__retired__")
    if dst.exists():
        if aside.exists():
            shutil.rmtree(aside)
        dst.rename(aside)
    staging.rename(dst)  # commit
    if aside.exists():
        shutil.rmtree(aside)
    return {"created": ix.n_docs, "total": total, "dest": str(dst)}
