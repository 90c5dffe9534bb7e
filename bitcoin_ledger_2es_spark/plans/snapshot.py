"""Snapshot / restore + index aliases: the ES ``_snapshot`` and
``_aliases`` operational surface over this engine's on-disk index layout.

Semantics mirrored from ES (public docs):

  * a snapshot is a point-in-time, self-contained copy of an index that
    can be restored elsewhere; an interrupted snapshot must never look
    complete. Here: copy every data file, then write ``MANIFEST.json``
    (relative path -> {sha256, bytes}) LAST — the manifest is the commit
    marker, so a crash mid-copy leaves a snapshot that ``restore`` and
    ``verify_snapshot`` refuse.
  * restore verifies every file against the manifest AFTER copying and
    lands atomically: files are copied into ``<dest>.__restoring__`` and
    the final directory appears via a single rename (the same
    rename-is-commit discipline streaming/compaction.py uses).
  * aliases are a tiny JSON registry (name -> index path + optional
    non-scoring filter expression); writes go tmp-file-then-rename, so a
    reader never observes a torn registry and swapping an alias between
    two indexes is atomic — the ES zero-downtime reindex idiom.

Scale note: the copies here are driver-side ``shutil`` loops, fine for
the sandbox. At 100 TB the copy itself would be one task per file
(exactly the manifest's file list) against an object store — the
manifest/commit-marker protocol is the part that matters and is
copier-agnostic; nothing in the format assumes a local filesystem.
"""

from __future__ import annotations

import hashlib
import json
import shutil
from pathlib import Path

MANIFEST = "MANIFEST.json"
ALIASES = "aliases.json"


def _data_files(root: Path) -> list[Path]:
    # skipped: the manifest itself, dot-files (Hadoop .crc checksums,
    # .tmp), and Spark's _SUCCESS job markers — everything else is data
    out = []
    for p in sorted(root.rglob("*")):
        if not p.is_file():
            continue
        name = p.name
        if name == MANIFEST or name.startswith(".") or name == "_SUCCESS":
            continue
        out.append(p)
    return out


def _sha256(p: Path) -> str:
    h = hashlib.sha256()
    with p.open("rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def snapshot_index(index_path: str, snap_path: str) -> dict:
    """Copy the on-disk index at ``index_path`` to ``snap_path`` and
    commit it by writing the manifest last. Returns the manifest dict.
    Refuses an existing committed snapshot (snapshots are immutable —
    delete it explicitly to re-take); an UNcommitted leftover (crash
    residue, no manifest) is replaced."""
    src, dst = Path(index_path), Path(snap_path)
    if (dst / MANIFEST).exists():
        raise FileExistsError(f"snapshot already committed at {snap_path}")
    if dst.exists():
        shutil.rmtree(dst)  # uncommitted residue — safe: no manifest
    files = _data_files(src)
    if not files:
        raise FileNotFoundError(f"no index files under {index_path}")
    manifest: dict[str, dict] = {}
    for f in files:
        rel = f.relative_to(src).as_posix()
        target = dst / rel
        target.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(f, target)
        manifest[rel] = {"sha256": _sha256(target), "bytes": target.stat().st_size}
    tmp = dst / (MANIFEST + ".tmp")
    tmp.write_text(json.dumps(manifest, sort_keys=True, indent=1))
    tmp.rename(dst / MANIFEST)  # commit
    return manifest


def verify_snapshot(snap_path: str) -> dict:
    """Check a snapshot's integrity: every manifest entry present with
    matching size+sha256, no extra data files. Returns the manifest;
    raises ValueError on any discrepancy (including a missing manifest —
    i.e. an uncommitted snapshot)."""
    dst = Path(snap_path)
    mf = dst / MANIFEST
    if not mf.exists():
        raise ValueError(f"snapshot at {snap_path} has no manifest (uncommitted?)")
    manifest = json.loads(mf.read_text())
    seen = set()
    for rel, meta in manifest.items():
        p = dst / rel
        if not p.exists():
            raise ValueError(f"snapshot missing file {rel}")
        if p.stat().st_size != meta["bytes"] or _sha256(p) != meta["sha256"]:
            raise ValueError(f"snapshot file corrupt: {rel}")
        seen.add(rel)
    extra = {f.relative_to(dst).as_posix() for f in _data_files(dst)} - seen
    if extra:
        raise ValueError(f"snapshot has unmanifested files: {sorted(extra)[:5]}")
    return manifest


def restore_snapshot(snap_path: str, dest_path: str, overwrite: bool = False) -> None:
    """Verified, atomic restore: verify the snapshot, copy into
    ``<dest>.__restoring__`` re-hashing every file as it lands, then
    rename into place. ``overwrite=True`` retires an existing dest by
    rename-aside AFTER the new tree is complete (never delete first)."""
    manifest = verify_snapshot(snap_path)
    src, dst = Path(snap_path), Path(dest_path)
    if dst.exists() and not overwrite:
        raise FileExistsError(f"restore target exists: {dest_path}")
    staging = dst.parent / (dst.name + ".__restoring__")
    if staging.exists():
        shutil.rmtree(staging)  # crash residue, never committed
    for rel, meta in manifest.items():
        target = staging / rel
        target.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src / rel, target)
        if _sha256(target) != meta["sha256"]:
            raise ValueError(f"restore copy corrupt: {rel}")
    aside = dst.parent / (dst.name + ".__retired__")
    if dst.exists():
        if aside.exists():
            shutil.rmtree(aside)
        dst.rename(aside)
    staging.rename(dst)  # commit
    if aside.exists():
        shutil.rmtree(aside)


# --------------------------------------------------------------------------
# Aliases


def _read_aliases(root: Path) -> dict:
    f = root / ALIASES
    return json.loads(f.read_text()) if f.exists() else {}


def _write_aliases(root: Path, reg: dict) -> None:
    root.mkdir(parents=True, exist_ok=True)
    tmp = root / (ALIASES + ".tmp")
    tmp.write_text(json.dumps(reg, sort_keys=True, indent=1))
    tmp.rename(root / ALIASES)  # atomic swap — readers see old or new


def put_alias(root: str, name: str, index_path: str,
              doc_filter_sql: str | None = None) -> None:
    """Point ``name`` at ``index_path`` (atomic; replaces any previous
    target — the ES actions=[remove+add] swap). ``doc_filter_sql`` is an
    optional non-scoring predicate over docmap columns (a Spark SQL
    expression string, e.g. ``"NOT is_rollup"``) — the ES filtered-alias
    shape; it is applied as ``doc_filter`` on every query through the
    alias, so it rides the pruned scan for free."""
    r = Path(root)
    reg = _read_aliases(r)
    reg[name] = {"path": str(index_path)}
    if doc_filter_sql:
        reg[name]["filter"] = doc_filter_sql
    _write_aliases(r, reg)


def put_alias_multi(
    root: str,
    name: str,
    indices: list[str],
    write: str | None = None,
    doc_filter_sql: str | None = None,
) -> None:
    """Point ``name`` at SEVERAL indexes (the ES multi-index alias, and
    the shape rollover maintains). ``write`` marks the ES
    ``is_write_index`` member (default: the last entry) — readers search
    every member, ingest targets only the write member. The write member
    may not exist on disk yet (a just-rolled-over, not-yet-written
    index); every other member must."""
    if not indices:
        raise ValueError("multi alias needs at least one index")
    write = write if write is not None else indices[-1]
    if write not in indices:
        raise ValueError(f"write index {write} not in indices")
    r = Path(root)
    reg = _read_aliases(r)
    ent: dict = {"indices": [str(p) for p in indices], "write": str(write)}
    if doc_filter_sql:
        ent["filter"] = doc_filter_sql
    reg[name] = ent
    _write_aliases(r, reg)


def delete_alias(root: str, name: str) -> None:
    r = Path(root)
    reg = _read_aliases(r)
    if name not in reg:
        raise KeyError(f"no such alias: {name}")
    del reg[name]
    _write_aliases(r, reg)


def get_aliases(root: str) -> dict:
    """The _aliases listing: {name: {path, filter?}}."""
    return _read_aliases(Path(root))


def open_alias(spark, root: str, name: str, cfg=None):
    """Open a searcher through an alias. The filter (if any) becomes the
    searcher's default_doc_filter, AND-composed with any per-query
    doc_filter. A single-index alias opens a BM25Searcher; a multi-index
    alias (put_alias_multi / rollover) opens a MultiSearcher over every
    member — a missing member is tolerated ONLY when it is the write
    index (just rolled over, nothing ingested yet), any other missing
    member is an error, never a silent skip."""
    from pyspark.sql import functions as F

    from ..config import DEFAULT
    from .build import read_index
    from .query import BM25Searcher

    reg = _read_aliases(Path(root))
    if name not in reg:
        raise KeyError(f"no such alias: {name}")
    ent = reg[name]
    flt = F.expr(ent["filter"]) if "filter" in ent else None
    if "path" in ent:
        ix = read_index(spark, ent["path"], cfg or DEFAULT)
        return BM25Searcher(ix, default_doc_filter=flt)

    from .multi import MultiSearcher

    searchers = {}
    for p in ent["indices"]:
        if not (Path(p) / "corpus_stats").exists():
            if p == ent["write"]:
                continue  # empty write index — serves zero docs
            raise ValueError(f"alias {name} member missing on disk: {p}")
        ix = read_index(spark, p, cfg or DEFAULT)
        searchers[p] = BM25Searcher(ix, default_doc_filter=flt)
    if not searchers:
        raise ValueError(f"alias {name} has no readable members yet")
    if len(searchers) == 1:
        return next(iter(searchers.values()))
    return MultiSearcher(searchers)


def write_index_of(root: str, name: str) -> str:
    """The alias member ingest should target (ES is_write_index)."""
    reg = _read_aliases(Path(root))
    if name not in reg:
        raise KeyError(f"no such alias: {name}")
    ent = reg[name]
    return ent["path"] if "path" in ent else ent["write"]


def _index_stats(path: str) -> tuple[int, int]:
    """(n_docs, bytes on disk) of an on-disk index, driver-side via the
    parquet footer — no Spark job. A not-yet-written index is (0, 0)."""
    p = Path(path)
    if not (p / "corpus_stats").is_dir():
        return 0, 0
    import pyarrow.parquet as pq

    n_docs = 0
    for f in sorted((p / "corpus_stats").glob("*.parquet")):
        t = pq.read_table(f, columns=["n_docs"])
        if t.num_rows:
            n_docs = int(t.column("n_docs")[0].as_py())
            break
    size = sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
    return n_docs, size


def _next_index_path(write: str) -> str:
    """ES rollover naming: ``<base>-NNNNNN`` increments; anything else
    gets ``-000002`` appended."""
    import re

    m = re.match(r"^(.*)-(\d{6})$", write)
    if m:
        return f"{m.group(1)}-{int(m.group(2)) + 1:06d}"
    return f"{write}-000002"


def rollover(
    root: str,
    name: str,
    max_docs: int | None = None,
    max_size_bytes: int | None = None,
    new_index_path: str | None = None,
    dry_run: bool = False,
) -> dict:
    """ES ``_rollover``: if the alias's write index satisfies any given
    condition (``max_docs`` / ``max_size_bytes``; no conditions = roll
    unconditionally, the ES default), atomically extend the alias with a
    fresh write member. The new member starts as a NOT-yet-written index
    (the ES empty index): ingest targets ``write_index_of`` and lands it
    with write_index/reindex; readers via open_alias keep serving the
    old members meanwhile. Returns the ES-shaped dict
    ``{rolled_over, old_index, new_index, conditions}``."""
    r = Path(root)
    reg = _read_aliases(r)
    if name not in reg:
        raise KeyError(f"no such alias: {name}")
    ent = reg[name]
    if "path" in ent:  # promote single form to the rollover shape
        ent = {"indices": [ent["path"]], "write": ent["path"],
               **({"filter": ent["filter"]} if "filter" in ent else {})}
    old_write = ent["write"]
    n_docs, size = _index_stats(old_write)
    conditions = {}
    if max_docs is not None:
        conditions["max_docs"] = n_docs >= max_docs
    if max_size_bytes is not None:
        conditions["max_size_bytes"] = size >= max_size_bytes
    # ES ORs max_* conditions: rollover fires when ANY is satisfied.
    met = any(conditions.values()) if conditions else True
    new_path = new_index_path or _next_index_path(old_write)
    out = {
        "rolled_over": bool(met and not dry_run),
        "old_index": old_write,
        "new_index": new_path,
        "conditions": conditions,
        "n_docs": n_docs,
        "size_bytes": size,
    }
    if not met or dry_run:
        out["rolled_over"] = False
        return out
    if new_path in ent["indices"]:
        raise FileExistsError(f"rollover target already an alias member: {new_path}")
    if (Path(new_path) / "corpus_stats").exists():
        raise FileExistsError(f"rollover target already written: {new_path}")
    ent["indices"] = ent["indices"] + [new_path]
    ent["write"] = new_path
    reg[name] = ent
    _write_aliases(r, reg)  # atomic — readers see old or new registry
    return out


def lifecycle_tick(
    root: str,
    name: str,
    max_docs: int | None = None,
    max_size_bytes: int | None = None,
    retention_members: int | None = None,
    delete_from_disk: bool = False,
    new_index_path: str | None = None,
) -> dict:
    """One ILM-style policy pass over an alias (the ES index-lifecycle
    hot->delete loop, reduced to its deterministic core): first
    ``rollover`` if any condition is met, then RETIRE the oldest
    members beyond ``retention_members`` (write index always retained;
    retention must keep >= 1 member). Retired members leave the alias
    in one atomic registry write — readers see the old or the new
    member list, never a half state. ``delete_from_disk`` then removes
    retired index directories, but ONLY after the registry write
    committed and ONLY if no other alias still references them
    (a referenced member is retired from THIS alias but kept on disk,
    reported under ``kept_referenced``)."""
    import shutil

    if max_docs is None and max_size_bytes is None:
        # ES ILM's rollover action requires conditions — a tick must
        # never roll unconditionally (use rollover() directly for that)
        raise ValueError("lifecycle_tick needs max_docs or max_size_bytes")
    out = rollover(
        root, name, max_docs=max_docs, max_size_bytes=max_size_bytes,
        new_index_path=new_index_path,
    )
    removed: list[str] = []
    kept_referenced: list[str] = []
    deleted: list[str] = []
    if retention_members is not None:
        if retention_members < 1:
            raise ValueError("retention_members must keep at least one member")
        r = Path(root)
        reg = _read_aliases(r)
        ent = reg[name]
        if "indices" in ent and len(ent["indices"]) > retention_members:
            cut = len(ent["indices"]) - retention_members
            retire = [p for p in ent["indices"][:cut] if p != ent["write"]]
            ent["indices"] = [
                p for p in ent["indices"] if p not in retire
            ]
            reg[name] = ent
            _write_aliases(r, reg)  # atomic commit BEFORE any disk delete
            removed = retire
            if delete_from_disk:
                still_referenced = set()
                for other in reg.values():
                    for p in other.get("indices", []) + (
                        [other["path"]] if "path" in other else []
                    ):
                        still_referenced.add(p)
                for p in retire:
                    if p in still_referenced:
                        kept_referenced.append(p)
                    elif Path(p).exists():
                        shutil.rmtree(p)
                        deleted.append(p)
    out.update(removed=removed, deleted=deleted,
               kept_referenced=kept_referenced)
    return out
