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
    """Open a BM25Searcher through an alias. The filter (if any) becomes
    the searcher's default_doc_filter, AND-composed with any per-query
    doc_filter."""
    from pyspark.sql import functions as F

    from ..config import DEFAULT
    from .build import read_index
    from .query import BM25Searcher

    reg = _read_aliases(Path(root))
    if name not in reg:
        raise KeyError(f"no such alias: {name}")
    ent = reg[name]
    ix = read_index(spark, ent["path"], cfg or DEFAULT)
    flt = F.expr(ent["filter"]) if "filter" in ent else None
    return BM25Searcher(ix, default_doc_filter=flt)
