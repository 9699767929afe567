"""Atomic publish + snapshot log: the reference's zero-downtime ES alias swap
(`es_filebrowser_index.py` bulk-load + aliases call ≈L250–350 [R, SURVEY.md
§2.A15]) re-expressed as a versioned-directory + manifest-pointer swap, with
an Iceberg-shaped snapshot surface on top (A3 generalized).

In production this is an Iceberg snapshot commit (`df.writeTo(...)`); the
sandbox has no Iceberg jars (SURVEY.md §7.2.4), so we emulate the same
contract: writers build a fresh `v_<n>/` directory, then a single
`os.replace` of `_manifest.json` repoints readers — readers never observe a
half-written index. Every publish also appends to `_snapshots.jsonl`, the
snapshot log backing the time-travel / incremental-read API:

- ``list_snapshots(root)``      — ordered snapshot metadata (Iceberg
                                  `table.snapshots()` analog)
- ``read_manifest(root, version=...)`` — pin a snapshot (`VERSION AS OF`)
- ``open_index(path, version=...)`` in engine.build rides this to read any
  historical index version while new versions keep publishing
"""

from __future__ import annotations

import json
import os
import time


def atomic_publish(root: str, writer) -> tuple[str, dict]:
    """Run `writer(version_dir) -> stats` into a new version dir, then
    atomically repoint the manifest and append the snapshot-log entry.
    Returns (version_dir, stats)."""
    os.makedirs(root, exist_ok=True)
    existing = [d for d in os.listdir(root) if d.startswith("v_")]
    n = 1 + max((int(d[2:]) for d in existing), default=-1)
    version = f"v_{n}"
    vdir = os.path.join(root, version)
    os.makedirs(vdir, exist_ok=True)
    stats = writer(vdir)
    prev = None
    try:
        prev = read_manifest(root)["version"]
    except FileNotFoundError:
        pass
    entry = {
        "version": version,
        "parent": prev,
        "published_at": time.time(),
        "stats": stats,
    }
    tmp = os.path.join(root, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(entry, f, indent=2)
    # the snapshot log is append-only; the manifest replace is the commit
    # point, so a crash between the two leaves at worst an uncommitted
    # (ignored) trailing log line — list_snapshots filters to ≤ current
    with open(os.path.join(root, "_snapshots.jsonl"), "a") as f:
        f.write(json.dumps(entry) + "\n")
    os.replace(tmp, os.path.join(root, "_manifest.json"))
    return vdir, stats


def read_manifest(root: str, version: str | None = None) -> dict:
    """Current manifest, or the pinned snapshot's log entry (`VERSION AS OF`
    semantics: the pinned version must exist in the snapshot log)."""
    with open(os.path.join(root, "_manifest.json")) as f:
        current = json.load(f)
    if version is None or version == current["version"]:
        return current
    for snap in list_snapshots(root):
        if snap["version"] == version:
            return snap
    raise KeyError(f"no snapshot {version!r} in {root}")


def list_snapshots(root: str) -> list[dict]:
    """Ordered snapshot history: exactly the parent chain of the committed
    manifest, oldest first. An entry whose manifest replace never landed is
    excluded even after LATER publishes commit past it — the committed chain
    never points at it (a torn v_1 on top of v_0 is followed by v_2 with
    parent v_0), so walking parents from the current version drops phantoms
    that mere log-position truncation would resurrect."""
    with open(os.path.join(root, "_manifest.json")) as f:
        current = json.load(f)["version"]
    by_version: dict[str, dict] = {}
    path = os.path.join(root, "_snapshots.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    snap = json.loads(line)
                    by_version[snap["version"]] = snap
    chain: list[dict] = []
    v: str | None = current
    while v is not None and v in by_version:
        snap = by_version[v]
        chain.append(snap)
        v = snap.get("parent")
    chain.reverse()
    return chain


def expire_snapshots(
    root: str, keep_last: int = 1, orphan_grace_sec: float = 3 * 86400.0
) -> list[str]:
    """Iceberg `expireSnapshots` analog: the snapshot log otherwise grows
    unboundedly and every historical `v_*` directory stays on disk. Keeps the
    newest ``keep_last`` committed snapshots (always including the current
    manifest), deletes the version directories of snapshots that are provably
    superseded, and rewrites the log to the kept tail so
    `read_manifest(version=...)` can no longer pin an expired snapshot.
    Returns the expired version names. The manifest itself is untouched:
    current readers are never disturbed.

    Two deletion classes, mirroring Iceberg's split between expireSnapshots
    and orphan-file removal (default 3-day olderThan):

    - **expired chain entries** — versions on the committed parent chain
      older than the kept tail. These are known-superseded commits; deleting
      them is always safe.
    - **orphan dirs** — `v_*` directories NOT on the committed chain (a
      crashed writer's leftovers... or a CONCURRENT writer that has created
      its `v_<n>` dir but not yet swapped the manifest — the two are
      indistinguishable by name alone). These are removed only when their
      mtime is older than ``orphan_grace_sec``, so an in-flight publish is
      never destroyed mid-write (its dir is seconds old, far inside any
      sane grace window)."""
    import shutil
    import time as _time

    chain = list_snapshots(root)
    keep = chain[-max(1, keep_last):]
    kept_versions = {s["version"] for s in keep}
    chain_versions = {s["version"] for s in chain}
    now = _time.time()
    expired = []
    for d in sorted(os.listdir(root)):
        if not d.startswith("v_") or d in kept_versions:
            continue
        p = os.path.join(root, d)
        if d in chain_versions:
            # superseded committed snapshot: always safe to delete
            shutil.rmtree(p, ignore_errors=True)
            expired.append(d)
        else:
            # orphan OR a concurrent publish mid-write: age-gate on mtime
            try:
                age = now - os.path.getmtime(p)
            except OSError:
                continue
            if age >= orphan_grace_sec:
                shutil.rmtree(p, ignore_errors=True)
                expired.append(d)
    tmp = os.path.join(root, "_snapshots.jsonl.tmp")
    with open(tmp, "w") as f:
        for snap in keep:
            f.write(json.dumps(snap) + "\n")
    os.replace(tmp, os.path.join(root, "_snapshots.jsonl"))
    return expired
