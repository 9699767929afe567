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
    """Ordered snapshot history up to the committed manifest (an entry whose
    manifest replace never landed is excluded)."""
    with open(os.path.join(root, "_manifest.json")) as f:
        current = json.load(f)["version"]
    out = []
    path = os.path.join(root, "_snapshots.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
    committed = []
    for snap in out:
        committed.append(snap)
        if snap["version"] == current:
            break
    return committed
