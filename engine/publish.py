"""Atomic publish: the reference's zero-downtime ES alias swap
(`es_filebrowser_index.py` bulk-load + aliases call ≈L250–350 [R, SURVEY.md
§2.A15]) re-expressed as a versioned-directory + manifest-pointer swap.

In production this is an Iceberg snapshot commit (`df.writeTo(...)`); the
sandbox has no Iceberg jars (SURVEY.md §7.2.4), so we emulate the same
contract: writers build a fresh `v_<n>/` directory, then a single
`os.replace` of `_manifest.json` repoints readers — readers never observe a
half-written index."""

from __future__ import annotations

import json
import os
import time


def atomic_publish(root: str, writer) -> tuple[str, dict]:
    """Run `writer(version_dir) -> stats` into a new version dir, then
    atomically repoint the manifest. Returns (version_dir, stats)."""
    os.makedirs(root, exist_ok=True)
    existing = [d for d in os.listdir(root) if d.startswith("v_")]
    n = 1 + max((int(d[2:]) for d in existing), default=-1)
    version = f"v_{n}"
    vdir = os.path.join(root, version)
    os.makedirs(vdir, exist_ok=True)
    stats = writer(vdir)
    tmp = os.path.join(root, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"version": version, "published_at": time.time(), "stats": stats},
            f,
            indent=2,
        )
    os.replace(tmp, os.path.join(root, "_manifest.json"))
    return vdir, stats


def read_manifest(root: str) -> dict:
    with open(os.path.join(root, "_manifest.json")) as f:
        return json.load(f)
