"""Snapshot-log semantics of the atomic publish (engine/publish.py):
append-only history, pinned reads, uncommitted-entry exclusion. Pure
filesystem logic — no Spark session needed."""

from __future__ import annotations

import json
import os

import pytest

from engine.publish import atomic_publish, list_snapshots, read_manifest


def _publish(root, payload):
    def writer(vdir):
        with open(os.path.join(vdir, "data.json"), "w") as f:
            json.dump(payload, f)
        return {"payload": payload}

    return atomic_publish(root, writer)


def test_snapshot_history_and_pinning(tmp_path):
    root = str(tmp_path / "idx")
    _publish(root, "alpha")
    _publish(root, "beta")
    _publish(root, "gamma")

    cur = read_manifest(root)
    assert cur["version"] == "v_2"
    assert cur["parent"] == "v_1"

    snaps = list_snapshots(root)
    assert [s["version"] for s in snaps] == ["v_0", "v_1", "v_2"]
    assert [s["parent"] for s in snaps] == [None, "v_0", "v_1"]

    pinned = read_manifest(root, version="v_0")
    assert pinned["version"] == "v_0"
    assert pinned["stats"]["payload"] == "alpha"
    # every historical version dir remains readable
    with open(os.path.join(root, "v_0", "data.json")) as f:
        assert json.load(f) == "alpha"

    with pytest.raises(KeyError):
        read_manifest(root, version="v_99")


def test_uncommitted_log_entry_is_invisible(tmp_path):
    """A crash between the snapshot-log append and the manifest replace
    leaves a trailing log line without a committed manifest — readers must
    not surface it."""
    root = str(tmp_path / "idx")
    _publish(root, "alpha")
    _publish(root, "beta")
    # simulate the torn publish: log says v_9 but the manifest never moved
    with open(os.path.join(root, "_snapshots.jsonl"), "a") as f:
        f.write(json.dumps({"version": "v_9", "parent": "v_1",
                            "published_at": 0, "stats": {}}) + "\n")
    assert [s["version"] for s in list_snapshots(root)] == ["v_0", "v_1"]
    with pytest.raises(KeyError):
        read_manifest(root, version="v_9")


def test_writer_failure_leaves_manifest_untouched(tmp_path):
    root = str(tmp_path / "idx")
    _publish(root, "alpha")

    def bad_writer(vdir):
        raise RuntimeError("mid-write crash")

    with pytest.raises(RuntimeError):
        atomic_publish(root, bad_writer)
    assert read_manifest(root)["version"] == "v_0"
    assert [s["version"] for s in list_snapshots(root)] == ["v_0"]
