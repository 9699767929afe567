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


def test_phantom_entry_stays_invisible_after_later_commits(tmp_path):
    """Round-3 advice: a torn publish's log entry must not become
    retroactively visible once LATER publishes commit past it — the
    committed parent chain never includes the phantom."""
    root = str(tmp_path / "idx")
    _publish(root, "alpha")  # v_0 committed
    # torn publish: v_1 dir + log line exist, manifest never moved
    os.makedirs(os.path.join(root, "v_1"))
    with open(os.path.join(root, "_snapshots.jsonl"), "a") as f:
        f.write(json.dumps({"version": "v_1", "parent": "v_0",
                            "published_at": 0, "stats": {}}) + "\n")
    _publish(root, "beta")  # commits v_2 with parent v_0

    assert read_manifest(root)["version"] == "v_2"
    assert read_manifest(root)["parent"] == "v_0"
    assert [s["version"] for s in list_snapshots(root)] == ["v_0", "v_2"]
    with pytest.raises(KeyError):
        read_manifest(root, version="v_1")


def test_expire_snapshots(tmp_path):
    """expireSnapshots analog: expired versions become unreadable and their
    dirs are gone; kept versions + manifest are intact; AGED orphan dirs
    pruned (fresh orphans are covered by the race test below)."""
    from engine.publish import expire_snapshots

    root = str(tmp_path / "idx")
    for p in ("alpha", "beta", "gamma", "delta"):
        _publish(root, p)
    orphan = os.path.join(root, "v_77")  # orphan, never committed
    os.makedirs(orphan)
    os.utime(orphan, (0, 0))  # ancient mtime → past any grace window

    expired = expire_snapshots(root, keep_last=2)
    assert expired == ["v_0", "v_1", "v_77"]
    assert read_manifest(root)["version"] == "v_3"  # manifest untouched
    assert [s["version"] for s in list_snapshots(root)] == ["v_2", "v_3"]
    for v, alive in (("v_0", False), ("v_1", False), ("v_2", True), ("v_3", True)):
        assert os.path.isdir(os.path.join(root, v)) is alive
    with open(os.path.join(root, "v_3", "data.json")) as f:
        assert json.load(f) == "delta"
    with pytest.raises(KeyError):
        read_manifest(root, version="v_0")
    # pinning a kept historical version still works
    assert read_manifest(root, version="v_2")["stats"]["payload"] == "gamma"


def test_expire_never_destroys_inflight_publish(tmp_path):
    """Round-4 advice (medium): a CONCURRENT atomic_publish that has created
    its v_<n> dir but not yet swapped the manifest must survive a
    simultaneous expire_snapshots — deleting it would leave the subsequent
    manifest commit pointing at a destroyed directory. The in-flight dir is
    indistinguishable from an orphan by name, so expire age-gates unknown
    v_* dirs (Iceberg's expireSnapshots / orphan-removal split)."""
    from engine.publish import expire_snapshots

    root = str(tmp_path / "idx")
    for p in ("alpha", "beta", "gamma"):
        _publish(root, p)
    # simulate the race: writer has created v_3 + written data, manifest not
    # yet swapped, when expire runs
    inflight = os.path.join(root, "v_3")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "data.json"), "w") as f:
        json.dump("delta-in-flight", f)

    expired = expire_snapshots(root, keep_last=1)
    assert "v_3" not in expired  # fresh mtime → inside the grace window
    assert os.path.isdir(inflight)
    with open(os.path.join(inflight, "data.json")) as f:
        assert json.load(f) == "delta-in-flight"
    # superseded committed versions still expire regardless of age
    assert expired == ["v_0", "v_1"]
    # ...and the racing publish can still complete and commit on top
    _publish(root, "epsilon")  # becomes v_4 (v_3's dir already exists)
    assert read_manifest(root)["version"] == "v_4"
