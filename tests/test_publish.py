"""publish_atomically contracts (pure filesystem, no Spark): tmp-build +
atomic rename, early return on an existing publication, claim-by-rename heal
of marker-less squatters, scratch cleanup on failure, and graceful lost-race
handling when a concurrent publication wins the rename."""

import os

import pytest

from intuition_spark.driver_gate import publish_atomically


def _touch(p):
    os.makedirs(os.path.dirname(p), exist_ok=True)
    open(p, "w").write("x")


def test_existing_publication_short_circuits(tmp_path):
    path = str(tmp_path / "ix")
    _touch(os.path.join(path, "stats.json"))
    calls = []
    publish_atomically(path, lambda t: calls.append(t), marker="stats.json")
    assert calls == []  # write_fn never invoked


def test_basic_publish(tmp_path):
    path = str(tmp_path / "ix")

    def build(tmp):
        _touch(os.path.join(tmp, "stats.json"))
        _touch(os.path.join(tmp, "data"))

    publish_atomically(path, build, marker="stats.json")
    assert os.path.exists(os.path.join(path, "stats.json"))
    assert not any(d.startswith("ix_") for d in os.listdir(tmp_path))  # no scratch left


def test_markerless_squatter_is_healed(tmp_path):
    path = str(tmp_path / "ix")
    _touch(os.path.join(path, "partial_garbage"))  # no marker: invalid

    def build(tmp):
        _touch(os.path.join(tmp, "stats.json"))

    publish_atomically(path, build, marker="stats.json")
    assert os.path.exists(os.path.join(path, "stats.json"))
    assert not os.path.exists(os.path.join(path, "partial_garbage"))
    assert not any("stale" in d for d in os.listdir(tmp_path))


def test_failed_build_cleans_scratch_and_reraises(tmp_path):
    path = str(tmp_path / "ix")

    def build(tmp):
        _touch(os.path.join(tmp, "half_written"))
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        publish_atomically(path, build, marker="stats.json")
    assert not os.path.exists(path)
    assert list(tmp_path.iterdir()) == []  # scratch removed


def test_lost_race_to_valid_publication(tmp_path):
    """A concurrent builder winning the rename is a silent no-op for the
    loser: its scratch is discarded and the existing publication survives."""
    path = str(tmp_path / "ix")

    def build(tmp):
        _touch(os.path.join(tmp, "stats.json"))
        # simulate the other builder publishing first
        _touch(os.path.join(path, "stats.json"))
        open(os.path.join(path, "winner"), "w").write("1")

    publish_atomically(path, build, marker="stats.json")
    assert os.path.exists(os.path.join(path, "winner"))  # winner untouched
    assert not any(d.endswith(f"_build_{os.getpid()}") for d in os.listdir(tmp_path))
