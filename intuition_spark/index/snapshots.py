"""Snapshot log: commit-point lineage + time-travel over the index layout.

SURVEY §1.4 maps the reference's refresh cadence (SolrServiceImpl.
updateSolrArticles:69-159 re-pages Mongo every ~2 days; GlobalTimestamp
tracks the last-refresh watermark) onto Iceberg's snapshot model. The
sandbox has no Iceberg runtime, so the same semantics are hand-rolled over
the plain-parquet index, exploiting two invariants the builder already
guarantees — which is what makes time travel FREE at 100 TB:

* segments are IMMUTABLE and their ids MONOTONIC: a commit only appends
  segment directories, so "the index as of commit c" is exactly
  ``seg < n_segments(c)`` — a partition-pruned filter (docs/postings are
  ``partitionBy("seg")``) that never lists, opens, or reads a byte outside
  the snapshot, no matter how many commits landed since;
* tombstones are append-only and stamped with the committing snapshot id,
  so the deleted set as of c is ``commit_id <= c`` (legacy unstamped rows
  read as commit 0 — visible to every snapshot).

Corpus-level BM25 stats (N, avgdl, total_tokens) are frozen into each
snapshot record at commit time, so an as-of query scores with the stats
the live engine had then — rank-identical to what a query at that moment
returned. Per-term df/cf as of c are re-aggregated from posting-block
metadata under the same ``seg < n`` pruned scan (the dictionary table is
derived data; see SearchEngine._dictionary_df).

The log itself is one small JSON file (a record per commit) rewritten
atomically. ``compact`` rewrites data files in place, so it EXPIRES all
prior snapshots — the Iceberg analogue is rewrite_data_files followed by
expire_snapshots — and reading an expired snapshot raises instead of
silently returning post-rewrite data.
"""

from __future__ import annotations

import json
import os
import time

SNAPSHOT_LOG = "snapshots.json"


def log_path(root: str) -> str:
    return os.path.join(root, SNAPSHOT_LOG)


def read_log(root: str) -> list[dict]:
    p = log_path(root)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def _write_log(root: str, log: list[dict]) -> None:
    p = log_path(root)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(log, f, indent=1)
    os.replace(tmp, p)  # atomic on POSIX: readers see old or new, never partial


def next_snapshot_id(root: str) -> int:
    """The id the NEXT commit will get — callers stamp tombstone rows with it
    BEFORE appending the snapshot record, so a crash between the two leaves
    rows pointing at a never-committed id (> every logged id → invisible to
    every as-of read, and the latest-read path is unaffected)."""
    log = read_log(root)
    return (log[-1]["snapshot_id"] + 1) if log else 1


def append_snapshot(root: str, op: str, stats: dict, n_tombstones_added: int = 0) -> dict:
    """Record one commit. op: 'build' (initial or in-place rebuild),
    'append' (merge_delta), 'replace' (compact). Both 'build' and 'replace'
    EXPIRE every prior entry: they rewrite the data files in place
    (mode='overwrite' / tmp-and-swap), so older snapshots' segments no longer
    exist — resolving them would silently serve post-rewrite data."""
    log = read_log(root)
    parent = log[-1]["snapshot_id"] if log else None
    prior_tombs = log[-1].get("n_tombstones", 0) if (log and op == "append") else 0
    entry = {
        "snapshot_id": (log[-1]["snapshot_id"] + 1) if log else 1,
        "parent_id": parent,
        "ts": time.time(),
        "op": op,
        "n_segments": int(stats["n_segments"]),
        "N": int(stats["N"]),
        "avgdl": stats.get("avgdl"),
        "total_tokens": stats.get("total_tokens"),
        "n_tombstones": int(prior_tombs + n_tombstones_added),
        "expired": False,
    }
    if op in ("replace", "build"):
        for e in log:
            e["expired"] = True
    log.append(entry)
    _write_log(root, log)
    return entry


def resolve(root: str, as_of: int | None = None, as_of_ts: float | None = None) -> dict:
    """Resolve a snapshot record by id or by timestamp (the latest commit at
    or before ``as_of_ts``). Exactly one selector must be given; the latest
    snapshot is ``resolve(root, as_of=read_log(root)[-1]['snapshot_id'])``."""
    if (as_of is None) == (as_of_ts is None):
        raise ValueError("pass exactly one of as_of / as_of_ts")
    log = read_log(root)
    if not log:
        raise ValueError(f"no snapshot log at {root} (index predates snapshot support)")
    if as_of is not None:
        matches = [e for e in log if e["snapshot_id"] == int(as_of)]
        if not matches:
            known = [e["snapshot_id"] for e in log]
            raise ValueError(f"snapshot {as_of} not in log {known} at {root}")
        entry = matches[0]
    else:
        at_or_before = [e for e in log if e["ts"] <= float(as_of_ts)]
        if not at_or_before:
            raise ValueError(
                f"no snapshot at or before ts={as_of_ts} at {root} "
                f"(earliest is {log[0]['ts']})"
            )
        entry = at_or_before[-1]
    if entry.get("expired"):
        raise ValueError(
            f"snapshot {entry['snapshot_id']} at {root} was expired by a later "
            "compaction (its data files were rewritten); time travel past a "
            "compact is not retained — like Iceberg after expire_snapshots"
        )
    return entry
