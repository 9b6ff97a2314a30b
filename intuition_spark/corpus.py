"""Deterministic synthetic transcript corpus + reference query set (FIXTURES.md).

The corpus is the small-scale stand-in for the 10^12-turn design target: a
table of multi-turn conversation transcripts with exactly the driver-mandated
shape (conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp). Vocabulary is Zipfian (~50k terms) so head-term skew is real;
known phrases / entity tokens / case-and-superscript artifacts are injected at
fixed rates for phrase / proximity / wildcard / analyzer tests.

Generation is numpy-vectorized and cached to parquet: ~1M turns in well under
a minute, reproducible from seed alone (seed=42 everywhere).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from intuition_spark.query.ast import Query

SEED = 42
VOCAB_SIZE = 50_000
ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "browser", "python", "bash", "editor")
EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

# injected entity-ish tokens (mirror the reference's gene/mutation world)
ENTITY_PHRASE = ["braf", "v600e", "mutation"]
ENTITY_TOKENS = ["v600e", "g12c", "q61k", "t790m", "braf", "kras", "egfr"]
WILDCARD_FAMILY = ["inhibit", "inhibits", "inhibitor", "inhibition", "inhibitors"]
ARTIFACT_TEXT = "BRAF^(V600E) is Resistant to MEK-inhibitors; see {!abstract}"


def _vocab() -> list[str]:
    """50k-term vocabulary: a small real-word head + synthetic tail."""
    head = (
        "the of and to a in is it you that he was for on are with as i his they be "
        "at one have this from or had by word but what some we can out other were "
        "all there when up use your how said an each she which do their time if "
        "spark query index search token term score document conversation agent "
        "model tool result error retry plan code test data table join filter"
    ).split()
    head = head + ENTITY_TOKENS + WILDCARD_FAMILY
    seen = set()
    uniq = [w for w in head if not (w in seen or seen.add(w))]
    tail = [f"w{i:05d}" for i in range(VOCAB_SIZE - len(uniq))]
    return uniq + tail


def generate_transcripts(
    n_turns: int,
    seed: int = SEED,
    min_tokens: int = 5,
    max_tokens: int = 300,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(), dtype=object)
    v = len(vocab)

    # Zipf(1.07) token distribution over the vocabulary
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = ranks ** -1.07
    probs /= probs.sum()

    # conversation lengths ~ truncated Zipf in [1, 64]
    lens = np.minimum(rng.zipf(1.5, size=max(16, n_turns // 4)), 64)
    cum = np.cumsum(lens)
    n_conv = int(np.searchsorted(cum, n_turns) + 1)
    lens = lens[:n_conv]
    total = int(lens.sum())

    conv_ids = np.repeat([f"conv_{i:08d}" for i in range(n_conv)], lens)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in lens])

    # roles: alternate user/assistant; ~10% of turns become tool turns
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    is_tool = rng.random(total) < 0.10
    role[is_tool] = "tool"
    tool = np.full(total, None, dtype=object)
    tool[is_tool] = rng.choice(np.array(TOOLS, dtype=object), size=int(is_tool.sum()))

    # timestamps monotone per conversation: conv start + 7s per turn
    conv_start = rng.integers(0, 86_400 * 365, size=n_conv)
    ts = (np.repeat(conv_start, lens) + turn_idx.astype(np.int64) * 7) * 1_000_000

    # text: per-turn token count, one flat Zipf draw, join per row
    ntok = rng.integers(min_tokens, max_tokens + 1, size=total)
    offsets = np.concatenate(([0], np.cumsum(ntok)))
    flat = rng.choice(v, size=int(offsets[-1]), p=probs)
    words = vocab[flat]
    texts = np.empty(total, dtype=object)
    for i in range(total):
        texts[i] = " ".join(words[offsets[i] : offsets[i + 1]])

    # injections: ~1% entity phrase, ~0.5% proximity pair, ~2% artifacts
    inj = rng.random(total)
    phrase_rows = np.flatnonzero(inj < 0.01)
    for r in phrase_rows:
        texts[r] = texts[r] + " " + " ".join(ENTITY_PHRASE)
    prox_rows = np.flatnonzero((inj >= 0.01) & (inj < 0.015))
    gap_words = rng.integers(1, 12, size=prox_rows.size)
    for r, g in zip(prox_rows, gap_words):
        filler = " ".join(vocab[rng.choice(200, size=g)])
        texts[r] = texts[r] + f" kras {filler} g12c"
    art_rows = np.flatnonzero((inj >= 0.015) & (inj < 0.035))
    for r in art_rows:
        texts[r] = texts[r] + " " + ARTIFACT_TEXT

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
        }
    )


def transcripts_path(n_turns: int, cache_dir: str = "/tmp/intuition_spark_corpus", seed: int = SEED) -> str:
    """Generate-or-reuse a cached parquet corpus; returns the file path."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"transcripts_n{n_turns}_s{seed}.parquet")
    if not os.path.exists(path):
        tbl = generate_transcripts(n_turns, seed=seed)
        pq.write_table(tbl, path + ".tmp", row_group_size=50_000)
        os.rename(path + ".tmp", path)
    return path


def reference_queries(k: int = 10) -> list[Query]:
    """The reference query set (FIXTURES.md §2): shapes Q1-Q5, Q8 of SURVEY §2.3."""
    qs: list[Query] = []
    head_terms = ["the", "spark", "query", "search", "data", "index", "token", "model",
                  "braf", "kras", "v600e", "g12c", "error", "plan", "term", "score",
                  "w00012", "w00150", "w01500", "w09000"]
    for i, t in enumerate(head_terms):
        qs.append(Query(f"term_{i:02d}", "term", [[t]], k=k))
    and_pairs = [["spark", "query"], ["braf", "v600e"], ["index", "search"], ["model", "error"],
                 ["kras", "g12c"], ["token", "score"], ["data", "w00150"], ["plan", "code"],
                 ["search", "agent", "tool"], ["query", "index", "term"]]
    for i, ts in enumerate(and_pairs):
        qs.append(Query(f"and_{i:02d}", "and", [[t] for t in ts], k=k))
    or_groups = [
        [["braf", "kras"], ["v600e", "g12c"]],
        [["spark"], ["query", "search"]],
        [["egfr", "t790m"], ["error"]],
        [["model", "agent"], ["tool", "plan"]],
        [["index"], ["w00012", "w00150"]],
        [["braf", "b", "raf"], ["v600e"]],
        [["data", "table"], ["join", "filter"]],
        [["score", "term"], ["token"]],
        [["search"], ["browser", "python"]],
        [["query"], ["result", "error", "retry"]],
    ]
    for i, gs in enumerate(or_groups):
        qs.append(Query(f"or_{i:02d}", "or_groups", gs, k=k))
    phrases = ["braf v600e", "braf v600e mutation", "v600e mutation", "the spark",
               "kras g12c", "query index", "search token", "model error"]
    for i, p in enumerate(phrases):
        qs.append(Query(f"phrase_{i:02d}", "phrase", [[p]], k=k))
    prox = [("kras g12c", 15), ("braf mutation", 15), ("spark query", 10),
            ("search index", 15), ("model tool", 5), ("error retry", 20)]
    for i, (p, s) in enumerate(prox):
        qs.append(Query(f"prox_{i:02d}", "proximity", [[p]], slop=s, k=k))
    for i, w in enumerate(["inhibit*", "w000?2", "v600*"]):
        qs.append(Query(f"wild_{i:02d}", "wildcard", [[w]], k=k))
    for i, t in enumerate(["braf", "spark", "w00150"]):
        qs.append(Query(f"tfsort_{i:02d}", "tf_sort", [[t]], k=k))
    # fuzzy ~1 atoms (Q7) and field-qualified predicates (P7) — the two
    # operator families added in round 3, kept in the latency set so their
    # serving paths are benched alongside the original shapes
    for i, t in enumerate(["spvrk", "quary", "indxe"]):
        qs.append(Query(f"fuzzy_{i:02d}", "fuzzy", [[t]], k=k))
    for i, (t, r) in enumerate(
        [("spark", "assistant"), ("query", "user"), ("error", "assistant")]
    ):
        qs.append(Query(f"fieldq_{i:02d}", "term", [[t]], k=k, field_eq={"role": r}))
    # multi-field (edismax qf) shapes added in round 4: one boolean scored
    # across the standard + ws indexes with per-field boosts (P8)
    mf = [
        ("term", [["query"]]),
        ("and", [["spark"], ["query"]]),
        ("or_groups", [["braf", "kras"], ["v600e", "g12c"]]),
    ]
    for i, (kind, groups) in enumerate(mf):
        qs.append(Query(f"multif_{i:02d}", kind, groups, k=k,
                        fields={"standard": 1.0, "ws": 0.5}))
    return qs
