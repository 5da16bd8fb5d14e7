"""Deterministic interleaved text+media document corpus.

Synthesizes the BASELINE.json ``input_hint`` table shape:

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string,
                        offset: int32>>

Two logical tables:
- **registry** (y side): one canonical document per entity;
- **corpus** (x side): 1..k noisy mentions per entity (char corruptions,
  token drops, span reordering of non-leading spans) plus distractor
  documents belonging to no entity;
plus a **truth** table (doc_id → entity_id) for F1 evaluation.

Everything is seed-driven (no wall clock, no PYTHONHASHSEED dependence —
token hashing uses crc32), so the same (seed, sizes) always produce
byte-identical parquet.

Written as parquet (``pylance`` is not installed in this sandbox — the
reader in sources/readers.py prefers Lance when available, SURVEY.md §7.4).
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPAN_TYPE)])

_FIRST = ["alice", "bob", "carol", "daniel", "erin", "frank", "gina", "harold",
          "irene", "jack", "karen", "leo", "maria", "nate", "olga", "peter"]
_LAST = ["smith", "johnson", "garcia", "chen", "patel", "mueller", "rossi",
         "tanaka", "kim", "brown", "silva", "kowalski", "novak", "ali"]
_STREET = ["oak", "maple", "pine", "cedar", "elm", "birch", "walnut", "ash"]
_CITY = ["springfield", "rivertown", "lakeside", "hillcrest", "brookfield",
         "fairview", "greenwood", "maplewood"]
_WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
          "records", "indicate", "resident", "voter", "filed", "updated",
          "address", "contact", "profile", "verified", "pending", "review"]


def _entity(rng: random.Random, eid: int) -> dict:
    return {
        "entity_id": eid,
        "name": f"{rng.choice(_FIRST)} {rng.choice(_LAST)}",
        "address": f"{rng.randrange(1, 999)} {rng.choice(_STREET)} st "
                   f"{rng.choice(_CITY)}",
        "phone": "".join(rng.choice("0123456789") for _ in range(10)),
        "photo": f"img://p{eid:06d}/{rng.randrange(1 << 30):08x}",
    }


def _corrupt(rng: random.Random, s: str, p: float) -> str:
    out = []
    for ch in s:
        r = rng.random()
        if r < p / 3:
            continue  # drop
        if r < p:
            out.append(rng.choice("abcdefghijklmnopqrstuvwxyz"))
        else:
            out.append(ch)
    return "".join(out)


def _doc_spans(rng: random.Random, ent: dict, noisy: bool, noise: float) -> list[dict]:
    name = _corrupt(rng, ent["name"], noise) if noisy else ent["name"]
    addr = _corrupt(rng, ent["address"], noise) if noisy else ent["address"]
    filler = " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(5, 15)))
    spans = [
        {"kind": "title", "text": name, "media_ref": "", "offset": 0},
        {"kind": "text", "text": f"{filler} {addr}", "media_ref": "",
         "offset": len(name)},
        {"kind": "media", "text": "", "media_ref": ent["photo"],
         "offset": len(name) + 1},
        {"kind": "text", "text": f"phone {ent['phone']}", "media_ref": "",
         "offset": len(name) + 2},
    ]
    if noisy and rng.random() < 0.3:
        # swap two non-leading spans (order is part of the span-sequence
        # invariant — swaps exercise that the pipeline preserves sequence)
        i, j = rng.sample(range(1, len(spans)), 2)
        spans[i], spans[j] = spans[j], spans[i]
    # re-stamp offsets to the post-shuffle order
    off = 0
    for s in spans:
        s["offset"] = off
        off += max(1, len(s["text"]))
    return spans


def _distractor(rng: random.Random) -> list[dict]:
    n = rng.randrange(2, 5)
    spans = []
    off = 0
    for _ in range(n):
        if rng.random() < 0.2:
            spans.append({"kind": "media", "text": "",
                          "media_ref": f"img://junk/{rng.randrange(1 << 30):08x}",
                          "offset": off})
            off += 1
        else:
            t = " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(4, 12)))
            spans.append({"kind": "text", "text": t, "media_ref": "", "offset": off})
            off += len(t)
    return spans


def generate_corpus(
    out_dir: str,
    n_entities: int = 200,
    max_docs_per_entity: int = 3,
    distractor_frac: float = 0.15,
    noise: float = 0.08,
    seed: int = 42,
    zipf_docs: float | None = None,
    zipf_cap: int = 200,
) -> dict[str, str]:
    """Write registry.parquet / corpus.parquet / truth.parquet under
    ``out_dir``; returns the path map. Deterministic in (args).

    ``zipf_docs``: when set, docs-per-entity follows a heavy-tailed
    Pareto(α=zipf_docs) capped at ``zipf_cap`` instead of uniform
    1..max — the skew-stress corpus variant (a few celebrity entities
    with hundreds of mentions, a long tail with one)."""
    rng = random.Random(seed)
    entities = [_entity(rng, e) for e in range(n_entities)]

    reg_rows = []
    for ent in entities:
        reg_rows.append(
            {"doc_id": f"y{ent['entity_id']:08d}",
             "spans": _doc_spans(rng, ent, noisy=False, noise=0.0)}
        )

    corpus_rows, truth_rows = [], []
    i = 0
    for ent in entities:
        if zipf_docs is not None:
            n_docs = min(int(rng.paretovariate(zipf_docs)), zipf_cap)
        else:
            n_docs = rng.randrange(1, max_docs_per_entity + 1)
        for _ in range(n_docs):
            corpus_rows.append(
                {"doc_id": f"x{i:08d}",
                 "spans": _doc_spans(rng, ent, noisy=True, noise=noise)}
            )
            truth_rows.append({"doc_id": f"x{i:08d}", "entity_id": ent["entity_id"]})
            i += 1
    n_distract = int(len(corpus_rows) * distractor_frac)
    for _ in range(n_distract):
        corpus_rows.append({"doc_id": f"x{i:08d}", "spans": _distractor(rng)})
        truth_rows.append({"doc_id": f"x{i:08d}", "entity_id": -1})
        i += 1

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, rows, schema in [
        ("registry", reg_rows, SCHEMA),
        ("corpus", corpus_rows, SCHEMA),
        ("truth", truth_rows,
         pa.schema([("doc_id", pa.string()), ("entity_id", pa.int64())])),
    ]:
        path = os.path.join(out_dir, f"{name}.parquet")
        tbl = pa.Table.from_pylist(rows, schema=schema)
        # MULTI-FILE fixture: ray.data.read_parquet parallelizes the DECODE
        # at file granularity only (measured 2026-08-18: a single-file 1M-
        # entity corpus decoded as ONE 11 s read task regardless of row
        # groups or override_num_blocks — SplitBlocks only re-chunks the
        # one task's output). ~16k rows per part keeps the fused
        # read+flatten+key-expansion task grain at a few seconds so
        # stragglers cost a fraction of a wave. Small row groups are still
        # written so a row-group-aware reader can split further.
        if name == "truth" or len(tbl) <= 16384:
            pq.write_table(tbl, path, row_group_size=8192)
        else:
            n_parts = min(128, max(1, len(tbl) // 16384))
            os.makedirs(path, exist_ok=True)
            step = -(-len(tbl) // n_parts)
            for pi in range(n_parts):
                part = tbl.slice(pi * step, step)
                if len(part) == 0:
                    break
                pq.write_table(
                    part, os.path.join(path, f"part-{pi:04d}.parquet"),
                    row_group_size=8192,
                )
        paths[name] = path
    return paths
