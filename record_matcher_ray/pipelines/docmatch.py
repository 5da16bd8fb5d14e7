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
never silently (no-silent-caps rule). The default cap (32/side) is sized
to true entity-cluster widths (≤ ~10 docs/entity at 3 mentions): probed
2026-08-18 at a 1M-entity corpus, cap 256 admitted 299M candidate pairs of
which ~260M came from fat background band buckets (common filler-text
shingles), cap 32 admits 41M with F1 unchanged — recall for a pair dropped
from one hot band survives through its 15 other bands, media and digit
keys.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from record_matcher_ray.core.config import MatchConfig, MatchConfigBuilder
from record_matcher_ray.core.kernel import MATCH_STATUS, score_pairs_flat
from record_matcher_ray.pipelines import table_ops
from record_matcher_ray.pipelines.cluster import connected_components
from record_matcher_ray.pipelines.match import compute_flips, resolve_winner_arrays
from record_matcher_ray.stages.blocking import MinHasher, batch_doc_keys
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
    (deterministic keys ⇒ idempotent retries).

    ``carry_cols`` holds ONLY the columns the scorer will read — the long
    ``body`` text is consumed here for minhash keys but never shipped
    through the blocking shuffle (it would be replicated once per key)."""

    def __init__(self, side: int, carry_cols: list[str],
                 num_perm: int = 64, seed: int = 1, n_buckets: int = 64):
        self.side = side
        self.carry_cols = carry_cols
        self.num_perm = num_perm
        self.seed = seed
        self.n_buckets = n_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        hasher = _cached_hasher(self.num_perm, self.seed)
        rids = t["rid"].to_numpy()
        # whole-batch vectorized key derivation (int64 keys; the round-1
        # per-row default_doc_keys loop + string keys was the flagship's
        # only per-row stage)
        keys, idx = batch_doc_keys(
            t["title"], t["body"], t["media_sig"], hasher
        )
        take = pa.array(idx)
        buckets = (keys.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                   >> np.uint64(33)) % np.uint64(self.n_buckets)
        cols = {
            "bucket": pa.array(buckets.astype(np.int64)),
            "key": pa.array(keys),
            "rid": pc.take(pa.array(rids), take),
            "side": pa.array(np.full(len(idx), self.side, dtype=np.int8)),
        }
        for c in self.carry_cols:
            # carrying value columns through the blocking shuffle
            # replicates them once per key (~20×/doc) — the pipeline path
            # passes carry_cols=[] and gathers values in score_bucket from
            # the materialized flats instead (see match_documents); this
            # branch remains for diagnostic use
            cols[c] = pc.take(
                pc.fill_null(pc.cast(t[c], pa.string()), "").combine_chunks(), take
            )
        return pa.table(cols)


# per-worker-process cache of carry-column block views for score_bucket
# ({"key": the run's routing ObjectRef, "x"/"y": [per-block {col: Array}]});
# resolved via an in-function module import — cloudpickle copies
# closure-referenced globals per task (see CLAUDE.md)
_CARRY_CACHE: dict = {}

# driver-side warm registry-index cache for repeated delta runs in one
# session (match_documents_delta): {(root, fp, params) -> (y_flat, yk,
# yset_ref)}; single entry — a session serves one registry at a time
_DELTA_INDEX_CACHE: dict = {}


# ---- per-block remote partials (multi-node-safe driver reads) -----------
# r2's driver fast paths did `ray.get(ds.to_arrow_refs())` and projected
# on the DRIVER: zero-copy on one node, but on a real cluster every get
# ships the WHOLE block (body text included) to the driver node. These
# tiny tasks run NEXT to the block (Ray schedules on the owning node for
# plasma locality) and return only the narrow partial; the driver then
# does ONE batched ray.get over small results (CLAUDE.md: never per-object
# gets in a loop).


@ray.remote(num_cpus=0)
def _key_partial(t: pa.Table) -> np.ndarray:
    """Distinct int64 blocking keys of one key block (delta pruning)."""
    if len(t) == 0 or "key" not in t.column_names:
        return np.empty(0, np.int64)
    return np.unique(t["key"].to_numpy())


@ray.remote(num_cpus=0)
def _rid_partial(t: pa.Table) -> np.ndarray:
    """8 B/row rid column of one block — the only bytes that leave it."""
    if len(t) == 0 or "rid" not in t.column_names:
        return np.empty(0, np.int64)
    return np.ascontiguousarray(t["rid"].to_numpy(), dtype=np.int64)


@ray.remote(num_cpus=0)
def _rid_uniq_partial(t: pa.Table, columns: list[str]):
    """Fused (rid array, per-column distinct sets) of one block — one
    task wave serves both the routing index and the uniqueness pass."""
    if len(t) == 0:
        return np.empty(0, np.int64), {}
    ids_b = np.ascontiguousarray(t["rid"].to_numpy(), dtype=np.int64)
    uniq = {}
    for c in columns:
        if c not in t.column_names:
            continue
        s = pc.cast(t[c], pa.string())
        mask = pc.and_kleene(pc.is_valid(s), pc.not_equal(s, ""))
        u = pc.unique(s.filter(mask))
        uniq[c] = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
    return ids_b, uniq


@ray.remote(num_cpus=0)
def _id_col_partial(t: pa.Table, col: str) -> np.ndarray:
    if len(t) == 0 or col not in t.column_names:
        return np.empty(0, np.int64)
    return np.ascontiguousarray(t[col].to_numpy(), dtype=np.int64)


@ray.remote(num_cpus=0)
def _unique_partial(t: pa.Table, columns: list[str]) -> dict:
    """Per-block distinct non-blank values of each column (block-local
    dedupe, so repeated values never ship)."""
    out = {}
    for c in columns:
        if c not in t.column_names or len(t) == 0:
            continue
        s = pc.cast(t[c], pa.string())
        mask = pc.and_kleene(pc.is_valid(s), pc.not_equal(s, ""))
        u = pc.unique(s.filter(mask))
        out[c] = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
    return out


@ray.remote(num_cpus=0)
def _sum_col_partial(t: pa.Table, col: str) -> int:
    if len(t) == 0 or col not in t.column_names:
        return 0
    return int(pc.sum(t[col]).as_py() or 0)


@ray.remote(num_cpus=0)
def _winner_partial(t: pa.Table):
    """(n_candidates sum, winner x/y/score arrays) of one scored block —
    drops the tie-string columns before anything ships."""
    if len(t) == 0:
        return 0, (np.empty(0, np.int64), np.empty(0, np.int64),
                   np.empty(0, np.float64))
    n_cand = int(pc.sum(t["n_candidates"]).as_py() or 0)
    tt = t.filter(pc.not_equal(t["winner_y_id"], -1))
    return n_cand, (
        np.ascontiguousarray(tt["__x_id__"].to_numpy(), np.int64),
        np.ascontiguousarray(tt["winner_y_id"].to_numpy(), np.int64),
        np.ascontiguousarray(tt["winner_score"].to_numpy(), np.float64),
    )


def _uniqueness_from_refs(
    flat: ray.data.Dataset,
    columns: list[str],
    driver_cap: int = 50_000_000,
) -> dict[str, float]:
    """O2 distinct-ratios from per-block remote unique partials merged on
    the driver — the dataset-based pass spent 6-9 s of pure barrier
    latency per flagship run, and the r2 whole-block driver pull was
    single-node-shaped (it shipped full flat tables on a cluster). Falls
    back to the streaming ``table_ops.uniqueness`` above ``driver_cap``
    rows (where even the distinct sets could exceed driver memory)."""
    total = flat.count()
    if total == 0:
        return {c: 0.0 for c in columns}
    if total > driver_cap:
        return table_ops.uniqueness(flat, columns, total=total)
    partials = ray.get(
        [_unique_partial.remote(r, columns) for r in flat.to_arrow_refs()]
    )
    out: dict[str, float] = {}
    for c in columns:
        parts = [p[c] for p in partials if c in p and len(p[c])]
        if not parts:
            out[c] = 0.0
            continue
        merged = pc.unique(pa.concat_arrays(parts))
        out[c] = len(merged) / total
    return out


def _assemble_route(
    rid_parts: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-block rid arrays → (rids sorted asc, block-of-rid int32,
    row-in-block int32)."""
    ids_p, blk_p, pos_p = [], [], []
    for bi, ids_b in enumerate(rid_parts):
        if len(ids_b) == 0:
            continue
        ids_p.append(ids_b)
        blk_p.append(np.full(len(ids_b), bi, np.int32))
        pos_p.append(np.arange(len(ids_b), dtype=np.int32))
    if not ids_p:
        return (np.empty(0, np.int64),
                np.empty(0, np.int32), np.empty(0, np.int32))
    ids = np.concatenate(ids_p)
    blk = np.concatenate(blk_p)
    pos = np.concatenate(pos_p)
    o = np.argsort(ids, kind="stable")
    return ids[o], blk[o], pos[o]


def _flat_route(
    flat: ray.data.Dataset,
) -> tuple[list, np.ndarray, np.ndarray, np.ndarray]:
    """→ (block refs, rids sorted asc, block-of-rid int32, row-in-block
    int32) for a MATERIALIZED flat table. Only the 8 B/row rid column
    leaves each block (projected by a task NEXT to it — r2 pulled whole
    blocks, which ships body text to the driver on a multi-node cluster)."""
    refs = flat.to_arrow_refs()
    rid_parts = ray.get([_rid_partial.remote(r) for r in refs])
    ids, blk, pos = _assemble_route(rid_parts)
    return refs, ids, blk, pos


def _normalize_carry_cols(t: pa.Table, carry: list[str]) -> pa.Table:
    """Scorer-column normalization (string, non-null, single chunk) —
    shared by the in-run flats pass and the persisted-index read-back so
    score_bucket's zero-copy block views hold on both paths."""
    for c in carry:
        if c in t.column_names:
            arr = pc.fill_null(pc.cast(t[c], pa.string()), "")
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            t = t.set_column(t.column_names.index(c), c, arr)
    return t


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
    max_block_side: int = 32,
    concurrency: int | None = None,
    cluster_edges: bool = True,
    progress: "Callable[[str, dict], None] | None" = None,
    n_buckets: int = 256,
    reduce_driver_cap: int = 500_000,
    shuffle_partitions: int | None = None,
    y_prepared: "tuple[ray.data.Dataset, ray.data.Dataset] | None" = None,
    x_block_cap: int | None = None,
) -> DocMatchResult:
    """x_docs / y_docs: (doc_id, spans) tables (corpus schema). Returns
    per-x assignments, accepted-pair edges and entity clusters.

    ``progress``: optional per-stage driver callback ``(stage, info)`` —
    fired after flatten, pair scoring, per-x reduce, assignments,
    unmatched backfill, edges and clustering (the Ray-path analogue of the
    reference's ``update_func``, matcher.py:320-332).

    ``y_prepared``: optional pre-built registry side ``(y_flat, y_keys)``
    — a MATERIALIZED normalized-flats dataset and its expanded key table
    (as written by :func:`build_doc_index`). When given, ``y_docs`` is
    ignored and the y-side flatten + key expansion are skipped entirely —
    the incremental/delta path (:func:`match_documents_delta`).

    ``x_block_cap``: x-side per-key width cap (defaults to
    ``max_block_side``). The sharded path passes
    ``ceil(max_block_side / n_shards)`` so a key's admitted pair budget
    stays invariant to resharding — a shard sees ~1/n of each key's x
    width, so an unscaled cap would admit ~n× the pairs the unsharded
    run caps away."""
    cfg = cfg or default_doc_config()
    x_cap = int(max_block_side if x_block_cap is None else x_block_cap)

    def _tick(stage: str, info: dict) -> None:
        if callable(progress):
            progress(stage, info)

    # ONE decode+flatten pass: the flats are materialized WITH the body
    # text and key expansion reads them back zero-copy from plasma. The
    # round-1 design re-ran the read+flatten lineage for key expansion to
    # avoid storing body twice; once the view caches went zero-copy the
    # duplicated parquet decode + flatten became the flagship's largest
    # non-scaling cost (the decode/fault path serializes on this host), so
    # storing body once (~0.25 KB/doc resident for the pipeline's
    # lifetime, spillable) now wins at every parallelism level
    x_pipe = x_docs.map_batches(flatten_spans, batch_format="pyarrow").map_batches(
        add_int_ids, batch_format="pyarrow"
    )
    y_pipe = None
    if y_prepared is None:
        y_pipe = y_docs.map_batches(
            flatten_spans, batch_format="pyarrow"
        ).map_batches(add_int_ids, batch_format="pyarrow")

    x_match_cols = cfg.x_match_columns()
    y_need_cols = cfg.y_columns_needed()
    carry = sorted(set(x_match_cols) | set(y_need_cols))

    def _normalize_carry(t: pa.Table) -> pa.Table:
        # normalize the scorer (carry) columns ONCE here, before the flats
        # are materialized: cast→string, nulls→"", single chunk. Every
        # score_bucket WORKER builds block views over these columns — with
        # raw columns each of the N workers re-ran cast+fill_null+copy over
        # the whole corpus (total CPU grew with worker count, pure
        # anti-scaling); normalized blocks make the views zero-copy plasma
        # references shared by all workers.
        return _normalize_carry_cols(t, carry)

    if shuffle_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 32))
        shuffle_partitions = max(64, 2 * ncpu)
    n_buckets = int(n_buckets)
    from concurrent.futures import ThreadPoolExecutor

    # the two flats materialize concurrently (each blocks its thread on
    # its own streaming executor); key expansion then streams over the
    # materialized blocks zero-copy — no second decode+flatten
    with ThreadPoolExecutor(max_workers=2) as _ex:
        _fx = _ex.submit(
            x_pipe.map_batches(_normalize_carry, batch_format="pyarrow").materialize
        )
        if y_prepared is None:
            _fy = _ex.submit(
                y_pipe.map_batches(_normalize_carry, batch_format="pyarrow").materialize
            )
            y_flat = _fy.result()
        else:
            y_flat = y_prepared[0]
        x_flat = _fx.result()
    xk = x_flat.map_batches(
        KeyExpander(0, [], num_perm, seed, n_buckets), batch_format="pyarrow"
    )
    yk = (
        y_prepared[1]
        if y_prepared is not None
        else y_flat.map_batches(
            KeyExpander(1, [], num_perm, seed, n_buckets),
            batch_format="pyarrow",
        )
    )
    if y_prepared is not None:
        # DELTA semi-join pruning, both directions. (a) x keys absent
        # from the registry's scoreable-key set (y_keyset: keys with
        # y-width ≤ cap) can never pair — prune them first (the common
        # filler-band keys are the bulk of x key mass). (b) y key rows
        # whose key appears in no surviving x row can't pair either —
        # prune them BEFORE the blocking shuffle. Both sets ride as ONE
        # plasma broadcast each (sorted int64, zero-copy in tasks);
        # above the cap (50M keys ≈ 400 MB) pruning is skipped — at
        # that size the delta is no longer small and a full shuffle is
        # the right shape anyway. Consequence (documented at
        # build_doc_index): `blocks_dropped` counts only x-width
        # overflows on the delta path; assignments are unchanged.
        yset_ref = y_prepared[2] if len(y_prepared) > 2 else None
        if yset_ref is not None:

            def _prune_x_keys(t: pa.Table) -> pa.Table:
                ks = ray.get(yset_ref)  # zero-copy plasma numpy
                k = t["key"].to_numpy()
                pos = np.minimum(np.searchsorted(ks, k), len(ks) - 1)
                return t.filter(pa.array(ks[pos] == k))

            xk = xk.map_batches(_prune_x_keys, batch_format="pyarrow")
        xk = xk.materialize()
        key_parts = ray.get(
            [_key_partial.remote(r) for r in xk.to_arrow_refs()]
        )
        xkeys = (
            np.unique(np.concatenate(key_parts))
            if key_parts
            else np.empty(0, np.int64)
        )
        if 0 < len(xkeys) <= 50_000_000:
            xkeys_ref = ray.put(xkeys)

            def _prune_y_keys(t: pa.Table) -> pa.Table:
                ks = ray.get(xkeys_ref)  # zero-copy plasma numpy
                k = t["key"].to_numpy()
                pos = np.minimum(np.searchsorted(ks, k), len(ks) - 1)
                return t.filter(pa.array(ks[pos] == k))

            yk = yk.map_batches(_prune_y_keys, batch_format="pyarrow")
    keys_mat = xk.union(yk).repartition(shuffle_partitions).materialize()

    n_x_total = x_flat.count()
    _tick("flatten", {"x_rows": n_x_total, "y_rows": y_flat.count()})

    # NO value columns travel through the blocking shuffle at all: only
    # (bucket, key, rid, side) — 25 B/key-row instead of ~120 B with the
    # ~20×/doc carry-string replication (the shuffle, not the scorers, was
    # 55 s of the 75 s stage-B wall at 690 k docs). score_bucket gathers
    # the scorer columns zero-copy from the materialized flats via a
    # broadcast (rid → block, row) routing index. The x-side route pass is
    # FUSED with the uniqueness pass (one task wave, r3 — two separate
    # per-block waves measurably stacked scheduling latency).
    uniq_cols = [c for c, _ in cfg.columns_to_match]
    if 0 < n_x_total <= 50_000_000:
        x_refs = x_flat.to_arrow_refs()
        fused = ray.get(
            [_rid_uniq_partial.remote(r, uniq_cols) for r in x_refs]
        )
        xr_ids, xr_blk, xr_pos = _assemble_route(
            [ids_b for ids_b, _ in fused]
        )
        uniq = {}
        for c in uniq_cols:
            parts = [u[c] for _, u in fused if c in u and len(u[c])]
            merged = pc.unique(pa.concat_arrays(parts)) if parts else []
            uniq[c] = len(merged) / n_x_total
    else:
        uniq = _uniqueness_from_refs(x_flat, uniq_cols)
        x_refs, xr_ids, xr_blk, xr_pos = _flat_route(x_flat)
    _tick("uniqueness", dict(uniq))
    y_refs, yr_ids, yr_blk, yr_pos = _flat_route(y_flat)
    carry_route_ref = ray.put(
        (xr_ids, xr_blk, xr_pos, yr_ids, yr_blk, yr_pos)
    )

    counters = Counter()
    # xb (the stage-C per-x reduce bucket) is emitted directly by stage B —
    # a separate add_xbucket map pass over the tie rows was ~2-4 s of task
    # scheduling at every parallelism level
    pair_schema = pa.schema(
        [("x_id", pa.int64()), ("y_id", pa.int64()),
         ("score", pa.float64()), ("optimal", pa.float64()),
         ("n_scored", pa.int64()), ("dropped_groups", pa.int64()),
         ("xb", pa.int64())]
    )

    def _pair_table(cols: dict, n_dropped: int) -> pa.Table:
        """Attach the bucket's dropped-group count to the first row (or a
        sentinel x_id=-1 row when the bucket emitted nothing) so the count
        survives to the counters without a second pass over stage B."""
        nrows = len(cols["x_id"]) if cols else 0
        if nrows == 0:
            if n_dropped == 0:
                return pair_schema.empty_table()
            return pa.table(
                {"x_id": pa.array([-1], pa.int64()),
                 "y_id": pa.array([-1], pa.int64()),
                 "score": pa.array([float("nan")], pa.float64()),
                 "optimal": pa.array([float("nan")], pa.float64()),
                 "n_scored": pa.array([0], pa.int64()),
                 "dropped_groups": pa.array([n_dropped], pa.int64()),
                 "xb": pa.array([0], pa.int64())}
            )
        dg = np.zeros(nrows, np.int64)
        dg[0] = n_dropped
        cols["dropped_groups"] = pa.array(dg)
        xv = cols["x_id"].to_numpy()
        cols["xb"] = pa.array(np.bitwise_and(xv, n_buckets - 1))
        return pa.table({f.name: cols[f.name] for f in pair_schema})

    # ---- stage B: bucketed pair scoring + local per-x argmax --------------
    # one map_groups call per HASH BUCKET of keys (not per key): group
    # boundaries are found with a local argsort, pair index vectors are
    # emitted per key group, and the whole bucket is scored in ONE
    # vectorized score_pairs_flat call — per-group Python overhead was the
    # dominant cost with ~20 keys/doc. Only each x's bucket-local argmax
    # TIE rows leave the task (rows below an x's bucket max cannot win the
    # global argmax; scores are deterministic per pair, so cross-bucket
    # float equality is exact) — emitting raw candidates would shuffle the
    # full |pairs| stream into stage C.
    def score_bucket(t: pa.Table) -> pa.Table:
        import time as _time

        from record_matcher_ray.core.kernel import _PROF_PATH, _prof_write

        _t0 = _time.perf_counter() if _PROF_PATH else 0.0
        n = len(t)
        if n == 0:
            return pair_schema.empty_table()
        keys = t["key"].to_numpy()
        side = t["side"].to_numpy()
        rid = t["rid"].to_numpy()
        # sort by (key, side): within each key group x rows precede y rows,
        # both contiguous — pair emission is then pure cumsum arithmetic
        # over group size vectors (NO per-key Python loop; with ~30k key
        # groups per bucket the loop dominated the whole pipeline)
        order = np.lexsort((side, keys))
        keys_s = keys[order]
        side_s = side[order]
        bounds = np.nonzero(np.concatenate(([True], keys_s[1:] != keys_s[:-1])))[0]
        sizes = np.diff(np.concatenate((bounds, [n])))
        nx_g = np.add.reduceat((side_s == 0).astype(np.int64), bounds)
        ny_g = sizes - nx_g
        valid = (
            (nx_g > 0) & (ny_g > 0)
            & (nx_g <= x_cap) & (ny_g <= max_block_side)
        )
        # groups with both sides present but over the cap are DROPPED —
        # counted, never silent (docstring contract)
        n_dropped = int(
            ((nx_g > 0) & (ny_g > 0) & ~valid).sum()
        )
        if not valid.any():
            return _pair_table({}, n_dropped)
        nx_v = nx_g[valid]
        ny_v = ny_g[valid]
        # x rows of valid groups, in sorted order
        valid_per_row = np.repeat(valid, sizes)
        x_rows_sorted = np.nonzero(valid_per_row & (side_s == 0))[0]
        orig_x = order[x_rows_sorted]
        ny_per_x = np.repeat(ny_v, nx_v)
        P = int(ny_per_x.sum())
        pair_starts = np.concatenate(([0], np.cumsum(ny_per_x)[:-1]))
        within = np.arange(P) - np.repeat(pair_starts, ny_per_x)
        y_start_per_x = np.repeat((bounds + nx_g)[valid], nx_v)
        yi_sorted = np.repeat(y_start_per_x, ny_per_x) + within
        xi = np.repeat(orig_x, ny_per_x)
        yi = order[yi_sorted]
        # gather scorer columns from the materialized flats (zero-copy
        # plasma reads routed by rid) into bucket-row-aligned object
        # arrays; per-worker block-view cache, ONE batched prefetch get
        from record_matcher_ray.pipelines import docmatch as _dmod

        rt = ray.get(carry_route_ref)
        g = _dmod._CARRY_CACHE
        if g.get("key") != carry_route_ref:
            # carry columns were normalized (string, non-null, single
            # chunk) before the flats materialized — each view is a
            # zero-copy reference into the shared plasma block, so
            # warmup costs no per-worker copies or kernel work
            def _one(col):
                if isinstance(col, pa.ChunkedArray):
                    return (col.chunk(0) if col.num_chunks == 1
                            else col.combine_chunks())
                return col

            def _views(tbls):
                return [
                    {c: _one(tt[c]) for c in carry}
                    if len(tt)
                    else None
                    for tt in tbls
                ]

            g["key"] = carry_route_ref
            g["x"] = _views(ray.get(list(x_refs)))
            g["y"] = _views(ray.get(list(y_refs)))
        cols_np = {c: np.full(n, "", dtype=object) for c in carry}
        for side_val, r_ids, r_blk, r_pos, bviews in (
            (0, rt[0], rt[1], rt[2], g["x"]),
            (1, rt[3], rt[4], rt[5], g["y"]),
        ):
            rows = np.nonzero(side == side_val)[0]
            if not len(rows):
                continue
            ii = np.searchsorted(r_ids, rid[rows])
            blkv = r_blk[ii]
            posv = r_pos[ii]
            ob = np.argsort(blkv, kind="stable")
            rows_s = rows[ob]
            blk_s2 = blkv[ob]
            pos_s2 = posv[ob]
            segs = np.nonzero(
                np.concatenate(([True], blk_s2[1:] != blk_s2[:-1]))
            )[0]
            seg_ends = np.concatenate((segs[1:], [len(blk_s2)]))
            for c in carry:
                pieces = [
                    pc.take(
                        bviews[int(blk_s2[s])][c],
                        pa.array(pos_s2[s:e]),
                    )
                    for s, e in zip(segs, seg_ends)
                ]
                gathered = (
                    pa.concat_arrays(pieces)
                    if len(pieces) > 1
                    else pieces[0]
                )
                de = gathered.dictionary_encode()
                dvals = np.asarray(de.dictionary.to_pylist(), dtype=object)
                idxs = de.indices.to_numpy(zero_copy_only=False)
                cols_np[c][rows_s] = dvals[idxs]
        score, cand, optimal = score_pairs_flat(
            cols_np, cols_np, xi, yi, cfg, uniq
        )
        if not cand.any():
            return _pair_table({}, n_dropped)
        # local per-x argmax over this bucket's candidates
        xi_c, yi_c, sc = xi[cand], yi[cand], score[cand]
        x_of = rid[xi_c]
        order2 = np.argsort(x_of, kind="stable")
        x_s = x_of[order2]
        sc_s = sc[order2]
        bounds = np.nonzero(np.concatenate(([True], x_s[1:] != x_s[:-1])))[0]
        cnts = np.diff(np.concatenate((bounds, [len(x_s)])))
        maxes = np.maximum.reduceat(sc_s, bounds)
        keep = sc_s == np.repeat(maxes, cnts)
        sel = order2[keep]
        # n_scored: total pairs this x scored in this bucket, attached to
        # its FIRST SURVIVING row (summed downstream for the counter)
        x_keep = x_s[keep]
        firstk = np.concatenate(([True], x_keep[1:] != x_keep[:-1]))
        grp_sizes = np.repeat(cnts, cnts)[keep]
        n_scored = np.where(firstk, grp_sizes, 0).astype(np.int64)
        if _PROF_PATH:
            _prof_write("__bucket__", "total", P,
                        _time.perf_counter() - _t0)
        return _pair_table(
            {
                "x_id": pa.array(x_of[order2][keep]),
                "y_id": pa.array(rid[yi_c[sel]]),
                "score": pa.array(sc_s[keep]),
                "optimal": pa.array(optimal[xi_c[sel]]),
                "n_scored": pa.array(n_scored),
            },
            n_dropped,
        )

    # stage B output is tiny (tie rows only) — materialize once so the
    # dropped-group counter and stage C both read it without re-executing
    # the scoring pass.
    # The key stream was COALESCED to `shuffle_partitions` blocks before
    # this sort: the sort exchange creates (input blocks × output
    # partitions) intermediate objects and its output partition count
    # FOLLOWS the input block count — the raw union arrives as ~370 tiny
    # ~1 MB blocks at bench scale (row-group reads × flatten fan-out),
    # i.e. ~137k intermediate objects whose driver-side scheduling was a
    # ~20 s serial floor that didn't scale with CPUs (probed 2026-08-18:
    # shuffle-only 28.0 s direct vs 3.4 s via repartition(64) at 32 cpus,
    # 4.6 s at 8 cpus). Grouping granularity (n_buckets) is unchanged —
    # only the task layout. Default 2 tasks/CPU, min 64.
    pairs = keys_mat.groupby("bucket").map_groups(
        score_bucket, batch_format="pyarrow"
    ).materialize()
    counters["blocks_dropped"] = int(sum(ray.get(
        [_sum_col_partial.remote(r, "dropped_groups")
         for r in pairs.to_arrow_refs()]
    )))
    n_tie_rows = pairs.count()
    _tick("pair_scoring", {"tie_rows": n_tie_rows,
                           "blocks_dropped": counters["blocks_dropped"]})
    pairs_mat = pairs

    # ---- stage C: bucketed per-x reduce ----------------------------------
    req = cfg.required_threshold
    scored_schema = pa.schema(
        [("__x_id__", pa.int64()), ("pre_status", pa.string()),
         ("winner_y_id", pa.int64()), ("winner_score", pa.float64()),
         ("rows_matched", pa.string()), ("match_score_str", pa.string()),
         ("n_candidates", pa.int64())]
    )

    def reduce_bucket(t: pa.Table) -> pa.Table:
        # sentinel rows (x_id == -1, dropped-group carriers) are filtered
        # HERE — a separate filter map over the tie rows was one more
        # whole task wave
        t = t.filter(pc.not_equal(t["x_id"], -1))
        n = len(t)
        if n == 0:
            return scored_schema.empty_table()
        x_id = t["x_id"].to_numpy()
        y_id = t["y_id"].to_numpy()
        score = t["score"].to_numpy()
        optimal = t["optimal"].to_numpy()
        nsc = t["n_scored"].to_numpy()
        order = np.lexsort((y_id, x_id))
        x_s, y_s = x_id[order], y_id[order]
        # per-x scored-pair totals BEFORE dedupe (counter, not semantics)
        ns_order = np.argsort(x_id, kind="stable")
        ns_x = x_id[ns_order]
        ns_bounds = np.nonzero(np.concatenate(([True], ns_x[1:] != ns_x[:-1])))[0]
        ns_sums = np.add.reduceat(nsc[ns_order], ns_bounds)
        # dedupe repeated (x, y) pairs (same pair from several shared keys)
        first = np.concatenate(
            ([True], (x_s[1:] != x_s[:-1]) | (y_s[1:] != y_s[:-1]))
        )
        sel = order[first]
        x_s, y_s = x_id[sel], y_id[sel]
        sc_s, op_s = score[sel], optimal[sel]
        bounds = np.nonzero(np.concatenate(([True], x_s[1:] != x_s[:-1])))[0]
        ends = np.concatenate((bounds[1:], [len(x_s)]))
        # fully vectorized per-x resolution (the per-x Python loop here was
        # ~0.03 ms × |x| — the whole stage's wall time at corpus scale)
        g = len(bounds)
        gsize = ends - bounds
        mx = np.maximum.reduceat(sc_s, bounds)
        tie = sc_s == np.repeat(mx, gsize)
        n_ties = np.add.reduceat(tie.astype(np.int64), bounds)
        passing = mx >= req
        single = n_ties == 1
        status = np.where(
            ~passing, "unmatched",
            np.where(~single, "ambiguous",
                     np.where(mx <= op_s[bounds], "review", "matched")),
        )
        tie_idx = np.nonzero(tie)[0]
        grp_of_tie = np.searchsorted(bounds, tie_idx, side="right") - 1
        first_tie = np.zeros(g, np.int64)
        firstmask = np.concatenate(
            ([True], grp_of_tie[1:] != grp_of_tie[:-1])
        ) if len(grp_of_tie) else np.empty(0, bool)
        first_tie[grp_of_tie[firstmask]] = tie_idx[firstmask]
        win = passing & single
        winner = np.where(win, y_s[first_tie], -1).astype(np.int64)
        wscore = np.where(win, mx, np.nan)
        # rm / ms: per-group joined tie strings for passing groups (already
        # y-sorted); str(float) parity via one Python str per UNIQUE score
        keep_tie = passing[grp_of_tie]
        kept = tie_idx[keep_tie]
        kept_grp = grp_of_tie[keep_tie]
        counts = np.where(passing, n_ties, 0)
        offs = np.zeros(g + 1, np.int64)
        np.cumsum(counts, out=offs[1:])
        offs32 = pa.array(offs, pa.int32())
        rm = pc.binary_join(
            pa.ListArray.from_arrays(
                offs32, pc.cast(pa.array(y_s[kept]), pa.string())
            ),
            ", ",
        )
        codes, uniq_mx = pd.factorize(mx[kept_grp]) if len(kept) else (
            np.empty(0, np.int64), np.empty(0))
        strs = np.array([str(float(v)) for v in uniq_mx], dtype=object)
        ms = pc.binary_join(
            pa.ListArray.from_arrays(
                offs32,
                pa.array(strs[codes] if len(kept) else [], pa.string()),
            ),
            ", ",
        )
        # ns groups are the same ascending-unique-x sequence as `bounds`
        return pa.table(
            {
                "__x_id__": pa.array(x_s[bounds], pa.int64()),
                "pre_status": pa.array(status, pa.string()),
                "winner_y_id": pa.array(winner),
                "winner_score": pa.array(wscore, pa.float64()),
                "rows_matched": rm,
                "match_score_str": ms,
                "n_candidates": pa.array(ns_sums.astype(np.int64)),
            }
        )

    if n_tie_rows <= reduce_driver_cap:
        # small-corpus fast path: below the cap, pull the narrow numeric
        # tie rows zero-copy and run reduce_bucket ONCE on the driver —
        # saves a whole shuffle round (~3-5 s) on test/interactive sizes.
        # The cap is deliberately low: at 3.8 M ties the driver's
        # first-touch fault rate (~20 MB/s, CLAUDE.md) made this path
        # 49 s vs the 13 s bounded-bucket shuffle — measured, do not
        # raise without re-probing. Multi-node note: unlike the flat
        # blocks, these blocks hold ONLY pair_schema's 7 numeric columns
        # (56 B/row, ≤28 MB at the cap) — the whole-block get IS the
        # narrow partial here, no projection task needed.
        tie_parts = [
            t for t in ray.get(pairs_mat.to_arrow_refs()) if len(t)
        ]
        tie_tbl = (
            pa.concat_tables(tie_parts).combine_chunks()
            if tie_parts
            else pair_schema.empty_table()
        )
        scored = ray.data.from_arrow(reduce_bucket(tie_tbl)).materialize()
    else:
        # coalesce the 256 tiny tie blocks before the xb sort: the sort
        # emits (input blocks × output partitions) intermediate objects —
        # 256×256 ≈ 65k tiny object-store ops dominated this stage's wall
        scored = (
            pairs_mat.repartition(32)
            .groupby("xb")
            .map_groups(reduce_bucket, batch_format="pyarrow")
        ).materialize()

    # ONE zero-copy driver pass over the materialized scored blocks reads
    # everything stage D needs from them: the pairs_scored counter, the
    # winner triples for the duplicate pass AND the accepted-pair edges
    # for clustering — each was previously its own dataset round (an
    # aggregate, compute_flips' projection pass, and an edges
    # map+materialize+count), ~6-8 s of pure barrier latency per run.
    # Above the driver cap the distributed forms run instead.
    n_scored_rows = scored.count()
    driver_d = n_scored_rows <= 20_000_000  # 3 int64/f64 cols ≈ 480 MB cap
    if driver_d:
        # per-block remote partials: n_candidates is summed and the tie
        # STRINGS are dropped inside a task next to each block, so only
        # the numeric winner triples reach the driver (r2 pulled whole
        # scored blocks — single-node-shaped)
        parts = ray.get(
            [_winner_partial.remote(r) for r in scored.to_arrow_refs()]
        )
        pairs_sum = sum(p[0] for p in parts)
        wx_p = [p[1][0] for p in parts if len(p[1][0])]
        wy_p = [p[1][1] for p in parts if len(p[1][1])]
        ws_p = [p[1][2] for p in parts if len(p[1][2])]
        x_w = np.concatenate(wx_p) if wx_p else np.empty(0, np.int64)
        y_w = np.concatenate(wy_p) if wy_p else np.empty(0, np.int64)
        s_w = np.concatenate(ws_p) if ws_p else np.empty(0, np.float64)
        counters["pairs_scored"] = pairs_sum
        _tick("reduce", {"x_with_candidates": n_scored_rows,
                         "pairs_scored": pairs_sum})
        flip_x, flip_v = resolve_winner_arrays(
            x_w, y_w, s_w, cfg.duplicate_threshold
        )
        dup_ids = np.sort(flip_x[flip_v == "duplicate"])
        dem_ids = np.sort(flip_x[flip_v == "demote"])
        _tick("flips", {"n_flips": int(len(flip_x))})
    else:
        counters["pairs_scored"] = int(sum(ray.get(
            [_sum_col_partial.remote(r, "n_candidates")
             for r in scored.to_arrow_refs()]
        )))
        _tick("reduce", {"x_with_candidates": n_scored_rows,
                         "pairs_scored": counters["pairs_scored"]})
        flips = compute_flips(scored, cfg.duplicate_threshold)
        _tick("flips", {"n_flips": len(flips)})
        dup_ids = np.sort(np.fromiter(
            (k for k, v in flips.items() if v == "duplicate"), np.int64))
        dem_ids = np.sort(np.fromiter(
            (k for k, v in flips.items() if v == "demote"), np.int64))

    # ---- stage D: duplicate pass + finalize ------------------------------
    # broadcast as two SORTED id arrays, not a dict — at multi-mention
    # corpora the flip set is ~|x|/2, and per-batch dict iteration in every
    # finalize task was Python over the whole set
    flips_ref = ray.put((dup_ids, dem_ids))

    def finalize(t: pa.Table) -> pa.Table:
        dup_ids_s, dem_ids_s = ray.get(flips_ref)
        xids = t["__x_id__"].to_numpy()
        # status map + flip application vectorized: statuses have ~4
        # distinct values (map via factorize); flips arrive as sorted id
        # arrays — membership is two searchsorted probes, no per-row Python
        codes, uniq = pd.factorize(
            np.asarray(t["pre_status"].to_pylist(), dtype=object)
        )
        mapped = np.array([MATCH_STATUS[s] for s in uniq], dtype=object)
        final = mapped[codes] if len(uniq) else np.empty(0, object)
        demoted = np.zeros(len(t), dtype=bool)

        def _member(sorted_ids: np.ndarray) -> np.ndarray:
            if not len(sorted_ids):
                return np.zeros(len(xids), bool)
            pos = np.searchsorted(sorted_ids, xids)
            pos[pos == len(sorted_ids)] = 0
            return sorted_ids[pos] == xids

        hit_dup = _member(dup_ids_s)
        final[hit_dup] = MATCH_STATUS["duplicate"]
        demoted = _member(dem_ids_s)
        final[demoted] = MATCH_STATUS["unmatched"]
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
    _tick("finalize", {"rows": assignments.count()})

    # ---- stage D2: UNMATCHED backfill ------------------------------------
    # x docs whose every candidate pair was filtered (or that never shared
    # a block) are ABSENT from `scored`; surface them as UNMATCHED rows so
    # status accounting over assignments never silently loses rows.
    # Fast path: both id sets are skinny int64 columns of MATERIALIZED
    # datasets — read them zero-copy from plasma and setdiff on the driver
    # (no dataset passes at all; the previous semi_join form spent 3 extra
    # pipeline rounds, pure barrier latency at every corpus size tested).
    # Above the driver cap fall back to the shuffle forms.
    from record_matcher_ray.pipelines.joins import hash_join, semi_join

    def _unmatched_rows(k: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x_id": k["x_id"].combine_chunks(),
                "match_status": pa.array(
                    [MATCH_STATUS["unmatched"]] * len(k), pa.string()
                ),
                "winner_y_id": pa.array(np.full(len(k), -1, np.int64)),
                "winner_score": pa.nulls(len(k), pa.float64()),
                "rows_matched": pa.array([""] * len(k), pa.string()),
                "match_score": pa.array([""] * len(k), pa.string()),
                "demoted": pa.array(np.zeros(len(k), bool)),
            }
        )

    n_assigned = assignments.count()  # metadata (materialized above)
    n_x = x_flat.count()
    if n_x <= 50_000_000:  # 8 B/id → ≤400 MB of driver reads
        # the x id set is ALREADY on the driver (xr_ids, the routing
        # index built above — sorted asc); assignments project x_id via a
        # per-block task next to each block (r3: the r2 form re-pulled the
        # whole body-carrying x flats, the worst multi-node offender)
        x_ids_np = xr_ids
        got_np = np.concatenate(
            [p for p in ray.get(
                [_id_col_partial.remote(r, "x_id")
                 for r in assignments.to_arrow_refs()]
            ) if len(p)]
            or [np.empty(0, np.int64)]
        )
        miss_np = np.setdiff1d(x_ids_np, got_np)  # sorted unique
        backfill_tbl = _unmatched_rows(
            pa.table({"x_id": pa.array(miss_np, pa.int64())})
        )
        counters["x_without_candidates"] = len(miss_np)
        if len(miss_np):
            assignments = assignments.union(
                ray.data.from_arrow(backfill_tbl)
            ).materialize()
    else:  # id sets beyond driver memory: shuffle forms
        x_ids_only = x_flat.map_batches(
            lambda t: pa.table({"x_id": pc.cast(t["rid"], pa.int64())}),
            batch_format="pyarrow",
        )
        if n_assigned <= 20_000_000:
            missing = semi_join(
                x_ids_only,
                assignments.map_batches(
                    lambda t: pa.table({"x_id": t["x_id"].combine_chunks()}),
                    batch_format="pyarrow",
                ),
                on="x_id",
                anti=True,
            )
        else:  # broadcast would be GBs — bounded-bucket hash join instead
            marker = assignments.map_batches(
                lambda t: pa.table(
                    {"x_id_m": t["x_id"].combine_chunks(),
                     "present": pa.array(np.ones(len(t), np.int8))}
                ),
                batch_format="pyarrow",
            )
            missing = hash_join(
                x_ids_only, marker, "x_id", "x_id_m", how="left"
            ).map_batches(
                lambda t: t.filter(pc.is_null(t["present"])).select(["x_id"]),
                batch_format="pyarrow",
            )
        backfill = missing.map_batches(
            _unmatched_rows, batch_format="pyarrow"
        ).materialize()
        counters["x_without_candidates"] = backfill.count()
        if counters["x_without_candidates"]:
            assignments = assignments.union(backfill).materialize()
    _tick("assignments", {"rows": assignments.count(),
                          "backfilled": counters["x_without_candidates"]})

    # accepted edges for CLUSTERING: every pre-duplicate-pass winner pair
    # (score >= required_threshold, unambiguous). The duplicate pass resolves
    # the 1:1 assignment (multiple mentions of one entity matching the same
    # registry doc demote to UNMATCHED per reference semantics,
    # matcher.py:433-447) — but those demoted pairs are still true
    # same-entity links, exactly what transitive clustering must connect.
    if driver_d:
        # the winner arrays are already on the driver (stage-D pull):
        # build the edge table directly — no dataset round at all
        edges = ray.data.from_arrow(
            pa.table({"u": pa.array(x_w * 2), "v": pa.array(y_w * 2 + 1)})
        )
        counters["matches_accepted"] = int(len(x_w))
    else:
        def to_edges(t: pa.Table) -> pa.Table:
            keep = pc.not_equal(t["winner_y_id"], -1)
            k = t.filter(keep)
            return pa.table(
                {
                    "u": pc.multiply(k["x_id"].combine_chunks(), 2),
                    "v": pc.add(
                        pc.multiply(k["winner_y_id"].combine_chunks(), 2), 1
                    ),
                }
            )

        edges = assignments.map_batches(
            to_edges, batch_format="pyarrow"
        ).materialize()
        counters["matches_accepted"] = edges.count()
    _tick("edges", {"accepted": counters["matches_accepted"]})

    if cluster_edges and driver_d:
        # edge arrays are already driver-resident — and the winner table is
        # one row per x (per-x argmax), so the match graph is a forest of
        # stars: the degree-≤1 specialized kernel applies (one sort +
        # segmented min, no unique / propagation rounds)
        from record_matcher_ray.pipelines.cluster import (
            connected_components_star,
        )

        nodes, roots = connected_components_star(x_w * 2, y_w * 2 + 1)
        clusters = ray.data.from_arrow(
            pa.table({"node": pa.array(nodes), "component": pa.array(roots)})
        )
    elif cluster_edges:
        clusters = connected_components(edges)
    else:
        clusters = None
    _tick("clustering", {"enabled": cluster_edges})
    return DocMatchResult(assignments, edges, clusters, counters)


def edges_from_assignments(assignments: ray.data.Dataset) -> ray.data.Dataset:
    """Re-derive accepted-pair edges from a (possibly checkpoint-read)
    assignments dataset."""

    def to_edges(t: pa.Table) -> pa.Table:
        k = t.filter(pc.not_equal(t["winner_y_id"], -1))
        return pa.table(
            {
                "u": pc.multiply(k["x_id"].combine_chunks(), 2),
                "v": pc.add(pc.multiply(k["winner_y_id"].combine_chunks(), 2), 1),
            }
        )

    return assignments.map_batches(to_edges, batch_format="pyarrow")


def match_documents_checkpointed(
    x_docs: ray.data.Dataset,
    y_docs: ray.data.Dataset,
    root: str,
    *,
    n_shards: int = 4,
    shard_concurrency: int | None = None,
    fingerprint: str = "",
    cfg: MatchConfig | None = None,
    **kw,
) -> DocMatchResult:
    """Resumable variant: the x-corpus is hash-sharded on doc_id; each
    shard's assignment stage is an independently checkpointed partition
    (parquet + lineage manifest, state/checkpoint.py), so a killed run
    skips completed shards on restart without rescoring them. Clustering
    runs as a final checkpointed stage over the union of shard outputs.

    The y side is flattened + key-expanded exactly ONCE, as the
    checkpointed registry index (:func:`build_doc_index` stages
    ``y_flat``/``y_keys``/``y_keyset`` under the same ``root``); every
    shard then matches against the loaded ``y_prepared`` handle — no
    per-shard y recompute, and a resumed run reuses the index manifests
    as-is.

    ``shard_concurrency`` (default ``min(n_shards, 4)``) runs that many
    shard pipelines at once from driver threads — the single-driver
    analogue of parallel shard jobs on a cluster; it overlaps each
    shard's fixed stage latencies while the shards share the cluster's
    CPUs. Set 1 for strictly sequential shards."""
    from record_matcher_ray.state.checkpoint import StageRunner, hash_partition_ids

    cfg = cfg or default_doc_config()
    runner = StageRunner(root, fingerprint=fingerprint)
    parts = hash_partition_ids(n_shards)
    _, y_prepared = _load_y_prepared(
        y_docs, root, cfg,
        num_perm=kw.get("num_perm", 64),
        seed=kw.get("seed", 1),
        n_buckets=kw.get("n_buckets", 256),
        max_block_side=kw.get("max_block_side", 32),
        fingerprint=fingerprint,
    )

    conc = (shard_concurrency if shard_concurrency is not None
            else min(n_shards, 4))
    if "shuffle_partitions" not in kw and conc > 1:
        # each concurrent shard sizes its exchanges for its SHARE of the
        # cluster, not the whole of it (the 64-partition floor was tuned
        # for a single pipeline at 32 cpus)
        ncpu = int(ray.cluster_resources().get("CPU", 32))
        kw["shuffle_partitions"] = max(32, 2 * ncpu // conc)

    def shard_fn(part: str) -> ray.data.Dataset:
        i = int(part)

        def keep(t: pa.Table) -> pa.Table:
            rid = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 1, 99), pa.int64())
            shard = np.mod(rid.to_numpy(), n_shards)
            return t.filter(pa.array(shard == i))

        x_shard = x_docs.map_batches(keep, batch_format="pyarrow")
        return match_documents(
            x_shard, None, cfg, cluster_edges=False,
            y_prepared=y_prepared,
            x_block_cap=-(-kw.get("max_block_side", 32) // n_shards),
            **kw
        ).assignments

    assignments = runner.run_partitioned(
        "assignments", parts, shard_fn, max_concurrent=conc,
    )
    edges = edges_from_assignments(assignments).materialize()
    clusters = runner.run(
        "clusters", lambda: connected_components(edges)
    )
    counters = Counter(
        {"matches_accepted": edges.count(), "shards": n_shards}
    )
    res = DocMatchResult(assignments, edges, clusters, counters)
    res.runner = runner
    return res


def build_doc_index(
    y_docs: ray.data.Dataset,
    root: str,
    *,
    cfg: MatchConfig | None = None,
    num_perm: int = 64,
    seed: int = 1,
    n_buckets: int = 256,
    max_block_side: int = 32,
    fingerprint: str = "",
) -> "StageRunner":
    """Build (or reuse) the PERSISTENT registry-side index: normalized
    flats (stage ``y_flat``) and expanded blocking keys (stage
    ``y_keys``), checkpointed with lineage manifests under ``root``.

    A 100-TB deployment never re-derives the static registry side per
    run — the reference recomputes its group index every call
    (records.py:106-132), which is fine at 10^3 rows and prohibitive at
    10^9. Both stages are :class:`StageRunner` partitions: a second call
    with the same fingerprint skips them entirely, and a killed build
    resumes. The key-derivation parameters are folded into the manifest
    fingerprint so an index built with different ``num_perm``/``seed``/
    ``n_buckets`` is recomputed, never silently reused."""
    from record_matcher_ray.state.checkpoint import StageRunner

    cfg = cfg or default_doc_config()
    carry = sorted(set(cfg.x_match_columns()) | set(cfg.y_columns_needed()))
    fp = (f"{fingerprint}|perm{num_perm}-seed{seed}-b{n_buckets}"
          f"-cap{max_block_side}")
    runner = StageRunner(root, fingerprint=fp)

    runner.run(
        "y_flat",
        lambda: (
            y_docs.map_batches(flatten_spans, batch_format="pyarrow")
            .map_batches(add_int_ids, batch_format="pyarrow")
            .map_batches(lambda t: _normalize_carry_cols(t, carry),
                         batch_format="pyarrow")
        ),
    )

    def keys_fn() -> ray.data.Dataset:
        from record_matcher_ray.state.checkpoint import read_partition

        ks = read_partition(root, "y_flat", "all").map_batches(
            KeyExpander(1, [], num_perm, seed, n_buckets),
            batch_format="pyarrow",
        )

        # drop keys whose Y-side width exceeds the scoring cap AT BUILD
        # TIME: score_bucket drops any group with ny > max_block_side
        # (non-discriminative fat band buckets), so their y rows can
        # never score — at the 1M-entity corpus they are the MAJORITY of
        # the raw key mass (common filler-text bands) and sorting them
        # per bucket dominated the delta's scoring wall. One ≤n_buckets
        # exchange, one-time. Consequence (documented): a delta run's
        # `blocks_dropped` counter no longer counts ny-overflow groups —
        # assignments are unchanged (those groups never emit pairs).
        def drop_fat(t: pa.Table) -> pa.Table:
            k = t["key"].to_numpy()
            order = np.argsort(k, kind="stable")
            ks_s = k[order]
            bounds = np.nonzero(
                np.concatenate(([True], ks_s[1:] != ks_s[:-1]))
            )[0]
            sizes = np.diff(np.append(bounds, len(ks_s)))
            keep = np.repeat(sizes <= max_block_side, sizes)
            return t.take(pa.array(order[keep]))

        return ks.groupby("bucket").map_groups(
            drop_fat, batch_format="pyarrow"
        )

    runner.run("y_keys", keys_fn)

    def keyset_fn() -> ray.data.Dataset:
        from record_matcher_ray.state.checkpoint import read_partition

        # per-block distinct is enough (the delta load np.unique-merges);
        # this is the broadcastable "which keys exist on the y side at
        # scoreable width" set used to prune the DELTA's x keys
        def uniq(t: pa.Table) -> pa.Table:
            return pa.table(
                {"key": pa.array(np.unique(t["key"].to_numpy()))}
            )

        return read_partition(root, "y_keys", "all", columns=["key"]).map_batches(
            uniq, batch_format="pyarrow"
        )

    runner.run("y_keyset", keyset_fn)
    return runner


def _load_y_prepared(
    y_docs: ray.data.Dataset,
    root: str,
    cfg: MatchConfig,
    *,
    num_perm: int,
    seed: int,
    n_buckets: int,
    max_block_side: int,
    fingerprint: str,
):
    """Build (or manifest-skip) the registry index under ``root`` and
    load its plasma-resident form ``(y_flat, yk, yset_ref)``, session-
    cached so repeated calls against one registry pay the load once.
    Shared by the delta and checkpointed paths."""
    runner = build_doc_index(
        y_docs, root, cfg=cfg, num_perm=num_perm, seed=seed,
        n_buckets=n_buckets, fingerprint=fingerprint,
        max_block_side=max_block_side,
    )
    from record_matcher_ray.state.checkpoint import read_partition

    carry = sorted(set(cfg.x_match_columns()) | set(cfg.y_columns_needed()))
    cache_key = (root, fingerprint, num_perm, seed, n_buckets,
                 tuple(carry), max_block_side)
    cached = _DELTA_INDEX_CACHE.get("entry")
    if cached is not None and cached[0] == cache_key:
        return runner, cached[1]
    # read back ONLY rid + the scorer (carry) columns: the long
    # `body` fed key expansion at index-build time and never rides
    # again — at registry scale it is most of the flats' bytes.
    # Re-assert the single-chunk guarantee after the parquet
    # round-trip (score_bucket's views are zero-copy only over
    # single-chunk columns).
    need = ["rid"] + carry
    y_flat = (
        read_partition(root, "y_flat", "all", columns=need)
        .map_batches(lambda t: _normalize_carry_cols(t, carry),
                     batch_format="pyarrow")
        .materialize()
    )
    yk = read_partition(root, "y_keys", "all").materialize()
    set_parts = ray.get(
        [_key_partial.remote(r)
         for r in read_partition(
             root, "y_keyset", "all"
         ).to_arrow_refs()]
    )
    yset = (np.unique(np.concatenate(set_parts)) if set_parts
            else np.empty(0, np.int64))
    yset_ref = ray.put(yset) if len(yset) else None
    # one live entry: a daily-delta service processes many arriving
    # batches against ONE registry index per session — keep its
    # plasma-resident form (flats + key table + keyset) warm so only
    # the first delta pays the load
    _DELTA_INDEX_CACHE["entry"] = (cache_key, (y_flat, yk, yset_ref))
    return runner, (y_flat, yk, yset_ref)


def match_documents_delta(
    x_new_docs: ray.data.Dataset,
    y_docs: ray.data.Dataset,
    root: str,
    *,
    cfg: MatchConfig | None = None,
    num_perm: int = 64,
    seed: int = 1,
    n_buckets: int = 256,
    fingerprint: str = "",
    **kw,
) -> DocMatchResult:
    """Incremental matching: match ONLY ``x_new_docs`` (the day's arriving
    delta) against the registry, reusing the checkpointed registry index
    (``build_doc_index``) instead of re-flattening and re-key-expanding
    the static y side. First call builds the index; subsequent calls skip
    it via the lineage manifests, so a 10% delta costs roughly the x-side
    work plus the (cheap) index read-back — not a full re-match.

    Returns the standard :class:`DocMatchResult` restricted to the new
    docs; ``res.runner`` carries the index skip/compute accounting."""
    cfg = cfg or default_doc_config()
    runner, y_prepared = _load_y_prepared(
        y_docs, root, cfg, num_perm=num_perm, seed=seed,
        n_buckets=n_buckets,
        max_block_side=kw.get("max_block_side", 32),
        fingerprint=fingerprint,
    )
    res = match_documents(
        x_new_docs, None, cfg, num_perm=num_perm, seed=seed,
        n_buckets=n_buckets, y_prepared=y_prepared, **kw
    )
    res.runner = runner
    return res


def pairs_by_key_tag(
    x_docs: ray.data.Dataset,
    y_docs: ray.data.Dataset,
    *,
    num_perm: int = 64,
    seed: int = 1,
    n_buckets: int = 256,
    max_block_side: int = 32,
    shuffle_partitions: int = 64,
) -> pd.DataFrame:
    """Diagnostic histogram for skew probes (CLAUDE.md rule: probe
    pairs-by-key-tag before growing a corpus): per blocking-key FAMILY
    (1=exact title, 2=title n-gram, 3=body minhash band, 4=media), the
    candidate pairs an UNCAPPED pass would admit vs what the per-side
    cap admits/drops — the direct reading of whether LSH bucket caps are
    holding a skewed corpus's quadratic blocks in check. Same key
    derivation as :func:`match_documents`; one bounded exchange."""

    def expand(side: int):
        def pipe(docs: ray.data.Dataset) -> ray.data.Dataset:
            return (
                docs.map_batches(flatten_spans, batch_format="pyarrow")
                .map_batches(add_int_ids, batch_format="pyarrow")
                .map_batches(KeyExpander(side, [], num_perm, seed, n_buckets),
                             batch_format="pyarrow")
            )

        return pipe

    keys = (
        expand(0)(x_docs).union(expand(1)(y_docs))
        .repartition(shuffle_partitions)
    )
    hist_schema = pa.schema(
        [("tag", pa.int64()), ("groups", pa.int64()),
         ("dropped_groups", pa.int64()), ("admitted_pairs", pa.int64()),
         ("dropped_pairs", pa.int64()), ("max_side", pa.int64())]
    )

    def hist(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return hist_schema.empty_table()
        k = t["key"].to_numpy()
        side = t["side"].to_numpy()
        order = np.lexsort((side, k))
        ks, ss = k[order], side[order]
        bounds = np.nonzero(np.concatenate(([True], ks[1:] != ks[:-1])))[0]
        sizes = np.diff(np.append(bounds, n))
        nx = np.add.reduceat((ss == 0).astype(np.int64), bounds)
        ny = sizes - nx
        both = (nx > 0) & (ny > 0)
        ok = both & (nx <= max_block_side) & (ny <= max_block_side)
        pairs = nx * ny
        tag = (ks[bounds] >> np.int64(58)).astype(np.int64)
        out = {"tag": [], "groups": [], "dropped_groups": [],
               "admitted_pairs": [], "dropped_pairs": [], "max_side": []}
        for tg in np.unique(tag):
            m = tag == tg
            out["tag"].append(int(tg))
            out["groups"].append(int((m & both).sum()))
            out["dropped_groups"].append(int((m & both & ~ok).sum()))
            out["admitted_pairs"].append(int(pairs[m & ok].sum()))
            out["dropped_pairs"].append(int(pairs[m & both & ~ok].sum()))
            out["max_side"].append(
                int(np.maximum(nx[m], ny[m]).max()) if m.any() else 0
            )
        return pa.table(out, schema=hist_schema)

    parts = (
        keys.groupby("bucket")
        .map_groups(hist, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return parts
    agg = parts.groupby("tag").agg(
        groups=("groups", "sum"),
        dropped_groups=("dropped_groups", "sum"),
        admitted_pairs=("admitted_pairs", "sum"),
        dropped_pairs=("dropped_pairs", "sum"),
        max_side=("max_side", "max"),
    ).reset_index()
    return agg.sort_values("tag").reset_index(drop=True)
