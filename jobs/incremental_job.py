"""Day-over-day incremental entity resolution — the standing-registry
production loop composed from the engine's r4/r5 pieces:

- **day 1 (bootstrap)**: full corpus match (``match_documents``) →
  accepted-pair edges → ``connected_components`` → entity table, with
  entity ids minted from the component labels.
- **day N**: the day's arriving delta matches against the PERSISTED
  registry index (``match_documents_delta`` over ``build_doc_index``
  manifests — no y-side recompute), its new edges fold into the previous
  day's clustering (``merge_components``, touched components only), and
  ``stable_relabel`` maps the result back onto the previous day's entity
  ids — downstream systems keyed on entity_id see stable ids across
  re-runs; splits/merges follow the documented min-id bookkeeping
  (pipelines/cluster.py:stable_relabel).

Every day's entity table is a checkpointed stage (``day0002_entities``
…) under the same lineage-manifest root as the registry index, so a
killed day-N run resumes without re-matching, and re-running an already
completed day is a manifest read-back.

CLI:
    python jobs/incremental_job.py --registry R --root CKPT \
        --day 1 --docs day1_docs.parquet [--num-cpus 32]

Reference semantics: the reference engine (matcher.py:219) has no
incremental path at all — every run re-scores everything; this job is
the Ray-native answer to "day 2 arrives" at registry scale.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import pyarrow as pa

import ray


def run_day(
    root: str,
    day: int,
    day_docs: "ray.data.Dataset",
    registry: "ray.data.Dataset",
    *,
    cfg=None,
    fingerprint: str = "",
    **kw,
) -> "ray.data.Dataset":
    """Run one day of the incremental loop; returns the day's entity
    table ``(node, component, entity_id)`` (checkpoint-backed).

    Node space follows ``edges_from_assignments``: corpus doc rid → 2·rid,
    registry rid → 2·rid+1 — stable across days, so day-N clusters merge
    into day-(N-1) components without id translation."""
    from record_matcher_ray.pipelines.cluster import (
        merge_components,
        stable_relabel,
    )
    from record_matcher_ray.pipelines.docmatch import (
        edges_from_assignments,
        match_documents,
        match_documents_delta,
    )
    from record_matcher_ray.state.checkpoint import StageRunner, read_partition

    if day < 1:
        raise ValueError("day starts at 1")
    runner = StageRunner(root, fingerprint=fingerprint)

    def day1() -> ray.data.Dataset:
        res = match_documents(day_docs, registry, cfg, **kw)
        return res.clusters.map_batches(
            lambda t: t.append_column("entity_id", t["component"]),
            batch_format="pyarrow",
        )

    def dayn() -> ray.data.Dataset:
        res = match_documents_delta(
            day_docs, registry, root, cfg=cfg, fingerprint=fingerprint, **kw
        )
        prev = read_partition(
            root, f"day{day - 1:04d}_entities", "all"
        ).materialize()
        merged = merge_components(
            prev.select_columns(["node", "component"]),
            edges_from_assignments(res.assignments),
        ).materialize()
        # stable_relabel's old side reads its comp column as the OLD
        # ENTITY id — feed (node, entity_id) views of yesterday's table
        old_ent = prev.map_batches(
            lambda t: pa.table(
                {"node": t["node"], "component": t["entity_id"]}
            ),
            batch_format="pyarrow",
        )
        return stable_relabel(old_ent, merged)

    return runner.run(
        f"day{day:04d}_entities", day1 if day == 1 else dayn
    ), runner


def main(argv: "list[str] | None" = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--registry", required=True)
    p.add_argument("--docs", required=True,
                   help="day-1 full corpus, or the day's delta parquet")
    p.add_argument("--root", required=True, help="checkpoint root")
    p.add_argument("--day", type=int, required=True)
    p.add_argument("--fingerprint", default="")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    if not ray.is_initialized():
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        else:
            ray.init(address="auto")
    from record_matcher_ray.sources.readers import read_table

    t0 = time.time()
    entities, runner = run_day(
        args.root, args.day, read_table(args.docs),
        read_table(args.registry), fingerprint=args.fingerprint,
    )
    n = entities.count()
    print(json.dumps({
        "day": args.day, "entities_rows": n,
        "wall_s": round(time.time() - t0, 2),
        "skipped": runner.skipped, "computed": runner.computed,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
