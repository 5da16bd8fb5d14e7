"""Head-to-head: the reference engine vs record_matcher_ray on IDENTICAL
synthetic workloads (same machine, same tables, same config semantics).

    PYTHONPATH=/root/repo python tools/head_to_head.py

Workload mirrors BASELINE.md's measured reference rows: NX x-records vs NY
y-records, 2 fuzzy match columns, blocked into NBLOCKS groups. Prints one
JSON line with both wall times, pair rates and the speedup.
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

import os

NX = NY = int(os.environ.get("H2H_N", "20000"))
NBLOCKS = int(os.environ.get("H2H_BLOCKS", "200"))
SEED = 42


def make_tables():
    rng = random.Random(SEED)

    def word():
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))

    y = {
        j: {"fn": word(), "ln": word(), "blk": f"b{j % NBLOCKS}", "tag": f"T{j}"}
        for j in range(NY)
    }
    x = {}
    for i in range(NX):
        src = y[rng.randrange(NY)]
        fn = list(src["fn"])
        fn[rng.randrange(len(fn))] = rng.choice("abcdefghijklmnopqrstuvwxyz")
        x[i] = {"fn": "".join(fn), "ln": src["ln"], "blk": src["blk"]}
    return x, y


def run_reference(x, y):
    import copy

    import record_matcher.config as ref_config
    from record_matcher.matcher import RecordMatcher as Ref

    from record_matcher_ray.functions.scorers import jaro_winkler

    ref_config.ScorersByColumn.SCORERS["jw"] = jaro_winkler
    m = Ref()
    m.x_records = copy.deepcopy(x)
    m.y_records = copy.deepcopy(y)
    m.config.scorers_by_column.default = "jw"
    m.config.columns_to_match["fn"] = "fn"
    m.config.columns_to_match["ln"] = "ln"
    m.config.columns_to_group["blk"] = "blk"
    m.config.columns_to_get["tag"] = "gotten"
    t0 = time.time()
    res, summary = m.match()
    return time.time() - t0, summary


def run_engine_local(x, y):
    import copy

    from record_matcher_ray.api import RecordMatcher

    m = RecordMatcher()
    m.x_records = copy.deepcopy(x)
    m.y_records = copy.deepcopy(y)
    m.config.scorers_by_column.default = "jaro_winkler"
    m.config.columns_to_match["fn"] = "fn"
    m.config.columns_to_match["ln"] = "ln"
    m.config.columns_to_group["blk"] = "blk"
    m.config.columns_to_get["tag"] = "gotten"
    t0 = time.time()
    res, summary = m.match()
    return time.time() - t0, summary


def run_engine_ray(x, y, num_cpus=32):
    import pandas as pd

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from record_matcher_ray.core.config import MatchConfigBuilder
    from record_matcher_ray.pipelines.match import match_datasets

    def to_df(records, idc):
        rows = []
        for k, r in records.items():
            rows.append(dict(r) | {idc: k})
        return pd.DataFrame(rows)

    x_ds = rd.from_pandas(to_df(x, "xid")).repartition(num_cpus)
    y_ds = rd.from_pandas(to_df(y, "yid")).repartition(num_cpus)
    b = MatchConfigBuilder(
        x_columns={"xid", "fn", "ln", "blk"},
        y_columns={"yid", "fn", "ln", "blk", "tag"},
    )
    b.match("fn", ["fn"], scorer="jaro_winkler")
    b.match("ln", ["ln"], scorer="jaro_winkler")
    b.group("blk", "blk")
    b.get("tag", "gotten")
    t0 = time.time()
    res = match_datasets(x_ds, y_ds, b.build(), "xid", "yid")
    n = res.dataset.count()
    dt = time.time() - t0
    summary = res.summary
    ray.shutdown()
    return dt, summary, n


def main():
    x, y = make_tables()
    pairs = NX * NY // NBLOCKS  # per-block candidate pairs
    t_ref, s_ref = run_reference(x, y)
    t_loc, s_loc = run_engine_local(x, y)
    t_ray, s_ray, n = run_engine_ray(x, y)
    assert dict(s_loc) == dict(s_ref), (s_loc, s_ref)
    assert dict(s_ray) == dict(s_ref), (s_ray, s_ref)
    print(json.dumps({
        "workload": f"{NX}x{NY}, 2 jw columns, {NBLOCKS} blocks, ~{pairs} pairs",
        "reference_sec": round(t_ref, 2),
        "engine_local_sec": round(t_loc, 2),
        "engine_ray32_sec": round(t_ray, 2),
        "speedup_local": round(t_ref / t_loc, 1),
        "speedup_ray": round(t_ref / t_ray, 1),
        "summaries_identical": True,
    }))


if __name__ == "__main__":
    main()
