"""Contract — north-star document pipeline + multimodal.

Queries + DuckDB oracle SQL, split from __ray_entry__.py (r4). Each
query callable takes an sf_dir; oracles() returns the DuckDB replays
for the SQL-expressible subset.
"""
from __future__ import annotations

import os  # noqa: F401

import numpy as np  # noqa: F401

def _q_docmatch(sf_dir: str):
    """North-star pipeline over a deterministic interleaved corpus sized by
    sf (rows-only check: blocking + scoring + clustering are not SQL)."""
    import ray.data

    from record_matcher_ray.pipelines.docmatch import match_documents
    from record_matcher_ray.sources.corpus import generate_corpus

    scale = {"0.001": 60, "0.01": 200, "0.1": 800}.get(
        sf_dir.rstrip("/").split("sf")[-1], 200
    )
    d = f"/tmp/rmr_corpus_{scale}"
    if not os.path.exists(f"{d}/truth.parquet"):
        generate_corpus(d, n_entities=scale, seed=42)
    res = match_documents(
        ray.data.read_parquet(f"{d}/corpus.parquet"),
        ray.data.read_parquet(f"{d}/registry.parquet"),
    )
    return res.assignments


def _q_delta_match(sf_dir: str):
    """Incremental matching (r4): a 1-in-3 delta of corpus docs matched
    against the PERSISTED registry index (build_doc_index manifests; the
    build is skipped when the index exists). Rows-only check — matcher
    semantics are not SQL — but the result is pinned value-identical to a
    direct match of the same subset in tests/test_docmatch.py."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data

    from record_matcher_ray.pipelines.docmatch import match_documents_delta
    from record_matcher_ray.sources.corpus import generate_corpus

    scale = {"0.001": 60, "0.01": 200, "0.1": 800}.get(
        sf_dir.rstrip("/").split("sf")[-1], 200
    )
    d = f"/tmp/rmr_corpus_{scale}"
    if not os.path.exists(f"{d}/truth.parquet"):
        generate_corpus(d, n_entities=scale, seed=42)

    def keep(t: pa.Table) -> pa.Table:
        rid = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 1, 99), pa.int64())
        return t.filter(pa.array(np.mod(rid.to_numpy(), 3) == 0))

    res = match_documents_delta(
        ray.data.read_parquet(f"{d}/corpus.parquet").map_batches(
            keep, batch_format="pyarrow"
        ),
        ray.data.read_parquet(f"{d}/registry.parquet"),
        f"/tmp/rmr_regindex_{scale}",
        fingerprint=f"corpus-{scale}-seed42",
    )
    return res.assignments


def _q_media_features(sf_dir: str):
    import ray.data

    from record_matcher_ray.stages.multimodal import featurize_media, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(n=96, seed=3))
    return featurize_media(ds, decoder="fake", concurrency=2)


def _q_media_frames(sf_dir: str):
    """Video frame sampling (2 fps, one row per frame) — the multimodal
    expansion shape (actor pool, per-row fan-out, binary frame payloads);
    decode honestly stubbed. The resize stage is tested in
    tests/test_operators.py."""
    import ray.data

    from record_matcher_ray.stages.multimodal import (
        sample_frames,
        synth_media_table,
    )

    ds = ray.data.from_arrow(synth_media_table(n=96, seed=3))
    return sample_frames(ds, fps=2.0, concurrency=2)


def _q_media_real(sf_dir: str):
    """REAL multimodal decode end-to-end (r3/r4): genuinely decodable PNG
    images, PCM-WAV audio and AVI video (raw-DIB / MPNG frames) flow
    through resize (decode → nearest-resize → re-encode) then featurize
    with ``decoder='real'`` (stdlib codecs — stages/mediacodec.py;
    PIL/pyav picked up via import guards when present). Deterministic
    outputs (content-derived features, no RNG), so the driver's rows-only
    check sees a stable table. r4 closed the video stub: every kind now
    decodes for real (decoded=True for ALL rows) and the video payloads
    additionally ride FrameSampler(mode='real')."""
    import pandas as pd
    import ray.data

    from record_matcher_ray.stages.multimodal import (
        featurize_media,
        resize_media,
        sample_frames,
        synth_media_table,
    )

    tbl = synth_media_table(n=96, seed=3, real_payloads=True)
    ds = ray.data.from_arrow(tbl)
    feats = featurize_media(
        resize_media(ds, 8, 8, mode="real", concurrency=2),
        decoder="real", on_undecodable="null", concurrency=2,
    ).take_batch(200, batch_format="pyarrow")
    # real frame sampling over the same table: per-video frame counts
    frames = sample_frames(
        ray.data.from_arrow(tbl), fps=4.0, mode="real", concurrency=2
    ).take_batch(1000, batch_format="pyarrow")
    import collections

    nframes = collections.Counter(frames["media_id"].to_pylist())
    fl = feats["features"].to_pylist()
    return pd.DataFrame(
        {
            "media_id": feats["media_id"].to_pylist(),
            "kind": feats["kind"].to_pylist(),
            "n_bytes": feats["n_bytes"].to_pylist(),
            "decoded": [f is not None for f in fl],
            "feat_mean": [
                round(float(np.mean(f)), 6) if f is not None else None
                for f in fl
            ],
            "n_real_frames": [
                nframes.get(m, 0) for m in feats["media_id"].to_pylist()
            ],
        }
    ).sort_values("media_id").reset_index(drop=True)


def queries():
    return {
        "docmatch_corpus": _q_docmatch,
        "delta_match_docs": _q_delta_match,
        "media_features": _q_media_features,
        "media_frames": _q_media_frames,
        "media_real": _q_media_real,
    }


def oracles():
    return {
    }
