"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels are STUBS (no image/audio libraries in this container):
``decoder="fake"`` produces a deterministic feature vector from the bytes
(crc-seeded), so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested; swapping in a real decoder
is a one-method change (see ``_decode_real``).

Batch-size note: binary payloads are heavy — callers should pass a small
``batch_size`` (e.g. 64) so batch × concurrency fits the worker heap.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 0) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(128 + (i % 5) * 64)
        rows.append(
            {
                "media_id": f"m{i:06d}",
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/wav",
                         "video": "video/mp4"}[kind],
                "width": 64 if kind != "audio" else 0,
                "height": 64 if kind != "audio" else 0,
                "duration_ms": 0 if kind == "image" else 1000 + i,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class MediaFeaturizer:
    """Actor-pool stage: decode + featurize media payloads.

    Use as ``ds.map_batches(MediaFeaturizer, fn_constructor_kwargs=...,
    concurrency=N, batch_size=64, num_cpus=1)`` — the decoder/model loads
    ONCE per actor in __init__ (the stateful-stage contract), each __call__
    handles one small batch of binary payloads.
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 16):
        self.feature_dim = feature_dim
        if decoder == "fake":
            self.decode = self._decode_fake
        elif decoder == "real":
            self.decode = self._decode_real
        else:
            raise ValueError(f"unknown decoder: {decoder}")

    def _decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        # Would be: PIL.Image.open(io.BytesIO(payload)) / soundfile / ffmpeg
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; use decoder='fake'"
        )

    def _decode_fake(self, payload: bytes, kind: str) -> np.ndarray:
        # deterministic pseudo-features seeded by content hash: stable
        # across retries, shaped like a real embedding
        rng = np.random.RandomState(zlib.crc32(payload) & 0x7FFFFFFF)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        kinds = t["kind"].to_pylist()
        feats = [self.decode(p, k) for p, k in zip(payloads, kinds)]
        return pa.table(
            {
                "media_id": t["media_id"].combine_chunks(),
                "kind": t["kind"].combine_chunks(),
                "n_bytes": pa.array(
                    np.asarray([len(p) for p in payloads], np.int64)
                ),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def featurize_media(
    ds: ray.data.Dataset,
    decoder: str = "fake",
    feature_dim: int = 16,
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Run the featurizer actor pool over a media table."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decoder": decoder, "feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
