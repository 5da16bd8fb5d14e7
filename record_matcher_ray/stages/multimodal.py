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


class MediaResizer:
    """Actor-pool stage: resize image payloads to ``(target_w, target_h)``.

    Same stateful-stage contract as :class:`MediaFeaturizer` (construct
    once per actor, small batches of binary payloads per call). The real
    path would decode with PIL/libvips and re-encode — those libraries are
    absent here, so ``mode='fake'`` synthesizes a deterministic payload of
    plausible size (content-hash seeded, ~bytes ∝ target area) while the
    SCHEMA, batch shape and actor wiring are the real thing. Non-image
    rows pass through unchanged (resize is an image op).
    """

    def __init__(self, target_w: int = 32, target_h: int = 32,
                 mode: str = "fake"):
        if mode == "real":
            raise NotImplementedError(
                "real image resize requires PIL/libvips, absent in this "
                "environment; use mode='fake'"
            )
        if mode != "fake":
            raise ValueError(f"unknown mode: {mode}")
        self.w, self.h = int(target_w), int(target_h)

    def _resize_fake(self, payload: bytes) -> bytes:
        rng = np.random.RandomState(zlib.crc32(payload) & 0x7FFFFFFF)
        return rng.bytes(max(16, self.w * self.h // 8))

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        kinds = t["kind"].to_pylist()
        out_p, out_w, out_h = [], [], []
        for p, k, w0, h0 in zip(payloads, kinds,
                                t["width"].to_pylist(),
                                t["height"].to_pylist()):
            if k == "image":
                out_p.append(self._resize_fake(p))
                out_w.append(self.w)
                out_h.append(self.h)
            else:
                out_p.append(p)
                out_w.append(w0)
                out_h.append(h0)
        return pa.table(
            {"media_id": t["media_id"].combine_chunks(),
             "kind": t["kind"].combine_chunks(),
             "payload": pa.array(out_p, pa.binary()),
             "width": pa.array(out_w, pa.int32()),
             "height": pa.array(out_h, pa.int32())}
        )


class FrameSampler:
    """Actor-pool stage: sample ``fps``-spaced frames from video payloads —
    one OUTPUT ROW PER FRAME (the expansion shape a real ffmpeg stage
    has), rows of other kinds are dropped. Fake decode: deterministic
    per-frame bytes seeded by (content hash, frame index); real path
    stubbed (no ffmpeg here). Frame timestamps come from ``duration_ms``.
    """

    def __init__(self, fps: float = 1.0, frame_bytes: int = 256,
                 mode: str = "fake"):
        if mode == "real":
            raise NotImplementedError(
                "real frame sampling requires ffmpeg/pyav, absent in this "
                "environment; use mode='fake'"
            )
        if mode != "fake":
            raise ValueError(f"unknown mode: {mode}")
        if fps <= 0:
            raise ValueError("fps must be positive")
        self.fps = float(fps)
        self.frame_bytes = int(frame_bytes)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, ts_ms, frames = [], [], [], []
        for mid, kind, payload, dur in zip(
            t["media_id"].to_pylist(), t["kind"].to_pylist(),
            t["payload"].to_pylist(), t["duration_ms"].to_pylist(),
        ):
            if kind != "video" or not dur:
                continue
            step_ms = 1000.0 / self.fps
            n = max(1, int(dur // step_ms) + (1 if dur % step_ms else 0))
            seed = zlib.crc32(payload) & 0x7FFFFFFF
            for i in range(n):
                rng = np.random.RandomState((seed + i) & 0x7FFFFFFF)
                ids.append(mid)
                fidx.append(i)
                ts_ms.append(int(i * step_ms))
                frames.append(rng.bytes(self.frame_bytes))
        return pa.table(
            {"media_id": pa.array(ids, pa.string()),
             "frame_idx": pa.array(fidx, pa.int64()),
             "ts_ms": pa.array(ts_ms, pa.int64()),
             "frame": pa.array(frames, pa.binary())}
        )


def resize_media(ds: ray.data.Dataset, target_w: int = 32,
                 target_h: int = 32, concurrency: int = 2,
                 batch_size: int = 64) -> ray.data.Dataset:
    """Run the image-resize actor pool over a media table."""
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def sample_frames(ds: ray.data.Dataset, fps: float = 1.0,
                  concurrency: int = 2,
                  batch_size: int = 32) -> ray.data.Dataset:
    """Run the video frame-sampling actor pool (one row per frame)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"fps": fps},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
