"""record_matcher_ray — a Ray-Data-native record-linkage / data-processing engine.

Re-implements, from scratch, the capabilities of ``jtai-dev/record_matcher``
(reference at /root/reference — see SURVEY.md) on top of ``ray.data.Dataset``
pipelines: zero-copy Arrow ``map_batches`` stages, groupby-shuffle blocking,
stateful actor pools for scoring, and groupby-aggregate reduces for the
match-semantics and duplicate passes, plus union-find transitive clustering
and a family of large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing).

Layout
------
- ``core``      — pure (no-Ray) semantics: config, record utilities, the
                  vectorized block-local match kernel.
- ``functions`` — scorer registry + text / hashing kernels.
- ``sources``   — readers and the deterministic interleaved-document corpus.
- ``stages``    — reusable map_batches stage callables (flatten, blocking,
                  scoring actor pools).
- ``pipelines`` — end-to-end Dataset pipelines (match, cluster, dedup,
                  similarity, analysis).
- ``state``     — per-partition lineage manifests + resumable runner.

NOTE: nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` —
the session is owned by the caller (driver, bench.py, or test fixture).
"""

__version__ = "0.1.0"

# Keep jemalloc's freed Arrow buffers resident for 10 s instead of the
# sub-second default decay: every map_batches task allocates/frees tens of
# MB of Arrow buffers, and returning them to the OS between tasks makes
# each task re-fault its working set — page-fault throughput saturates
# machine-wide (~30 GB/s aggregate, measured 2026-08-18), so the re-fault
# tax GROWS with worker count and erodes scaling. 10 s >> task duration ⇒
# steady-state reuse; per-worker dirty retention is bounded by its peak
# batch footprint. Workers import this package before any kernel runs.
try:  # not all Arrow builds ship jemalloc
    import pyarrow as _pa

    if _pa.default_memory_pool().backend_name == "jemalloc":
        _pa.jemalloc_set_decay_ms(10_000)
except Exception:  # pragma: no cover - allocator knob is best-effort
    pass

# The same re-fault tax hits NUMPY temporaries, which go through glibc
# malloc: any block past the (≤32 MB) mmap threshold is mmap'd fresh and
# munmap'd on free, so each multi-ten-MB temporary in a driver stage
# (connected-components rounds, winner-flip resolution) or a worker kernel
# re-pays first-touch page faults on every allocation. Raising
# M_MMAP_THRESHOLD to 1 GB and M_TRIM_THRESHOLD likewise serves those
# blocks from the sbrk heap and KEEPS the pages across free/alloc cycles:
# the process faults its peak working set once and reuses it thereafter.
# RSS cost is bounded by each process's peak temporary footprint (driver
# ~hundreds of MB, workers ~tens), well inside this host's budget.
try:
    import ctypes as _ct

    _libc = _ct.CDLL("libc.so.6", use_errno=True)
    _libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
    _libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
except Exception:  # pragma: no cover - allocator knob is best-effort
    pass

# convenience re-exports (lazy — keep import light; none touch ray.init)
from record_matcher_ray.api import RecordMatcher  # noqa: E402,F401
from record_matcher_ray.core.config import (  # noqa: E402,F401
    MatchConfig,
    MatchConfigBuilder,
)
from record_matcher_ray.functions.scorers import register_scorer  # noqa: E402,F401
