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

# convenience re-exports (lazy — keep import light; none touch ray.init)
from record_matcher_ray.api import RecordMatcher  # noqa: E402,F401
from record_matcher_ray.core.config import (  # noqa: E402,F401
    MatchConfig,
    MatchConfigBuilder,
)
from record_matcher_ray.functions.scorers import register_scorer  # noqa: E402,F401
