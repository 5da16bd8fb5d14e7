"""repetition_metrics: planted repetition patterns + an independent
pure-Python reimplementation as the second oracle."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from record_matcher_ray.pipelines.analysis import repetition_metrics


def _ref_metrics(text: str) -> dict:
    """Independent reimplementation (plain Python, no shared kernels)."""
    import re

    nt = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    toks = nt.split(" ") if nt else []
    n = len(toks)
    out = {"n_tokens": n, "dup_token_frac": 0.0,
           "top2gram_frac": 0.0, "top3gram_frac": 0.0}
    if n:
        out["dup_token_frac"] = (n - len(set(toks))) / n
    if n >= 2:
        c = Counter(zip(toks, toks[1:]))
        out["top2gram_frac"] = max(c.values()) / (n - 1)
    if n >= 3:
        c = Counter(zip(toks, toks[1:], toks[2:]))
        out["top3gram_frac"] = max(c.values()) / (n - 2)
    return {k: (np.floor(v * 1e6 + 0.5) / 1e6 if isinstance(v, float) else v)
            for k, v in out.items()}


def test_planted_patterns(ray_session):
    texts = [
        "",                                   # empty
        "only",                               # 1 token
        "spam spam spam spam spam",           # all same token
        "a b a b a b a b",                    # dominant 2-gram
        "x y z x y z x y z x y z",            # dominant 3-gram
        "all tokens here are fully distinct words",
        "Mixed CASE and, punctuation!! splits tokens",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    out = (
        repetition_metrics(ds).to_pandas()
        .sort_values("doc_id").set_index("doc_id")
    )
    assert len(out) == len(texts)
    # empty doc: all zeros
    assert out.loc[0].tolist() == [0, 0.0, 0.0, 0.0]
    # all-same: dup 4/5, every 2-gram identical
    assert out.loc[2, "dup_token_frac"] == 0.8
    assert out.loc[2, "top2gram_frac"] == 1.0
    assert out.loc[2, "top3gram_frac"] == 1.0
    # "a b" repeated: top 2-gram ("a","b") appears 4 times in 7 grams
    assert np.isclose(out.loc[3, "top2gram_frac"], np.floor(4 / 7 * 1e6 + 0.5) / 1e6)
    # fully distinct: zero dup fraction, every gram unique
    assert out.loc[5, "dup_token_frac"] == 0.0
    assert out.loc[5, "top2gram_frac"] == np.floor(1 / 6 * 1e6 + 0.5) / 1e6
    # exhaustive cross-check against the independent implementation
    for i, txt in enumerate(texts):
        ref = _ref_metrics(txt)
        for k, v in ref.items():
            assert np.isclose(out.loc[i, k], v, atol=1e-9), (i, k, out.loc[i, k], v)


def test_random_cross_check(ray_session):
    rng = np.random.default_rng(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 40)))
        for _ in range(200)
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    out = (
        repetition_metrics(ds).to_pandas()
        .sort_values("doc_id").set_index("doc_id")
    )
    for i, txt in enumerate(texts):
        ref = _ref_metrics(txt)
        for k, v in ref.items():
            assert np.isclose(out.loc[i, k], v, atol=1e-9), (i, k)
