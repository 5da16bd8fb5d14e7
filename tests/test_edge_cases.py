"""Edge hardening: hypothesis fuzz of the vectorized scorer kernels against
their scalar definitions, empty-dataset edges of the Ray match path, and
strict-mode behavior through the distributed pipeline."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from record_matcher_ray.functions import scorers as sc

short_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=14
)


@settings(max_examples=200, deadline=None)
@given(st.lists(short_text, min_size=1, max_size=8),
       st.lists(short_text, min_size=1, max_size=8))
def test_jw_matrix_fuzz(xs, ys):
    xa = np.array(xs, dtype=object)
    ya = np.array(ys, dtype=object)
    m = sc.jaro_winkler_matrix(xa, ya)
    for i, x in enumerate(xs):
        for j, y in enumerate(ys):
            assert m[i, j] == pytest.approx(sc.jaro_winkler(x, y), abs=1e-9), (x, y)


@settings(max_examples=150, deadline=None)
@given(st.lists(short_text, min_size=1, max_size=10),
       st.lists(short_text, min_size=1, max_size=10))
def test_levenshtein_matrix_fuzz(xs, ys):
    xa = np.array(xs, dtype=object)
    ya = np.array(ys, dtype=object)
    m = sc.levenshtein_matrix(xa, ya)
    for i, x in enumerate(xs):
        for j, y in enumerate(ys):
            assert m[i, j] == pytest.approx(sc.levenshtein(x, y), abs=1e-9), (x, y)


@settings(max_examples=100, deadline=None)
@given(st.lists(short_text, min_size=1, max_size=24))
def test_jw_elementwise_fuzz(vals):
    xs = np.array(vals, dtype=object)
    ys = np.array(list(reversed(vals)), dtype=object)
    got = sc.jaro_winkler_elementwise(xs, ys)
    for i in range(len(vals)):
        assert got[i] == pytest.approx(sc.jaro_winkler(xs[i], ys[i]), abs=1e-9)


@settings(max_examples=100, deadline=None)
@given(st.lists(short_text, min_size=1, max_size=24))
def test_levenshtein_elementwise_fuzz(vals):
    xs = np.array(vals, dtype=object)
    ys = np.array(list(reversed(vals)), dtype=object)
    got = sc.levenshtein_elementwise(xs, ys)
    for i in range(len(vals)):
        assert got[i] == pytest.approx(sc.levenshtein(xs[i], ys[i]), abs=1e-9)


def test_levenshtein_elementwise_sparse_branch():
    # many unique values → sparse one-vs-many path
    xs = np.array([f"digits{i:06d}" for i in range(1500)], dtype=object)
    ys = np.array([f"digits{i + 1:06d}" for i in range(1500)], dtype=object)
    got = sc.levenshtein_elementwise(xs, ys)
    for i in range(0, 1500, 113):
        assert got[i] == pytest.approx(sc.levenshtein(xs[i], ys[i]))


# ---------------------------------------------------------------------------


def _mk_cfg(x_cols, y_cols, group=True):
    from record_matcher_ray.core.config import MatchConfigBuilder

    b = MatchConfigBuilder(x_columns=x_cols, y_columns=y_cols)
    b.match("name", ["name"])
    if group:
        b.group("city", "city")
    b.get("tag", "gotten")
    return b


def test_ray_match_empty_y(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.match import match_datasets

    x = rd.from_pandas(pd.DataFrame(
        {"xkey": [0, 1], "name": ["a", "b"], "city": ["c", "c"]}
    ))
    y_empty = rd.from_pandas(pd.DataFrame(
        {"ykey": pd.Series([], dtype="int64"), "name": pd.Series([], dtype=object),
         "city": pd.Series([], dtype=object), "tag": pd.Series([], dtype=object)}
    ))
    cfg = _mk_cfg({"xkey", "name", "city"}, {"ykey", "name", "city", "tag"}).build()
    res = match_datasets(x, y_empty, cfg, "xkey", "ykey")
    df = res.dataset.to_pandas()
    assert len(df) == 2
    assert (df["match_status"] == "UNMATCHED").all()
    assert dict(res.summary) == {"unmatched": 2}


def test_ray_match_strict_false_demotion(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.match import match_datasets

    x = rd.from_pandas(pd.DataFrame(
        {"xkey": [0, 1], "name": ["alice smith", "alice smithy"],
         "city": ["c", "c"]}
    ))
    y = rd.from_pandas(pd.DataFrame(
        {"ykey": [10], "name": ["alice smith"], "city": ["c"], "tag": ["Y0"]}
    ))
    b = _mk_cfg({"xkey", "name", "city"}, {"ykey", "name", "city", "tag"})
    b.scorers_by_column["name"] = "difflib_ratio"
    strict = match_datasets(x, y, b.build(strict_semantics=True), "xkey", "ykey")
    fixed = match_datasets(x, y, b.build(strict_semantics=False), "xkey", "ykey")
    sdf = strict.dataset.to_pandas().set_index("xkey")
    fdf = fixed.dataset.to_pandas().set_index("xkey")
    assert sdf.loc[1, "match_status"] == "UNMATCHED"
    # strict: copied value kept + spurious y-column null; fixed: copy nulled
    assert sdf.loc[1, "gotten"] == "Y0"
    assert "tag" in sdf.columns and sdf.loc[1, "tag"] is None
    assert fdf.loc[1, "gotten"] is None or fdf.loc[1, "gotten"] != fdf.loc[1, "gotten"]
    assert "tag" not in fdf.columns


def test_token_set_ratio():
    assert sc.token_set_ratio("big data systems", "systems data big") == 100.0
    assert sc.token_set_ratio("alpha beta", "beta gamma") < 100.0
    assert sc.token_set_ratio("", "") == 100.0


def test_session4_operators_empty_inputs(ray_session):
    """Every session-4 operator must survive an empty (but typed) input
    without schema crashes."""
    import pyarrow as pa
    import ray.data as rd

    from record_matcher_ray.pipelines.analysis import (
        blocklist_filter,
        char_entropy,
        normalize_text,
        script_profile,
    )
    from record_matcher_ray.pipelines.graph import triangle_count
    from record_matcher_ray.pipelines.relational import (
        global_row_number,
        percent_rank_by_group,
        resample_counts,
        rolling_active,
        running_total,
        sequence_pattern_counts,
    )
    from record_matcher_ray.pipelines.similarity import label_centroid_cosine
    from record_matcher_ray.pipelines.stats import robust_zscore
    from record_matcher_ray.pipelines.table_ops import (
        explode_list,
        mode_by_group,
    )

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    events = rd.from_arrow(
        pa.table({"event_id": pa.array([], pa.int64()),
                  "user_id": pa.array([], pa.int64()),
                  "ts": pa.array([], pa.timestamp("us")),
                  "event_type": pa.array([], pa.string()),
                  "value": pa.array([], pa.float64())})
    )
    emb = rd.from_arrow(
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "label": pa.array([], pa.int32()),
                  "embedding": pa.array([], pa.list_(pa.float32()))})
    )
    edges = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    )

    assert normalize_text(docs).count() == 0
    assert blocklist_filter(docs, ["x"]).count() == 0
    assert char_entropy(docs).count() == 0
    assert script_profile(docs).count() == 0
    assert resample_counts(events).count() == 0
    assert running_total(events).count() == 0
    assert percent_rank_by_group(events, "event_type", "value",
                                 "event_id").count() == 0
    assert sequence_pattern_counts(events, "c+p",
                                   {"click": "c", "purchase": "p"}
                                   ).count() == 0
    assert robust_zscore(events, "event_type", "value",
                         "event_id").count() == 0
    assert mode_by_group(events, "event_type", "user_id").count() == 0
    assert global_row_number(events, ["event_id"]).count() == 0
    assert explode_list(emb, "embedding", "vec_id").count() == 0
    assert len(rolling_active(events)) == 0
    assert len(label_centroid_cosine(emb)) == 0
    tri = triangle_count(edges)
    assert int(tri["n_triangles"][0]) == 0
