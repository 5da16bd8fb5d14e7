"""Vectorized block-local match kernel — the heart of the engine.

Reproduces the scoring + match-semantics of the reference's
``records_match`` (/root/reference/record_matcher/matcher.py:92-216) and the
per-x half of ``RecordMatcher.match`` (matcher.py:320-406) over numpy
column arrays instead of per-row Python loops. This function is the body of
every Ray ``map_groups`` / ``map_batches`` scoring stage: given one block of
X rows and their full candidate set of Y rows (co-located by the blocking
shuffle — candidates are exactly the rows sharing the group key, matching
``records.group_by`` semantics at records.py:106-132), it emits one result
row per X row.

Semantics reproduced exactly (SURVEY.md §2.1 O6/O7/O8, §2.5):

- per-column score = max over mapped y-columns (matcher.py:83-84);
- cutoff=True keeps scores >= threshold, else scores > 0 (matcher.py:86-89);
- per-row weights = global x-uniqueness restricted to this row's non-blank
  match columns, renormalized to sum 1 (matcher.py:173-177);
- row score = sum of weighted passing column scores accumulated in
  columns_to_match order (matcher.py:184-200);
- candidates = y-rows passing ANY column filter (even at weight 0 — the
  reference's defaultdict key creation);
- argmax tie-set with float equality (matcher.py:202-208);
- optimal threshold = sum of column thresholds x weights (matcher.py:210-214);
- required-threshold filter then 1 → REVIEW (score <= optimal, inclusive)
  / MATCHED, >1 → AMBIGUOUS, 0 → UNMATCHED (matcher.py:357-388);
- ``rows_matched`` / ``match_score`` are ", "-joined strings in the
  reference's candidate-insertion order (first-passing-column, then y
  position — matcher.py:390-401).

The duplicate pass (matcher.py:408-447) is inherently global per winner-y
and lives in :func:`record_matcher_ray.pipelines.match.duplicate_pass`.
"""

from __future__ import annotations

import os
import time

import numpy as np

from record_matcher_ray.core.config import MatchConfig
from record_matcher_ray.functions.scorers import get_scorer

# optional hot-path profiling: RMR_PROF=<dir> makes every score_pairs_flat
# call append per-column (scorer, npairs, sec) lines to <dir>/<pid>.tsv —
# how stage-B wall time splits across scorers under real parallelism
_PROF_PATH = os.environ.get("RMR_PROF", "")


def _prof_write(col: str, scorer: str, npair: int, sec: float) -> None:
    try:
        os.makedirs(_PROF_PATH, exist_ok=True)
        with open(f"{_PROF_PATH}/{os.getpid()}.tsv", "a") as f:
            f.write(f"{col}\t{scorer}\t{npair}\t{sec:.4f}\n")
    except OSError:
        pass

MATCH_STATUS = {
    "unmatched": "UNMATCHED",
    "matched": "MATCHED",
    "ambiguous": "AMBIGUOUS",
    "review": "REVIEW",
    "duplicate": "DUPLICATE",
}

NO_WINNER = -1


def as_string_array(values, n: int | None = None) -> np.ndarray:
    """Normalize a column to an object array of strings; null/missing → "".

    Falsy NON-STRING scalars (0, False, 0.0) also map to "" — the
    reference's blank test is a raw truthiness check (``if value``,
    matcher.py:173-175 / records.py:66), so such rows carry no weight in
    matching, uniqueness or grouping. Truthy non-strings stringify
    (42 → "42")."""
    if values is None:
        return np.full(n, "", dtype=object)
    arr = np.asarray(values, dtype=object)
    out = np.empty(len(arr), dtype=object)
    for i, v in enumerate(arr):
        if isinstance(v, str):
            out[i] = v
        elif v is None or not v or (isinstance(v, float) and np.isnan(v)):
            out[i] = ""
        else:
            out[i] = str(v)
    return out


def score_pairs(
    x_cols: dict[str, np.ndarray],
    y_cols: dict[str, np.ndarray],
    x_ids: np.ndarray,
    y_ids: np.ndarray,
    cfg: MatchConfig,
    uniqueness: dict[str, float],
) -> dict[str, np.ndarray]:
    """Partial variant of :func:`score_block` for OR-blocking (LSH / n-gram
    multi-key candidate generation): emits one row per candidate PAIR
    (x_id, y_id, score, optimal) instead of reducing per x. The per-x argmax
    + status reduce then happens in a ``groupby(x_id)`` stage, because with
    OR-blocking a given x's candidates span multiple key groups (unlike the
    reference's conjunctive grouping where the group IS the candidate set).
    Scoring semantics are identical to score_block."""
    nx, ny = len(x_ids), len(y_ids)
    mcols = cfg.columns_to_match
    empty = {
        "x_id": np.empty(0, np.int64),
        "y_id": np.empty(0, np.int64),
        "score": np.empty(0, np.float64),
        "optimal": np.empty(0, np.float64),
    }
    if nx == 0 or ny == 0 or not mcols:
        return empty
    order = [c for c, _ in mcols]
    blank = np.full(nx, "", dtype=object)

    refined = {}
    rowsum = np.zeros(nx, dtype=np.float64)
    for c in order:
        xc = x_cols.get(c, blank)
        refined[c] = np.asarray(xc != "", dtype=bool)
        rowsum = rowsum + uniqueness.get(c, 0.0) * refined[c]
    safe = np.where(rowsum > 0, rowsum, 1.0)
    weights = {
        c: np.where(rowsum > 0, uniqueness.get(c, 0.0) * refined[c] / safe, 0.0)
        for c in order
    }

    score = np.zeros((nx, ny), dtype=np.float64)
    cand = np.zeros((nx, ny), dtype=bool)
    for c, ycols in mcols:
        xc = x_cols.get(c, blank)
        best = None
        if ycols:
            scorer = get_scorer(cfg.scorer_of(c))
            for ycol in ycols:
                m = scorer.pairwise(xc, y_cols.get(ycol, np.full(ny, "", dtype=object)))
                best = m if best is None else np.maximum(best, m)
        if best is None:
            best = np.zeros((nx, ny), dtype=np.float64)
        thr = cfg.threshold_of(c)
        passing = (best >= thr) if cfg.cutoff_of(c) else (best > 0)
        cand |= passing
        score += best * passing * weights[c][:, None]

    optimal = np.zeros(nx, dtype=np.float64)
    for c in order:
        optimal = optimal + cfg.threshold_of(c) * weights[c]

    xs, ys = np.nonzero(cand)
    return {
        "x_id": np.asarray(x_ids, np.int64)[xs],
        "y_id": np.asarray(y_ids, np.int64)[ys],
        "score": score[xs, ys],
        "optimal": optimal[xs],
    }


def score_pairs_flat(
    x_cols: dict[str, np.ndarray],
    y_cols: dict[str, np.ndarray],
    xi: np.ndarray,
    yi: np.ndarray,
    cfg: MatchConfig,
    uniqueness: dict[str, float],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flat-pair variant of :func:`score_pairs`: candidate pairs are given
    as aligned index vectors ``(xi, yi)`` into the x / y column arrays
    (many blocking groups batched into one call — the bucketed hot path;
    per-group Python invocation overhead dominates when groups are tiny).

    Returns ``(score, cand, optimal_x)``: per-pair weighted score, per-pair
    candidate mask (passes any column filter), and the per-X-ROW optimal
    threshold vector (length = len of x arrays). Scoring semantics are
    identical to score_block / score_pairs."""
    mcols = cfg.columns_to_match
    order = [c for c, _ in mcols]
    nx = len(next(iter(x_cols.values()))) if x_cols else 0
    npair = len(xi)
    blank_x = np.full(nx, "", dtype=object)

    refined = {}
    rowsum = np.zeros(nx, dtype=np.float64)
    for c in order:
        xc = x_cols.get(c, blank_x)
        refined[c] = np.asarray(xc != "", dtype=bool)
        rowsum = rowsum + uniqueness.get(c, 0.0) * refined[c]
    safe = np.where(rowsum > 0, rowsum, 1.0)
    weights = {
        c: np.where(rowsum > 0, uniqueness.get(c, 0.0) * refined[c] / safe, 0.0)
        for c in order
    }

    prof = _PROF_PATH and npair > 0
    score = np.zeros(npair, dtype=np.float64)
    cand = np.zeros(npair, dtype=bool)
    for c, ycols in mcols:
        t0 = time.perf_counter() if prof else 0.0
        xs = x_cols.get(c, blank_x)[xi]
        best = None
        if ycols:
            scorer = get_scorer(cfg.scorer_of(c))
            for ycol in ycols:
                yv = y_cols.get(ycol)
                ys = yv[yi] if yv is not None else np.full(npair, "", dtype=object)
                v = scorer.elementwise(xs, ys)
                best = v if best is None else np.maximum(best, v)
        if best is None:
            best = np.zeros(npair, dtype=np.float64)
        thr = cfg.threshold_of(c)
        passing = (best >= thr) if cfg.cutoff_of(c) else (best > 0)
        cand |= passing
        score += best * passing * weights[c][xi]
        if prof:
            _prof_write(c, cfg.scorer_of(c), npair, time.perf_counter() - t0)

    optimal = np.zeros(nx, dtype=np.float64)
    for c in order:
        optimal = optimal + cfg.threshold_of(c) * weights[c]
    return score, cand, optimal


def score_block(
    x_cols: dict[str, np.ndarray],
    y_cols: dict[str, np.ndarray],
    x_ids: np.ndarray,
    y_ids: np.ndarray,
    cfg: MatchConfig,
    uniqueness: dict[str, float],
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Score one X block against its complete candidate Y block.

    Parameters
    ----------
    x_cols / y_cols : column name → object array of normalized strings
        (missing column ⇒ all-"" array). Must include every column named in
        ``cfg.columns_to_match`` (x side) and mapped y-columns + get-columns
        (y side).
    x_ids / y_ids : int64 stable row ids.
    uniqueness : global x-table uniqueness per match column (O2), computed
        once and broadcast.

    Returns
    -------
    (result, copied):
        result: arrays of length nx — ``x_id``, ``pre_status`` (lowercase
        key), ``rows_matched``, ``match_score``, ``winner_y_id``,
        ``winner_score``.
        copied: target x_column → object array (None where not copied) for
        ``columns_to_get``.

    Documented deviation (whole distributed path): ambiguous-tie strings
    (``rows_matched`` / ``match_score``) are ordered by (first passing
    column, position of the y row within the block AS RECEIVED). In the
    local API the block order is y-insertion order, matching the
    reference's candidate-insertion order exactly; after Ray's sort
    shuffle the within-group row order is an execution artifact, so tie
    ORDER (not membership, scores or status) may differ from the reference
    there — same caveat as the salted hot-key path.
    """
    nx = len(x_ids)
    ny = len(y_ids)
    mcols = cfg.columns_to_match
    order = [c for c, _ in mcols]

    pre_status = np.full(nx, "unmatched", dtype=object)
    rows_matched = np.full(nx, "", dtype=object)
    match_score = np.full(nx, "", dtype=object)
    winner_y = np.full(nx, NO_WINNER, dtype=np.int64)
    winner_score = np.full(nx, np.nan, dtype=np.float64)
    copied = {
        x_col: np.full(nx, None, dtype=object) for _, x_col in cfg.columns_to_get
    }
    result = {
        "x_id": np.asarray(x_ids, dtype=np.int64),
        "pre_status": pre_status,
        "rows_matched": rows_matched,
        "match_score": match_score,
        "winner_y_id": winner_y,
        "winner_score": winner_score,
    }
    if ny == 0 or not mcols:
        return result, copied

    blank = np.full(nx, "", dtype=object)
    score = np.zeros((nx, ny), dtype=np.float64)
    cand = np.zeros((nx, ny), dtype=bool)
    pass_stack = np.zeros((len(order), nx, ny), dtype=bool)

    # per-row weight vectors: u_c * nonblank_c / sum (matcher.py:173-177)
    refined = {}
    rowsum = np.zeros(nx, dtype=np.float64)
    for c in order:
        xc = x_cols.get(c, blank)
        refined[c] = np.asarray(xc != "", dtype=bool)
        rowsum = rowsum + uniqueness.get(c, 0.0) * refined[c]
    weights = {}
    safe = np.where(rowsum > 0, rowsum, 1.0)
    for c in order:
        weights[c] = np.where(rowsum > 0, uniqueness.get(c, 0.0) * refined[c] / safe, 0.0)

    for ci, (c, ycols) in enumerate(mcols):
        xc = x_cols.get(c, blank)
        best = None
        if ycols:
            scorer = get_scorer(cfg.scorer_of(c))
            for ycol in ycols:
                m = scorer.pairwise(xc, y_cols.get(ycol, np.full(ny, "", dtype=object)))
                best = m if best is None else np.maximum(best, m)
        if best is None:
            best = np.zeros((nx, ny), dtype=np.float64)
        thr = cfg.threshold_of(c)
        passing = (best >= thr) if cfg.cutoff_of(c) else (best > 0)
        pass_stack[ci] = passing
        cand |= passing
        score += best * passing * weights[c][:, None]

    optimal = np.zeros(nx, dtype=np.float64)
    for c in order:
        optimal = optimal + cfg.threshold_of(c) * weights[c]

    cand_any = cand.any(axis=1)
    neg = np.where(cand, score, -np.inf)
    mx = neg.max(axis=1)
    # insertion order of candidates: first passing column, then y position
    first_col = pass_stack.argmax(axis=0)

    req = cfg.required_threshold
    emit = cand_any & (mx >= req)
    y_ids = np.asarray(y_ids, dtype=np.int64)
    for i in np.nonzero(emit)[0]:
        tie_pos = np.nonzero(cand[i] & (score[i] == mx[i]))[0]
        if len(tie_pos) > 1:
            tie_pos = sorted(tie_pos, key=lambda p: (first_col[i, p], p))
            pre_status[i] = "ambiguous"
        else:
            s = mx[i]
            pre_status[i] = "review" if s <= optimal[i] else "matched"
            pos = tie_pos[0]
            winner_y[i] = y_ids[pos]
            winner_score[i] = s
            for y_col, x_col in cfg.columns_to_get:
                copied[x_col][i] = y_cols.get(y_col, np.full(ny, "", dtype=object))[pos]
        rows_matched[i] = ", ".join(str(int(y_ids[p])) for p in tie_pos)
        match_score[i] = ", ".join(str(float(score[i, p])) for p in tie_pos)

    return result, copied
