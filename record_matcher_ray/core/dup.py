"""Duplicate-pass resolution — the per-winner-y global reduce.

Reproduces ``RecordMatcher.match``'s second pass
(/root/reference/record_matcher/matcher.py:408-447): for every y-row that
won (status matched/review) more than one x-row,

- if ≥2 x's tie at the max score, or (max - min) < ``duplicate_threshold``:
  ALL those x's flip to DUPLICATE (keeping their copied columns and
  rows_matched / match_score strings — SURVEY.md §2.5.1);
- otherwise every non-max x ("loser") flips to UNMATCHED with blanked
  rows_matched / match_score; in ``strict_semantics`` mode the blanking
  writes ``None`` into the columns named by the *y*-column keys of
  ``columns_to_get`` (the reference's loser-nulling bug, matcher.py:439-440,
  SURVEY.md §2.5.2), leaving the actually-copied x-column value intact; with
  ``strict_semantics=False`` the copied x-columns are nulled instead.

This logic is shared by the local dict-table API and the Ray pipeline's
``groupby(winner_y_id)`` stage, so both paths cannot drift apart.
"""

from __future__ import annotations


def resolve_duplicates(
    x_matches: list[tuple[int, float]], duplicate_threshold: float
) -> tuple[str, list[int]]:
    """Resolve one winner-y group.

    Parameters
    ----------
    x_matches : (x_id, score) for every x this y won, in arrival order.

    Returns
    -------
    ("none", []) — group of one, nothing changes;
    ("duplicate", all_x_ids) — every x flips to DUPLICATE;
    ("demote", loser_x_ids) — non-max x's flip to UNMATCHED.
    """
    if len(x_matches) <= 1:
        return "none", []
    scores = [s for _, s in x_matches]
    max_score = max(scores)
    min_score = min(scores)
    max_ids = [x for x, s in x_matches if s == max_score]
    if len(max_ids) > 1 or abs(max_score - min_score) < duplicate_threshold:
        return "duplicate", [x for x, _ in x_matches]
    return "demote", [x for x, s in x_matches if s != max_score]
