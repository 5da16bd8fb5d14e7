"""Match configuration: mutable builder with the reference's validation
rules, frozen into an immutable, picklable :class:`MatchConfig` that ships
to Ray workers inside ``map_batches`` closures / actor constructor args.

Validation parity (SURVEY.md §2.3, /root/reference/record_matcher/config.py):

- ``columns_to_match`` (C2): unknown x-column is silently a detached no-op
  (``config.py:180-184``); unknown y-columns are silently dropped
  (``config.py:159-175``); assignment auto-populates scorer / threshold /
  cutoff defaults (``config.py:176-178``); deletion cascades.
- ``columns_to_get`` (C3): unknown y silently rejected (``config.py:242``);
  duplicate target x-column → ``TBConfigXUniqueConstraint``; overwriting an
  existing x-column without ``allow_overwrite`` → ``TBConfigOverwriteError``.
- ``columns_to_group`` (C4): unknown column on either side →
  ``TBConfigColumnNotFound``.
- ``scorers_by_column`` (C5): unknown scorer → ``TBConfigScorerNotFound``;
  ``None`` → instance default; delete while matched →
  ``TBConfigColumnToMatchLock``.
- ``thresholds_by_column`` (C6): default 75.0, numeric-only (ValueError).
- ``cutoffs_by_column`` (C7): default False, bool-only (ValueError).
- builder resets all sub-configs when a newly-assigned table has a
  different column set (``config.py:54-94``); ``populate()`` auto-matches on
  the x∩y name intersection (``config.py:96-98``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from record_matcher_ray.errors import (
    TBConfigColumnNotFound,
    TBConfigColumnToMatchLock,
    TBConfigOverwriteError,
    TBConfigScorerNotFound,
    TBConfigXUniqueConstraint,
)
from record_matcher_ray.functions import scorers as _scorers

DEFAULT_THRESHOLD = 75.0
DEFAULT_CUTOFF = False
DEFAULT_REQUIRED_THRESHOLD = 75.0
DEFAULT_DUPLICATE_THRESHOLD = 0.0


@dataclass(frozen=True)
class MatchConfig:
    """Immutable snapshot of a validated match configuration.

    Ordering of ``columns_to_match`` is load-bearing: weighted score
    accumulation follows it, mirroring the reference's dict-insertion-order
    iteration at ``matcher.py:186-200``.
    """

    columns_to_match: tuple[tuple[str, tuple[str, ...]], ...] = ()
    columns_to_get: tuple[tuple[str, str], ...] = ()  # (y_col, x_col)
    columns_to_group: tuple[tuple[str, str], ...] = ()  # (y_col, x_col)
    scorers: tuple[tuple[str, str], ...] = ()  # x_col -> scorer name
    thresholds: tuple[tuple[str, float], ...] = ()
    cutoffs: tuple[tuple[str, bool], ...] = ()
    required_threshold: float = DEFAULT_REQUIRED_THRESHOLD
    duplicate_threshold: float = DEFAULT_DUPLICATE_THRESHOLD
    # strict_semantics=True reproduces the reference's quirks bit-for-bit
    # (loser-nulling writes the *y*-column name, SURVEY.md §2.5.2).
    strict_semantics: bool = True

    # -- dict views (small; rebuilt on demand, config objects are tiny) ----
    def match_map(self) -> dict[str, tuple[str, ...]]:
        return dict(self.columns_to_match)

    def get_map(self) -> dict[str, str]:
        return dict(self.columns_to_get)

    def group_map(self) -> dict[str, str]:
        return dict(self.columns_to_group)

    def scorer_of(self, x_col: str) -> str:
        return dict(self.scorers).get(x_col, _scorers.DEFAULT_SCORER)

    def threshold_of(self, x_col: str) -> float:
        return dict(self.thresholds).get(x_col, DEFAULT_THRESHOLD)

    def cutoff_of(self, x_col: str) -> bool:
        return dict(self.cutoffs).get(x_col, DEFAULT_CUTOFF)

    def x_match_columns(self) -> list[str]:
        return [c for c, _ in self.columns_to_match]

    def y_columns_needed(self) -> list[str]:
        """Y-side columns the pipeline must carry through the shuffle."""
        cols: list[str] = []
        for _, ycols in self.columns_to_match:
            cols.extend(ycols)
        cols.extend(y for y, _ in self.columns_to_get)
        cols.extend(y for y, _ in self.columns_to_group)
        seen: set[str] = set()
        return [c for c in cols if not (c in seen or seen.add(c))]


class _ColumnsToMatch(dict):
    def __init__(self, b: "MatchConfigBuilder"):
        super().__init__()
        self._b = b

    def __setitem__(self, x_col, y_cols):
        if isinstance(y_cols, str):
            y_cols = [y_cols]
        current = self[x_col]  # __missing__ handles unknown x (detached [])
        for y in y_cols:
            if y in self._b.y_columns and y not in current:
                current.append(y)
        self._b.scorers_by_column[x_col] = None
        self._b.thresholds_by_column[x_col] = None
        self._b.cutoffs_by_column[x_col] = None

    def __missing__(self, x_col):
        if x_col not in self._b.x_columns:
            return []  # silent detached no-op, as the reference (config.py:180-184)
        super().__setitem__(x_col, [])
        return super().__getitem__(x_col)

    def __delitem__(self, x_col):
        super().__delitem__(x_col)
        self._b.scorers_by_column.pop(x_col, None)
        self._b.thresholds_by_column.pop(x_col, None)
        self._b.cutoffs_by_column.pop(x_col, None)


class _ColumnsToGet(dict):
    def __init__(self, b: "MatchConfigBuilder"):
        super().__init__()
        self._b = b
        self.allow_overwrite = False

    def __setitem__(self, y_col, x_col=None):
        if y_col not in self._b.y_columns:
            return  # silently rejected (config.py:242-243)
        if not self.allow_overwrite and x_col in self._b.x_columns:
            raise TBConfigOverwriteError(x_col)
        if x_col in self.values():
            raise TBConfigXUniqueConstraint(x_col, type(self).__name__)
        super().__setitem__(y_col, x_col)


class _ColumnsToGroup(dict):
    def __init__(self, b: "MatchConfigBuilder"):
        super().__init__()
        self._b = b

    def __setitem__(self, y_col, x_col):
        if y_col not in self._b.y_columns:
            raise TBConfigColumnNotFound(y_col, self._b.y_columns)
        if x_col not in self._b.x_columns:
            raise TBConfigColumnNotFound(x_col, self._b.x_columns)
        super().__setitem__(y_col, x_col)


class _ScorersByColumn(dict):
    def __init__(self, b: "MatchConfigBuilder"):
        super().__init__()
        self._b = b
        self.default = _scorers.DEFAULT_SCORER

    def __setitem__(self, x_col, name=None):
        if x_col not in self._b.x_columns:
            raise TBConfigColumnNotFound(x_col, self._b.x_columns)
        if name is None:
            super().__setitem__(x_col, self.default)
        elif name in _scorers.SCORERS:
            super().__setitem__(x_col, name)
        else:
            raise TBConfigScorerNotFound(name, _scorers.SCORERS)

    def __delitem__(self, x_col):
        if x_col in self._b.columns_to_match:
            raise TBConfigColumnToMatchLock(x_col)
        super().__delitem__(x_col)


class _ThresholdsByColumn(dict):
    def __init__(self, b: "MatchConfigBuilder"):
        super().__init__()
        self._b = b
        self.default = DEFAULT_THRESHOLD

    def __setitem__(self, x_col, threshold=None):
        if x_col not in self._b.x_columns:
            return
        if threshold is None:
            super().__setitem__(x_col, self.default)
        elif isinstance(threshold, (int, float)) and not isinstance(threshold, bool):
            super().__setitem__(x_col, float(threshold))
        else:
            raise ValueError("Threshold must be a real number.")

    def __delitem__(self, x_col):
        if x_col in self._b.columns_to_match:
            raise TBConfigColumnToMatchLock(x_col)
        super().__delitem__(x_col)


class _CutoffsByColumn(dict):
    def __init__(self, b: "MatchConfigBuilder"):
        super().__init__()
        self._b = b
        self.default = DEFAULT_CUTOFF

    def __setitem__(self, x_col, cutoff=None):
        if x_col not in self._b.x_columns:
            return
        if cutoff is None:
            super().__setitem__(x_col, self.default)
        elif isinstance(cutoff, bool):
            super().__setitem__(x_col, cutoff)
        else:
            raise ValueError("Cutoff must be a boolean.")

    def __delitem__(self, x_col):
        if x_col in self._b.columns_to_match:
            raise TBConfigColumnToMatchLock(x_col)
        super().__delitem__(x_col)


class MatchConfigBuilder:
    """Mutable, validated configuration builder.

    Accepts either explicit column sets or schemas/datasets via
    :meth:`set_x_columns` / :meth:`set_y_columns`; assigning a different
    column set resets all sub-configs (reference ``config.py:54-94``).
    """

    def __init__(self, x_columns=None, y_columns=None):
        self._x_columns: set[str] = set()
        self._y_columns: set[str] = set()
        self.columns_to_match = _ColumnsToMatch(self)
        self.columns_to_get = _ColumnsToGet(self)
        self.columns_to_group = _ColumnsToGroup(self)
        self.scorers_by_column = _ScorersByColumn(self)
        self.thresholds_by_column = _ThresholdsByColumn(self)
        self.cutoffs_by_column = _CutoffsByColumn(self)
        if x_columns:
            self.set_x_columns(x_columns)
        if y_columns:
            self.set_y_columns(y_columns)

    @property
    def x_columns(self) -> set[str]:
        return set(self._x_columns)

    @property
    def y_columns(self) -> set[str]:
        return set(self._y_columns)

    def set_x_columns(self, columns):
        columns = set(columns)
        if self._x_columns and self._x_columns != columns:
            self.reset()
        self._x_columns = columns

    def set_y_columns(self, columns):
        columns = set(columns)
        if self._y_columns and self._y_columns != columns:
            self.reset()
        self._y_columns = columns

    def reset(self):
        self.columns_to_match.clear()
        self.columns_to_get.clear()
        self.columns_to_group.clear()
        self.scorers_by_column.clear()
        self.thresholds_by_column.clear()
        self.cutoffs_by_column.clear()

    def populate(self):
        """Auto-create match mappings for every shared column name."""
        for column in sorted(self._x_columns & self._y_columns):
            self.columns_to_match[column] = column

    # fluent helpers -------------------------------------------------------
    def match(self, x_col, y_cols, scorer=None, threshold=None, cutoff=None):
        self.columns_to_match[x_col] = y_cols
        if scorer is not None:
            self.scorers_by_column[x_col] = scorer
        if threshold is not None:
            self.thresholds_by_column[x_col] = threshold
        if cutoff is not None:
            self.cutoffs_by_column[x_col] = cutoff
        return self

    def group(self, y_col, x_col):
        self.columns_to_group[y_col] = x_col
        return self

    def get(self, y_col, x_col):
        self.columns_to_get[y_col] = x_col
        return self

    def build(
        self,
        required_threshold: float = DEFAULT_REQUIRED_THRESHOLD,
        duplicate_threshold: float = DEFAULT_DUPLICATE_THRESHOLD,
        strict_semantics: bool = True,
    ) -> MatchConfig:
        return MatchConfig(
            columns_to_match=tuple(
                (x, tuple(ys)) for x, ys in self.columns_to_match.items()
            ),
            columns_to_get=tuple(self.columns_to_get.items()),
            columns_to_group=tuple(self.columns_to_group.items()),
            scorers=tuple(self.scorers_by_column.items()),
            thresholds=tuple(self.thresholds_by_column.items()),
            cutoffs=tuple(self.cutoffs_by_column.items()),
            required_threshold=required_threshold,
            duplicate_threshold=duplicate_threshold,
            strict_semantics=strict_semantics,
        )
