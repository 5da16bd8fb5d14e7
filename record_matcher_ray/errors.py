"""Configuration error types.

Parity with the reference's exception surface (``errors.py:1-36`` in
/root/reference): same five NAMES and trigger conditions (SURVEY.md §2.3
C2-C8) so user code catching these by name ports over unchanged; the
message text is this engine's own (no reference test pins it).
"""


class TBConfigColumnNotFound(Exception):
    """A referenced column is not in the live x/y column set."""

    def __init__(self, column, columns):
        super().__init__(
            f"unknown column '{column}'; valid columns are: "
            f"{', '.join(sorted(columns))}"
        )


class TBConfigXUniqueConstraint(Exception):
    """A copy-over target x-column was already claimed by another mapping."""

    def __init__(self, column, config_dict):
        super().__init__(
            f"target column '{column}' is already mapped in {config_dict}; "
            f"each x target may be claimed once"
        )


class TBConfigOverwriteError(Exception):
    """Copy-over would overwrite an existing x-column without allow_overwrite."""

    def __init__(self, column):
        super().__init__(
            f"copy-over target '{column}' is an existing x column; pass "
            f"allow_overwrite=True to overwrite it"
        )


class TBConfigScorerNotFound(Exception):
    """Scorer name not present in the scorer registry."""

    def __init__(self, scorer, scorers):
        super().__init__(
            f"no scorer registered under '{scorer}'; registered scorers: "
            f"{', '.join(sorted(scorers))}"
        )


class TBConfigColumnToMatchLock(Exception):
    """Attempt to delete per-column config while the column is still matched."""

    def __init__(self, column):
        super().__init__(
            f"x column '{column}' is still configured for matching; delete "
            f"its ColumnsToMatch entry before removing its per-column config"
        )
