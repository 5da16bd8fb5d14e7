"""Configuration error types.

Parity with the reference's exception surface (``errors.py:1-36`` in
/root/reference): same five names, same trigger conditions (SURVEY.md §2.3
C2-C8), so user code catching these by name ports over unchanged.
"""


class TBConfigColumnNotFound(Exception):
    """A referenced column is not in the live x/y column set."""

    def __init__(self, column, columns):
        super().__init__(
            f"Column '{column}' cannot be found. Only these "
            f"columns can be used: {', '.join(sorted(columns))}"
        )


class TBConfigXUniqueConstraint(Exception):
    """A copy-over target x-column was already claimed by another mapping."""

    def __init__(self, column, config_dict):
        super().__init__(f"Column '{column}' already exists in {config_dict} values.")


class TBConfigOverwriteError(Exception):
    """Copy-over would overwrite an existing x-column without allow_overwrite."""

    def __init__(self, column):
        super().__init__(
            f"'{column}' already exist. Set allow_overwrite==True to allow for overwriting."
        )


class TBConfigScorerNotFound(Exception):
    """Scorer name not present in the scorer registry."""

    def __init__(self, scorer, scorers):
        super().__init__(
            f"Scorer name: '{scorer}' is not found in scorers. "
            f"Only select from the following scorers: {', '.join(sorted(scorers))}"
        )


class TBConfigColumnToMatchLock(Exception):
    """Attempt to delete per-column config while the column is still matched."""

    def __init__(self, column):
        super().__init__(
            f"x_column:{column} is a column to be matched. Please remove it "
            f"from ColumnsToMatch first."
        )
