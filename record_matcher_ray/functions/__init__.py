from record_matcher_ray.functions.scorers import (  # noqa: F401
    SCORERS,
    DEFAULT_SCORER,
    Scorer,
    get_scorer,
    register_scorer,
)
