from record_matcher_ray.core.config import MatchConfig, MatchConfigBuilder  # noqa: F401
from record_matcher_ray.core.kernel import MATCH_STATUS, score_block  # noqa: F401
