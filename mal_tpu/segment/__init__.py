from mal_tpu.segment.criterion import (CriterionConfig,  # noqa: F401
                                       set_criterion, set_criterion_deep)
from mal_tpu.segment.instances import Instances  # noqa: F401
from mal_tpu.segment.matcher import hungarian_match, match_instances  # noqa: F401
