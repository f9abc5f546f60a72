from mal_tpu.segment.instances import Instances  # noqa: F401
from mal_tpu.segment.matcher import hungarian_match, match_instances  # noqa: F401
