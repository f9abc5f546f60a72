from mal_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint  # noqa: F401
from mal_tpu.utils.misc import readlines, sec_to_hm_str  # noqa: F401
