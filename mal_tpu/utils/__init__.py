from mal_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint  # noqa: F401
from mal_tpu.utils.misc import readlines, sec_to_hm_str  # noqa: F401
from mal_tpu.utils.logging import console_sink, jsonl_sink, multi_sink  # noqa: F401
from mal_tpu.utils.profiling import time_fn, trace, ExamplesPerSec  # noqa: F401
from mal_tpu.utils.vis import colormap_plasma, sobel, normalize_image  # noqa: F401
