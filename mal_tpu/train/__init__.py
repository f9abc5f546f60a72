from mal_tpu.train.lr_schedule import warmup_step_schedule  # noqa: F401
from mal_tpu.train.state import TrainState, DepthBinTracker, create_train_state  # noqa: F401
from mal_tpu.train.step import train_step, make_train_step  # noqa: F401
