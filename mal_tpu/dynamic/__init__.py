from mal_tpu.dynamic.warp import forward_warp, inverse_warp, splat_depth  # noqa: F401
from mal_tpu.dynamic.cost_volume import occlusion_aware_cost_volume  # noqa: F401
from mal_tpu.dynamic.domd import domd_warp_inputs  # noqa: F401
from mal_tpu.dynamic.model import DynDepthModel, doj_metrics  # noqa: F401
from mal_tpu.dynamic.step import make_dynamic_train_step  # noqa: F401
