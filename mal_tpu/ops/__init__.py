from mal_tpu.ops.interp import grid_sample, resize_bilinear, resize_nearest, upsample2x_nearest  # noqa: F401
from mal_tpu.ops.ssim import ssim  # noqa: F401
from mal_tpu.ops.cost_volume import (  # noqa: F401
    compute_depth_bins,
    plane_sweep_cost_volume,
    confidence_mask_from_cost,
    indices_to_disparity,
)
from mal_tpu.ops.warp import forward_splat_depth, zbuffer_scatter_max  # noqa: F401
