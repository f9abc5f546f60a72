from mal_tpu.ops.pallas.cost_volume_kernel import (  # noqa: F401
    plane_sweep_diffs_pallas,
    plane_sweep_cost_volume_pallas,
)
