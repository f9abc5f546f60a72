from mal_tpu.dualref.solvers import anderson_solver, broyden_solver, phantom_grad  # noqa: F401
from mal_tpu.dualref.model import DEQDepthPose  # noqa: F401
