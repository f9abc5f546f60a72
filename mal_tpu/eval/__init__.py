from mal_tpu.eval.metrics import compute_depth_errors, EVAL_CROPS  # noqa: F401
from mal_tpu.eval.evaluate import evaluate_depth_maps, prepare_gt_and_pred  # noqa: F401
