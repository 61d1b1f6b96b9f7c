from bundleadjustment_tpu.metrics.ate import align_horn_scale, ate_rmse, evaluate_ate
from bundleadjustment_tpu.metrics.reconstruction import icp_align, reconstruction_error

__all__ = [
    "align_horn_scale",
    "ate_rmse",
    "evaluate_ate",
    "icp_align",
    "reconstruction_error",
]
