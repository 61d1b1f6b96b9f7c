from bundleadjustment_tpu.solvers.residuals import (
    CHI2_2D,
    BAProblem,
    huber_weights,
    reprojection_residuals,
    residuals_and_jacobians,
)
from bundleadjustment_tpu.solvers.lm import (
    LMConfig,
    ba_solve,
    motion_only_ba,
)

__all__ = [
    "CHI2_2D",
    "BAProblem",
    "huber_weights",
    "reprojection_residuals",
    "residuals_and_jacobians",
    "LMConfig",
    "ba_solve",
    "motion_only_ba",
]
