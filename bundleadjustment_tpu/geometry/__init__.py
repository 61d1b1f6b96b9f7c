from bundleadjustment_tpu.geometry.se3 import (
    aa_to_rotmat,
    rotmat_to_aa,
    rt6_apply,
    rt6_compose,
    rt6_from_mat44,
    rt6_identity,
    rt6_inverse,
    rt6_to_mat44,
    skew,
)
from bundleadjustment_tpu.geometry.projection import (
    backproject,
    make_intrinsics,
    project,
    project_rt,
)
from bundleadjustment_tpu.geometry.triangulation import (
    triangulate_dlt,
    triangulate_gated,
)

__all__ = [
    "aa_to_rotmat",
    "rotmat_to_aa",
    "rt6_apply",
    "rt6_compose",
    "rt6_from_mat44",
    "rt6_identity",
    "rt6_inverse",
    "rt6_to_mat44",
    "skew",
    "backproject",
    "make_intrinsics",
    "project",
    "project_rt",
    "triangulate_dlt",
    "triangulate_gated",
]
