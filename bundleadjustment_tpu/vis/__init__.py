from bundleadjustment_tpu.vis.mesh import (
    camera_frustum_glyph,
    create_map_mesh,
    write_off,
    write_ply,
)
from bundleadjustment_tpu.vis.pointcloud import (
    backproject_depth,
    depth_normals,
)

__all__ = [
    "camera_frustum_glyph",
    "create_map_mesh",
    "write_off",
    "write_ply",
    "backproject_depth",
    "depth_normals",
]
