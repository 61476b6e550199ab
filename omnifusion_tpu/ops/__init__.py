from omnifusion_tpu.ops.sparse_blend import gather_blend, quad_gather_blend
from omnifusion_tpu.ops.splatting import splat, render, depth_distance_weights
from omnifusion_tpu.ops.depth2normal import normals_cross, normals_plane_fit, depth_to_points
from omnifusion_tpu.ops.gradients import dI_du, dI_dv, dI_duv, imgrad, imgrad_yx
from omnifusion_tpu.ops.pano_stretch import pano_stretch
from omnifusion_tpu.ops.dibr import dibr_vertical, dibr_horizontal
from omnifusion_tpu.ops import derivatives

__all__ = [
    "gather_blend",
    "quad_gather_blend",
    "splat",
    "render",
    "depth_distance_weights",
    "normals_cross",
    "normals_plane_fit",
    "depth_to_points",
    "dI_du",
    "dI_dv",
    "dI_duv",
    "imgrad",
    "imgrad_yx",
    "pano_stretch",
    "dibr_vertical",
    "dibr_horizontal",
    "derivatives",
]
