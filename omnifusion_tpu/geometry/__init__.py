from omnifusion_tpu.geometry.layout import PATCH_LAYOUTS, num_patches, patch_centers
from omnifusion_tpu.geometry import sphere, gnomonic

__all__ = ["PATCH_LAYOUTS", "num_patches", "patch_centers", "sphere", "gnomonic"]
