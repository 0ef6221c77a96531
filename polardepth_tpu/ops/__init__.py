"""Pure-jnp physics & geometry kernels (with Pallas variants for hot chains).

Everything in this package is functional, shape-static, and jit-safe: no host
round-trips, no data-dependent Python control flow. These ops are the device-
side replacements for the reference's host-side numpy/scipy physics
(polarisation/xolp.py, manydepth/normals_vec.py) and its torch geometry/loss
layers (manydepth/layers.py).
"""

from polardepth_tpu.ops.xolp import xolp_from_pol, iun_and_xolp
from polardepth_tpu.ops.fresnel import (
    FresnelLUT, theta_diffuse, theta_specular, spherical_normals,
    normal_priors_from_xolp,
)
from polardepth_tpu.ops.depth import disp_to_depth, depth_to_disp
from polardepth_tpu.ops.metrics import compute_depth_errors
from polardepth_tpu.ops.se3 import (
    transformation_from_parameters, rot_from_axisangle, get_translation_matrix,
)
from polardepth_tpu.ops.resize import resize_bilinear, resize_nearest, upsample2x
from polardepth_tpu.ops.warp import grid_sample
from polardepth_tpu.ops.camera import backproject_depth, project_3d, warp_depth
from polardepth_tpu.ops.normals import depth_to_normals, spatial_gradient_sobel
from polardepth_tpu.ops.losses import (
    masked_l1_depth_loss, supervised_normals_loss, smooth_loss, ssim,
    reprojection_loss, berhu_loss,
)
