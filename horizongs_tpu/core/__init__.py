from horizongs_tpu.core.cameras import (
    Camera,
    focal_to_fov,
    fov_to_focal,
    make_camera,
    projection_matrix,
    world_to_view,
)
from horizongs_tpu.core.transforms import (
    quat_to_rotmat,
    build_covariance,
    normalize_quat,
)
from horizongs_tpu.core.sh import eval_sh, rgb_to_sh, sh_to_rgb, num_sh_bases
