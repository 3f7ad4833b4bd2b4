from badslam_tpu.ba.geometry_opt import (  # noqa: F401
    optimize_geometry_iteration,
    update_surfel_normals,
)
from badslam_tpu.ba.pose_opt import (  # noqa: F401
    PoseOptResult,
    optimize_keyframe_poses,
    surfel_pose_coeffs,
)
from badslam_tpu.ba.scheme import DirectBA  # noqa: F401
