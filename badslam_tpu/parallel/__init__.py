from badslam_tpu.parallel.sharded import (  # noqa: F401
    AXIS,
    estimate_pose_sharded,
    make_mesh,
    optimize_geometry_plane_streamed,
    optimize_geometry_sharded,
    optimize_keyframe_poses_sharded,
)
