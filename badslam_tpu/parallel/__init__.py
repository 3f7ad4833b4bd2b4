from badslam_tpu.parallel.sharded import (  # noqa: F401
    AXIS,
    estimate_pose_sharded,
    make_mesh,
    optimize_geometry_plane_streamed,
    optimize_geometry_sharded,
    optimize_keyframe_poses_sharded,
)
from badslam_tpu.parallel.streamed import (  # noqa: F401
    activation_geometry_streamed,
    compact_surfels_streamed,
    create_surfels_streamed,
    delete_surfels_streamed,
    merge_surfels_streamed,
    optimize_poses_streamed,
)
