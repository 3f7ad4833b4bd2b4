from badslam_tpu.loop.detector import LoopDetector  # noqa: F401
from badslam_tpu.loop.pose_graph import optimize_pose_graph  # noqa: F401
from badslam_tpu.loop.trajectory import (  # noqa: F401
    extrapolate_and_interpolate_keyframe_pose_changes,
)
