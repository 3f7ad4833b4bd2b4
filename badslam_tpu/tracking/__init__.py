from badslam_tpu.tracking.pairwise import (  # noqa: F401
    TrackingResult,
    accumulate_pose_coeffs,
    compute_cost_and_count,
    track_frame_pairwise,
)
