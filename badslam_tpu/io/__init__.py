from badslam_tpu.io.dataset import (  # noqa: F401
    RGBDVideo,
    load_tum_dataset,
    load_tum_trajectory,
    save_tum_trajectory,
)
from badslam_tpu.io.ply import load_ply, save_ply  # noqa: F401
