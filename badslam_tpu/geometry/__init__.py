from badslam_tpu.geometry import se3  # noqa: F401
from badslam_tpu.geometry.camera import PinholeCamera, pixel_grid, unproject_map  # noqa: F401
from badslam_tpu.geometry.se3 import SE3  # noqa: F401
