from badslam_tpu.utils.timing import Timing, timed  # noqa: F401
