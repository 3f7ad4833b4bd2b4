from badslam_tpu.ops import preprocess, pyramid, robust  # noqa: F401
