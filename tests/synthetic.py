"""Shim: the synthetic-scene fixtures live in the package now (they are
also used by bench.py and __graft_entry__.py)."""

from badslam_tpu.synthetic import *  # noqa: F401,F403
from badslam_tpu.synthetic import (  # noqa: F401
    PlaneScene, default_camera, random_plane_scene, intensity_at,
    render_scene, pose, frame_from_render,
)
