"""Measure BA-iteration time vs keyframe CAPACITY at fixed live count.

Round-2 verdict #2 evidence: with the keyframe-bucketed fused BA program
(scheme._ba_iterations_bucketed) the per-iteration cost must stay flat as
dead/unopened slots grow, instead of scaling with the store capacity.

Usage: python tools/probe_kf_bucket.py [--tpu]
(defaults to the CPU backend; --tpu times on the real chip with host
clocks + block_until_ready, no device reads).
"""

import os
import sys
import time

sys.path[:0] = [os.path.join(os.path.dirname(__file__), ".."),
                os.path.join(os.path.dirname(__file__), "..", "tests")]

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
# TPU-only guarded cache (utils/cache.py): never set the config keys
# directly — XLA:CPU executable (de)serialization crashes on this VM pool.
from badslam_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(min_compile_secs=2.0)

import numpy as np

from badslam_tpu.ba.scheme import DirectBA
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3

import fixtures
import synthetic


def build(capacity: int, live: int, bucketed: bool):
    rng = np.random.default_rng(5)
    cam = synthetic.default_camera(160, 120)
    scene = synthetic.random_plane_scene(rng, 3)
    cfg = BadSlamConfig(max_surfel_count=1 << 15)
    ba = DirectBA(cam, cfg, surfel_capacity=1 << 15)
    if not bucketed:
        ba._keyframe_bucket = lambda: None  # force the full-capacity path
    ba.keyframes._ensure_capacity(capacity)
    for i in range(live):
        pose = synthetic.pose(tx=0.004 * i, ry=0.002 * i)
        d, inten = synthetic.render_scene(cam, scene, pose)
        ba.add_keyframe(fixtures.frame_from_render(cam, d, inten), pose, i)
        if i == 0:
            ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
    return ba


def time_ba(ba, reps=5) -> float:
    ba.bundle_adjustment(max_iterations=1)   # compile + warm
    jax.block_until_ready(ba.keyframes.q)
    t0 = time.perf_counter()
    for _ in range(reps):
        ba.bundle_adjustment(max_iterations=1)
    jax.block_until_ready(ba.keyframes.q)
    return 1e3 * (time.perf_counter() - t0) / reps


def main():
    live = 6
    print(f"live keyframes fixed at {live}; one BA iteration, ms "
          f"(backend={jax.default_backend()})")
    print(f"{'capacity':>9} {'full[ms]':>10} {'bucketed[ms]':>13}")
    for capacity in (8, 32, 128):
        full = time_ba(build(capacity, live, bucketed=False))
        buck = time_ba(build(capacity, live, bucketed=True))
        print(f"{capacity:>9} {full:>10.1f} {buck:>13.1f}")


if __name__ == "__main__":
    main()
