"""badslam_tpu — a TPU-native (JAX/XLA/Pallas) direct RGB-D SLAM framework.

A from-scratch rebuild of the capabilities of BAD SLAM (Schöps, Sattler,
Pollefeys, CVPR 2019; reference C++/CUDA implementation ETH3D/badslam):
a direct RGB-D odometry front-end plus a surfel-map direct bundle-adjustment
back-end, re-designed for TPU hardware:

  * All per-pixel / per-surfel compute runs as fused XLA programs (with
    Pallas kernels for the hottest reductions), batched over keyframes
    instead of the reference's one-CUDA-launch-per-keyframe host loops.
  * Gauss-Newton inner loops (tracking, per-keyframe pose opt) run fully
    inside jit via lax.while_loop with on-device 6x6 solves — no
    per-iteration host round trips.
  * Dynamic surfel/keyframe counts are handled with static capacities +
    validity masks (power-of-two bucketing avoids recompiles).
  * Reductions are deterministic (no atomics), so tests can use tight
    tolerances.
"""

__version__ = "0.1.0"

from badslam_tpu.config import BadSlamConfig  # noqa: F401
