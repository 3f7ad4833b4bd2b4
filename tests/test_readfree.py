"""Regression guard: the steady-state SLAM loop performs ZERO
device->host value reads.

On the axon TPU relay a single read permanently degrades the session
~1000x (PERF_NOTES.md), and the subtlest source is a jit that closure-
captures a concrete device array — lowering then reads it back to embed
it as an HLO constant (the round-2 `_BIG = jnp.int32(...)` bug). This
test runs the full per-frame pipeline (fused frontend, fused BA
iterations, scheme-end tasks, trajectory deformation, loop-detector
feature path) with every to-host conversion instrumented to raise.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from badslam_tpu import synthetic as syn
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.frontend import BadSlam

from bench import _InMemoryVideo, _render_frames


class _ReadbackError(AssertionError):
    pass


@pytest.fixture
def forbid_readbacks(monkeypatch):
    """Make any device->host value read raise.

    Catches: float()/int()/.item()/.tolist() (via ArrayImpl._value),
    closure-captured device constants at lowering time (also _value), and
    library calls of np.asarray/np.array on jax arrays (wrapped)."""
    from jax._src import array as jarray

    impl = jarray.ArrayImpl

    def poisoned_value(self):
        raise _ReadbackError(
            f"device->host value read of {self.shape} array in the "
            "steady-state loop (PERF_NOTES.md)"
        )

    monkeypatch.setattr(impl, "_value", property(poisoned_value))

    orig_asarray = np.asarray
    orig_array = np.array

    def guard_asarray(a, *args, **kwargs):
        if isinstance(a, jax.Array):
            raise _ReadbackError("np.asarray on a device array")
        return orig_asarray(a, *args, **kwargs)

    def guard_array(a, *args, **kwargs):
        if isinstance(a, jax.Array):
            raise _ReadbackError("np.array on a device array")
        return orig_array(a, *args, **kwargs)

    monkeypatch.setattr(np, "asarray", guard_asarray)
    monkeypatch.setattr(np, "array", guard_array)
    yield


@pytest.mark.slow
def test_steady_loop_is_readback_free(forbid_readbacks, monkeypatch):
    # Emulate the axon relay's gating: the opt-in sync_* reads must stay
    # off, and everything that remains must be read-free.
    from badslam_tpu.ba import scheme

    monkeypatch.setattr(scheme, "_backend_tolerates_readbacks",
                        lambda: False)
    cfg = BadSlamConfig(
        num_scales=4,
        keyframe_interval=5,
        max_num_ba_iterations_per_keyframe=4,
        max_surfel_count=1 << 13,
        tracking_max_iterations=8,
        enable_loop_detection=True,
    )
    rng = np.random.default_rng(3)
    cam = syn.default_camera(96, 80)
    scene = syn.random_plane_scene(rng, 3)
    gt = syn.smooth_trajectory(16, scale=0.002)
    video = _InMemoryVideo(cam, *_render_frames(cam, scene, gt,
                                                cfg.raw_to_float_depth))

    slam = BadSlam(cfg, video)
    for i in range(len(video)):
        slam.process_frame(i)
    # Sync only (block_until_ready is NOT a value read and must pass).
    jax.block_until_ready(slam.traj_q)


def test_chunked_loop_is_readback_free(forbid_readbacks, monkeypatch):
    """The fused steady-chunk path (lax.scan over the between-keyframes
    frames + per-chunk parallel-BA drain) must be read-free too."""
    from badslam_tpu.ba import scheme

    monkeypatch.setattr(scheme, "_backend_tolerates_readbacks",
                        lambda: False)
    cfg = BadSlamConfig(
        num_scales=4,
        keyframe_interval=5,
        max_num_ba_iterations_per_keyframe=4,
        max_surfel_count=1 << 13,
        tracking_max_iterations=8,
        enable_loop_detection=True,
        fps_restriction=0,  # pacing off -> chunking active
    )
    rng = np.random.default_rng(3)
    cam = syn.default_camera(96, 80)
    scene = syn.random_plane_scene(rng, 3)
    gt = syn.smooth_trajectory(16, scale=0.002)
    video = _InMemoryVideo(cam, *_render_frames(cam, scene, gt,
                                                cfg.raw_to_float_depth))
    slam = BadSlam(cfg, video)
    slam.process_frames(0, len(video))
    assert slam.chunks_processed >= 2
    jax.block_until_ready(slam.traj_q)


def test_forbid_readbacks_fixture_actually_fires(forbid_readbacks):
    import jax.numpy as jnp

    x = jnp.ones((3,))
    with pytest.raises(AssertionError):
        float(x[0])
    with pytest.raises(AssertionError):
        np.asarray(x)


@pytest.mark.slow
def test_loop_closure_application_is_readback_free(forbid_readbacks,
                                                   monkeypatch):
    """The closure path (refinement + gates + device pose graph +
    deformation) must not read device values either — closures happen
    MID-RUN, and one read permanently degrades the axon session
    (the round-3 long-bench hang: np.array(ks.q) on a verified organic
    candidate)."""
    from badslam_tpu.ba import scheme
    from badslam_tpu.geometry import se3_np as s3

    monkeypatch.setattr(scheme, "_backend_tolerates_readbacks",
                        lambda: False)
    cfg = BadSlamConfig(
        num_scales=3,
        keyframe_interval=4,
        max_num_ba_iterations_per_keyframe=2,
        max_surfel_count=1 << 13,
        tracking_max_iterations=8,
        enable_loop_detection=True,
        parallel_loop_detection=False,
    )
    rng = np.random.default_rng(4)
    cam = syn.default_camera(96, 80)
    scene = syn.random_plane_scene(rng, 3)
    gt = syn.smooth_trajectory(13, scale=0.002)
    video = _InMemoryVideo(cam, *_render_frames(cam, scene, gt,
                                                cfg.raw_to_float_depth))
    slam = BadSlam(cfg, video)
    for i in range(len(video)):
        slam.process_frame(i)

    # Force a closure attempt against an early keyframe with a host-side
    # initial alignment (the detector's own data path) — every device
    # interaction downstream must be read-free.
    order = slam.direct_ba.keyframes.live_slots_in_time_order()
    assert len(order) >= 3
    slam._attempt_loop_closure(
        order[-1], order[0],
        s3.SE3(np.r_[1.0, 0, 0, 0], np.zeros(3)))
    jax.block_until_ready(slam.traj_q)
