"""Property tests for surfel map maintenance ops (creation counts/dedup,
merge, delete, compaction, activation) — SURVEY.md section 7 stage 4."""

import jax.numpy as jnp
import numpy as np

from badslam_tpu.ba.scheme import DirectBA
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.mapping import surfels as sf

import fixtures
import synthetic

CAP = 1 << 14


def build(rng, **kw):
    cam = synthetic.default_camera(160, 120)
    scene = synthetic.random_plane_scene(rng, 3)
    cfg = BadSlamConfig(max_surfel_count=CAP, **kw)
    ba = DirectBA(cam, cfg, surfel_capacity=CAP)
    return cam, scene, ba


def add_kf(ba, cam, scene, pose, idx):
    d, i = synthetic.render_scene(cam, scene, pose)
    return ba.add_keyframe(fixtures.frame_from_render(cam, d, i), pose, idx)


def test_creation_respects_sparsification_grid():
    rng = np.random.default_rng(21)
    cam, scene, ba = build(rng)
    kf0 = add_kf(ba, cam, scene, se3.identity(), 0)
    created = int(ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False))
    # At most one surfel per 4x4 cell.
    assert created <= (120 // 4) * (160 // 4)
    assert created > 0.5 * (120 // 4) * (160 // 4)
    # Count matches the valid mask.
    assert int(ba.surfels.count) == int(jnp.sum(ba.surfels.valid)) == created


def test_creation_is_deduplicated_by_supporting_surfels():
    rng = np.random.default_rng(22)
    cam, scene, ba = build(rng)
    kf0 = add_kf(ba, cam, scene, se3.identity(), 0)
    first = int(ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False))
    # Re-running creation for the same keyframe creates ~nothing new.
    second = int(ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False))
    assert second < 0.02 * first, (first, second)


def test_observation_filter_rejects_unobserved():
    rng = np.random.default_rng(23)
    cam, scene, ba = build(rng, min_observation_count_while_bootstrapping_2=2)
    kf0 = add_kf(ba, cam, scene, se3.identity(), 0)
    # Second keyframe far away, looking elsewhere: no covisibility.
    far = se3.mul(
        synthetic.pose(tx=50.0),
        se3.exp(jnp.array([0, 0, 0, 0.0, np.pi, 0.0], jnp.float32)),
    )
    add_kf(ba, cam, scene, far, 1)
    assert not bool(ba.keyframes.covis[kf0, 1])
    # With 2 keyframes, min_observation_count=2, but kf0 has no covisible
    # keyframes: the filter rejects everything (observations = 1 self only).
    created = int(ba.create_surfels_for_keyframe(kf0, filter_new_surfels=True))
    assert created == 0


def test_observation_filter_accepts_covisible():
    rng = np.random.default_rng(24)
    cam, scene, ba = build(rng)
    kf0 = add_kf(ba, cam, scene, se3.identity(), 0)
    add_kf(ba, cam, scene, synthetic.pose(tx=0.02), 1)
    assert bool(ba.keyframes.covis[kf0, 1])
    created = int(ba.create_surfels_for_keyframe(kf0, filter_new_surfels=True))
    assert created > 500


def test_merge_removes_duplicates():
    rng = np.random.default_rng(25)
    cam, scene, ba = build(rng)
    kf0 = add_kf(ba, cam, scene, se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    n1 = ba.surfel_count

    # Duplicate the map by re-creating with the supporting-surfel gate
    # bypassed: shift all surfels' stored validity off, create, then restore.
    saved = ba.surfels
    # Hide the existing surfels (but keep `count` so the new copy appends
    # after them), create a duplicate set, then stitch both sets valid.
    ba.surfels = ba.surfels._replace(valid=jnp.zeros_like(ba.surfels.valid))
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    dup = ba.surfels
    ba.surfels = dup._replace(valid=dup.valid | saved.valid)
    assert int(ba.surfels.count) == 2 * n1

    ba._merge_surfels_masked(ba.keyframes.mask_for_ids([kf0]))
    # Exactly the duplicates are merged away.
    assert int(ba.surfels.count) == n1


def test_compaction_preserves_surfels():
    rng = np.random.default_rng(26)
    cam, scene, ba = build(rng)
    kf0 = add_kf(ba, cam, scene, se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    m = ba.surfels
    # Invalidate a random third.
    kill = jnp.array(rng.uniform(size=(m.capacity,)) < 0.33) & m.valid
    m = m._replace(valid=m.valid & ~kill,
                   count=m.count - jnp.sum(kill.astype(jnp.int32)))
    before = np.asarray(m.pos)[np.asarray(m.valid)]
    compacted = sf.compact_surfels(m)
    count = int(compacted.count)
    v = np.asarray(compacted.valid)
    assert v[:count].all() and not v[count:].any()
    after = np.asarray(compacted.pos)[:count]
    # Same set of surfels (order-preserving compaction).
    np.testing.assert_allclose(after, before)


def test_deletion_of_unobserved_surfels():
    rng = np.random.default_rng(27)
    cam, scene, ba = build(rng)
    kf0 = add_kf(ba, cam, scene, se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    n = ba.surfel_count
    # Add phantom surfels floating far off any surface.
    m = ba.surfels
    phantom = jnp.arange(m.capacity) >= m.capacity - 64
    m = m._replace(
        pos=jnp.where(phantom[:, None], 100.0, m.pos),
        normal=jnp.where(
            phantom[:, None], jnp.array([0.0, 0.0, -1.0]), m.normal
        ),
        valid=m.valid | phantom,
        count=m.count + 64,
    )
    ba.surfels = m
    kstack = ba.keyframes.stack([kf0])
    ba.surfels = sf.delete_surfels_and_update_radii(
        ba.surfels, cam, kstack, jnp.int32(1), baseline_fx=40.0
    )
    # Phantoms deleted (0 observations), real surfels survive.
    assert int(ba.surfels.count) == n
    assert not bool(jnp.any(ba.surfels.valid & phantom))


def test_activation_follows_observing_keyframes():
    rng = np.random.default_rng(28)
    cam, scene, ba = build(rng)
    kf0 = add_kf(ba, cam, scene, se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    m = ba.surfels._replace(active=jnp.zeros_like(ba.surfels.active))
    m2 = sf.update_surfel_activation(m, cam, ba.keyframes.stack([kf0]), 40.0)
    frac = float(jnp.sum(m2.active) / jnp.maximum(1, jnp.sum(m2.valid)))
    assert frac > 0.95
