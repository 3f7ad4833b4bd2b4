#!/usr/bin/env python
"""Run ONE candidate op in a fresh process and report the relay floor
before/after — bisects which construct trips the axon relay into its
permanent sync-fallback mode (PERF_NOTES.md).

    python tools/probe_op.py <op>

Ops: occupied | candidates | scatter_append | create_single | scan_cond |
     compact | create_batched | assoc
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> int:
    op = sys.argv[1]

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/badslam_tpu/xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.geometry import se3
    from badslam_tpu.mapping import surfels as sf
    from badslam_tpu.mapping.keyframes import KeyframeStack
    from badslam_tpu.ops.preprocess import preprocess_frame

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(tiny(x))

    def floor(tag):
        t0 = time.perf_counter()
        for _ in range(10):
            jax.block_until_ready(tiny(x))
        dt = (time.perf_counter() - t0) / 10
        print(f"floor {tag:<8} {1e3 * dt:8.2f} ms", flush=True)

    cfg = BadSlamConfig()
    cam = syn.default_camera(640, 480)
    scene = syn.random_plane_scene(np.random.default_rng(0), 3)
    depth_np, inten_np = syn.render_scene(cam, scene, syn.identity_pose())
    g = np.clip(inten_np * 255, 0, 255).astype(np.uint8)
    frame = preprocess_frame(cam, jnp.array(depth_np),
                             jnp.array(np.stack([g, g, g], -1)),
                             max_depth=cfg.max_depth)
    smap = sf.empty_map(1 << 17)
    q0 = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t0v = jnp.zeros((3,), jnp.float32)
    k = 8
    kstack = KeyframeStack(
        depth=jnp.tile(frame.depth[None], (k, 1, 1)),
        nx=jnp.tile(frame.nx[None], (k, 1, 1)),
        ny=jnp.tile(frame.ny[None], (k, 1, 1)),
        radius2=jnp.tile(frame.radius2[None], (k, 1, 1)),
        intensity=jnp.tile(frame.intensity[None], (k, 1, 1)),
        q=jnp.tile(q0[None], (k, 1)),
        t=jnp.tile(t0v[None], (k, 1)),
        mask=jnp.ones((k,), jnp.bool_).at[1:].set(False),
    )
    jax.block_until_ready(kstack.depth)
    floor("setup")

    if op == "assoc":
        from badslam_tpu.mapping.association import (
            associate_surfels_with_frame)
        fn = jax.jit(lambda: associate_surfels_with_frame(
            cam, smap.pos, smap.normal, smap.valid, q0, t0v,
            frame.depth, frame.nx, frame.ny, cfg.baseline_fx).valid)
        jax.block_until_ready(fn())

    elif op == "occupied":
        fn = jax.jit(lambda: sf.occupied_cells(
            smap, cam, q0, t0v, frame.depth, frame.nx, frame.ny,
            cfg.baseline_fx, 4))
        jax.block_until_ready(fn())

    elif op == "scatter_append":
        @jax.jit
        def fn(m):
            keep = m.valid | True
            order = jnp.cumsum(keep.astype(jnp.int32)) - 1
            dest = m.count + order
            ok = keep & (dest < m.capacity)
            dest_safe = jnp.where(ok, dest, m.capacity - 1)
            pos = m.pos.at[dest_safe].set(
                jnp.where(ok[:, None], m.pos + 1.0, m.pos[dest_safe]))
            return pos
        jax.block_until_ready(fn(smap))

    elif op == "create_single":
        new_map, created = sf.create_surfels_for_keyframe(
            smap, cam, q0, t0v, frame.depth, frame.nx, frame.ny,
            frame.radius2, frame.intensity,
            covis=kstack, min_observation_count=jnp.int32(1),
            baseline_fx=cfg.baseline_fx, cell_size=4,
            filter_new_surfels=True)
        jax.block_until_ready(new_map.pos)

    elif op == "create_batched":
        mask = jnp.ones((k,), jnp.bool_).at[1:].set(False)
        covis = jnp.ones((k, k), jnp.bool_)
        new_map, created = sf.create_surfels_for_keyframes(
            smap, cam, kstack, jnp.tile(frame.radius2[None], (k, 1, 1)),
            mask, covis, jnp.int32(1), baseline_fx=cfg.baseline_fx,
            cell_size=4)
        jax.block_until_ready(new_map.pos)

    elif op == "scan_cond":
        @jax.jit
        def fn(m):
            def body(m_, idx):
                def run(m_):
                    return m_._replace(pos=m_.pos + 1.0)
                return jax.lax.cond(idx == 0, run, lambda a: a, m_), None
            m, _ = jax.lax.scan(body, m, jnp.arange(k, dtype=jnp.int32))
            return m.pos
        jax.block_until_ready(fn(smap))

    elif op == "compact":
        new_map = sf.compact_surfels(smap)
        jax.block_until_ready(new_map.pos)

    else:
        raise SystemExit(f"unknown op {op}")

    floor("after-op")
    return 0


if __name__ == "__main__":
    sys.exit(main())
