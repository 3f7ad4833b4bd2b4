#!/usr/bin/env python
"""Relay-behavior probes, consolidated (round-4 verdict weak #8).

One process per probe: both failure modes under investigation are
per-process state (the ~1000x post-read sync fallback and the one-time
first-read session flush, PERF_NOTES.md). Every result cited in
PERF_NOTES.md was produced by the standalone ancestors of these
subcommands; the mapping is recorded there (round-5 note) and below:

    python tools/probe.py op <name>         # was tools/probe_op.py
    python tools/probe.py op2 <name>        # was tools/probe_op2.py
    python tools/probe.py op3 <name>        # was tools/probe_op3.py
    python tools/probe.py op4 <name>        # was tools/probe_op4.py
    python tools/probe.py op5 <name>        # was tools/probe_op5.py
    python tools/probe.py wedge <stage>     # was tools/probe_wedge.py
    python tools/probe.py wedge-slam <n> [flags]   # probe_wedge_slam.py
    python tools/probe.py read-back         # was tools/probe_readback.py
    python tools/probe.py read-first        # was tools/probe_read_first.py
    python tools/probe.py read-lore         # was tools/probe_read_lore.py

op    — run ONE candidate op, report the relay floor before/after
        (bisects what trips the permanent sync-fallback):
        occupied | candidates* | scatter_append | create_single |
        scan_cond | compact | create_batched | assoc
op2   — association fine-grain: gather_flat | gather_2d | math_only |
        proj_gather
op3   — association build-up: assoc_small | assoc_big | assoc_few_out |
        assoc_no_rot | g3
op4   — trigger discrimination: realimg_hardcam | zeroimg_realcam |
        realimg_realcam | sum_consume
op5   — final bisect: real | noquat | quatonly
wedge — one synthetic post-run D2H trigger then a sentinel read:
        control | canary | scan | donate | while | upload120
wedge-slam — the real QVGA long-run cut at n frames, then ONE sentinel
        read; flags: nochunk noba smallmap delslam readtwice cbread
read-back  — step-time before/after one scalar read (degradation check)
read-first — does a t=0 read pre-pay the first-read session sync?
read-lore  — canary timings around reads (the 1000x lore re-check)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]

W, H = 320, 240  # wedge-slam raster
FRAMES = int(os.environ.get("PROBE_FRAMES", 120))


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------


def timed_read(x, timeout_s: float = 60.0):
    """(value, seconds) or raises TimeoutError; daemon thread because the
    hang is un-interruptible in C land (SIGALRM never fires)."""
    import jax

    box = {}

    def _do():
        try:
            jax.block_until_ready(x)
            box["v"] = np.asarray(x)
        except Exception as e:  # pragma: no cover
            box["e"] = e

    t0 = time.perf_counter()
    th = threading.Thread(target=_do, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        raise TimeoutError(f"read hung > {timeout_s:.0f}s")
    if "e" in box:
        raise box["e"]
    return box["v"], time.perf_counter() - t0


def _floor_fn():
    """Relay floor: mean block-synced time of a tiny warm program."""
    import jax
    import jax.numpy as jnp

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

    return floor


def _vga_fixture():
    """(cfg, cam, frame, smap, kstack, q0, t0v): the shared VGA op fixture."""
    import jax
    import jax.numpy as jnp

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.mapping import surfels as sf
    from badslam_tpu.mapping.keyframes import KeyframeStack
    from badslam_tpu.ops.preprocess import preprocess_frame

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
    return cfg, cam, frame, smap, kstack, q0, t0v


# ---------------------------------------------------------------------------
# op: one candidate SLAM op per process, relay floor before/after
# ---------------------------------------------------------------------------


def cmd_op(op: str) -> int:
    import jax
    import jax.numpy as jnp

    from badslam_tpu.mapping import surfels as sf

    floor = _floor_fn()
    cfg, cam, frame, smap, kstack, q0, t0v = _vga_fixture()
    k = 8
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
        new_map, _ = sf.create_surfels_for_keyframe(
            smap, cam, q0, t0v, frame.depth, frame.nx, frame.ny,
            frame.radius2, frame.intensity,
            covis=kstack, min_observation_count=jnp.int32(1),
            baseline_fx=cfg.baseline_fx, cell_size=4,
            filter_new_surfels=True)
        jax.block_until_ready(new_map.pos)

    elif op == "create_batched":
        mask = jnp.ones((k,), jnp.bool_).at[1:].set(False)
        covis = jnp.ones((k, k), jnp.bool_)
        new_map, _ = sf.create_surfels_for_keyframes(
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


# ---------------------------------------------------------------------------
# op2: association fine-grain bisect (gathers vs math)
# ---------------------------------------------------------------------------


def cmd_op2(op: str) -> int:
    import jax
    import jax.numpy as jnp

    floor = _floor_fn()
    h, w, n = 480, 640, 1 << 17
    img = jnp.zeros((h, w), jnp.float32)
    px = jnp.zeros((n,), jnp.int32)
    py = jnp.zeros((n,), jnp.int32)
    pos = jnp.zeros((n, 3), jnp.float32)
    jax.block_until_ready((img, px, py, pos))
    floor("setup")

    if op == "gather_flat":
        fn = jax.jit(lambda img, px, py: jnp.take(
            img.reshape(-1), (py * w + px).reshape(-1), axis=0))
        jax.block_until_ready(fn(img, px, py))

    elif op == "gather_2d":
        fn = jax.jit(lambda img, px, py: img[py, px])
        jax.block_until_ready(fn(img, px, py))

    elif op == "math_only":
        @jax.jit
        def fn(pos):
            lx, ly, lz = pos[..., 0], pos[..., 1], pos[..., 2]
            proj = lz > 0
            safe_z = jnp.where(proj, lz, 1.0)
            pxy_x = 500.0 * lx / safe_z + 320.0
            pxy_y = 500.0 * ly / safe_z + 240.0
            pxf = jnp.floor(pxy_x)
            pyf = jnp.floor(pxy_y)
            proj &= (pxf >= 0) & (pyf >= 0) & (pxf < w) & (pyf < h)
            px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
            py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
            return proj, px, py
        jax.block_until_ready(fn(pos))

    elif op == "proj_gather":
        @jax.jit
        def fn(pos, img):
            lz = pos[..., 2]
            proj = lz > 0
            safe_z = jnp.where(proj, lz, 1.0)
            pxf = jnp.floor(500.0 * pos[..., 0] / safe_z + 320.0)
            pyf = jnp.floor(500.0 * pos[..., 1] / safe_z + 240.0)
            px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
            py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
            d = jnp.take(img.reshape(-1), (py * w + px).reshape(-1), axis=0)
            return proj & (d > 0)
        jax.block_until_ready(fn(pos, img))

    else:
        raise SystemExit(f"unknown op {op}")

    floor("after-op")
    return 0


# ---------------------------------------------------------------------------
# op3: association build-up bisect
# ---------------------------------------------------------------------------


def cmd_op3(op: str) -> int:
    import jax
    import jax.numpy as jnp

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.mapping.association import associate_surfels_with_frame

    floor = _floor_fn()
    cfg = BadSlamConfig()
    cam = syn.default_camera(640, 480)
    h, w = 480, 640
    img = jnp.zeros((h, w), jnp.float32)
    q0 = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t0v = jnp.zeros((3,), jnp.float32)

    n = 4096 if op == "assoc_small" else 1 << 17
    pos = jnp.zeros((n, 3), jnp.float32)
    nrm = jnp.zeros((n, 3), jnp.float32)
    msk = jnp.zeros((n,), jnp.bool_)
    jax.block_until_ready((img, pos))
    floor("setup")

    if op in ("assoc_small", "assoc_big"):
        fn = jax.jit(lambda: associate_surfels_with_frame(
            cam, pos, nrm, msk, q0, t0v, img, img, img, cfg.baseline_fx))
        jax.block_until_ready(fn().valid)

    elif op == "assoc_few_out":
        fn = jax.jit(lambda: associate_surfels_with_frame(
            cam, pos, nrm, msk, q0, t0v, img, img, img,
            cfg.baseline_fx).valid)
        jax.block_until_ready(fn())

    elif op == "assoc_no_rot":
        @jax.jit
        def fn():
            local = pos + t0v
            lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
            proj = msk & (lz > 0)
            safe_z = jnp.where(proj, lz, 1.0)
            pxy_x = cam.fx * lx / safe_z + cam.cx
            pxy_y = cam.fy * ly / safe_z + cam.cy
            pxf = jnp.floor(pxy_x)
            pyf = jnp.floor(pxy_y)
            proj &= (pxf >= 0) & (pyf >= 0) & (pxf < w) & (pyf < h)
            px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
            py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
            flat = img.reshape(-1)
            d_pix = jnp.take(flat, py * w + px, axis=0)
            projects = proj & (d_pix > 0)
            nlx, nly, nlz = nrm[..., 0], nrm[..., 1], nrm[..., 2]
            un_x = cam.fx_inv * px.astype(jnp.float32) + cam.cx_inv
            un_y = cam.fy_inv * py.astype(jnp.float32) + cam.cy_inv
            stddev = 0.1 * jnp.abs(nlx * un_x + nly * un_y + nlz) * d_pix**2
            gap = d_pix - lz
            fsv = projects & (gap > stddev)
            depth_ok = projects & (jnp.abs(gap) <= stddev)
            facing = (lx * nlx + ly * nly + lz * nlz) <= 0
            m_nx = jnp.take(flat, py * w + px, axis=0)
            m_ny = jnp.take(flat, py * w + px, axis=0)
            normal_ok = (nlx * m_nx + nly * m_ny) >= 0.766
            valid = depth_ok & facing & normal_ok
            return (valid, projects, fsv, px, py, pxy_x, pxy_y, lx, ly, lz,
                    nlx, nly, nlz, d_pix, stddev)
        jax.block_until_ready(fn())

    elif op == "g3":
        @jax.jit
        def fn():
            lz = pos[..., 2]
            safe_z = jnp.where(lz > 0, lz, 1.0)
            px = jnp.clip(jnp.floor(cam.fx * pos[..., 0] / safe_z
                                    + cam.cx).astype(jnp.int32), 0, w - 1)
            py = jnp.clip(jnp.floor(cam.fy * pos[..., 1] / safe_z
                                    + cam.cy).astype(jnp.int32), 0, h - 1)
            flat = img.reshape(-1)
            a = jnp.take(flat, py * w + px, axis=0)
            b = jnp.take(flat, py * w + px + 1, axis=0)
            c = jnp.take(flat, py * w + px + 2, axis=0)
            return a, b, c, px, py, lz, a + b, b + c, a * c, a - b, c - a,
        jax.block_until_ready(fn())

    else:
        raise SystemExit(f"unknown op {op}")

    floor("after-op")
    return 0


# ---------------------------------------------------------------------------
# op4: association trigger discrimination (real images vs real cam pytree)
# ---------------------------------------------------------------------------


def cmd_op4(op: str) -> int:
    import jax
    import jax.numpy as jnp

    floor = _floor_fn()
    cfg, cam, frame, _, _, _, _ = _vga_fixture()
    h, w, n = 480, 640, 1 << 17
    zero_img = jnp.zeros((h, w), jnp.float32)
    pos = jnp.zeros((n, 3), jnp.float32)
    nrm = jnp.zeros((n, 3), jnp.float32)
    msk = jnp.zeros((n,), jnp.bool_)
    jax.block_until_ready((frame.depth, zero_img, pos))
    floor("setup")

    def assoc_like(pos, nrm, msk, depth, fnx, fny, fx, fy, cx, cy):
        lx, ly, lz = pos[..., 0], pos[..., 1], pos[..., 2]
        proj = msk & (lz > 0)
        safe_z = jnp.where(proj, lz, 1.0)
        pxy_x = fx * lx / safe_z + cx
        pxy_y = fy * ly / safe_z + cy
        pxf = jnp.floor(pxy_x)
        pyf = jnp.floor(pxy_y)
        proj &= (pxf >= 0) & (pyf >= 0) & (pxf < w) & (pyf < h)
        px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
        py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
        flat = depth.reshape(-1)
        d_pix = jnp.take(flat, py * w + px, axis=0)
        projects = proj & (d_pix > 0)
        nlx, nly, nlz = nrm[..., 0], nrm[..., 1], nrm[..., 2]
        stddev = 0.1 * jnp.abs(nlx + nly + nlz) * d_pix * d_pix
        gap = d_pix - lz
        fsv = projects & (gap > stddev)
        depth_ok = projects & (jnp.abs(gap) <= stddev)
        facing = (lx * nlx + ly * nly + lz * nlz) <= 0
        m_nx = jnp.take(fnx.reshape(-1), py * w + px, axis=0)
        m_ny = jnp.take(fny.reshape(-1), py * w + px, axis=0)
        m_nz = -jnp.sqrt(jnp.maximum(0.0, 1.0 - m_nx**2 - m_ny**2))
        normal_ok = (nlx * m_nx + nly * m_ny + nlz * m_nz) >= 0.766
        valid = depth_ok & facing & normal_ok
        return (valid, projects, fsv, px, py, pxy_x, pxy_y, lx, ly, lz,
                nlx, nly, nlz, d_pix, stddev)

    if op == "realimg_hardcam":
        f = jax.jit(lambda pos, nrm, msk, d, fnx, fny: assoc_like(
            pos, nrm, msk, d, fnx, fny, 525.0, 525.0, 320.0, 240.0))
        jax.block_until_ready(f(pos, nrm, msk, frame.depth, frame.nx,
                                frame.ny))

    elif op == "zeroimg_realcam":
        f = jax.jit(lambda pos, nrm, msk, d, fnx, fny: assoc_like(
            pos, nrm, msk, d, fnx, fny, cam.fx, cam.fy, cam.cx, cam.cy))
        jax.block_until_ready(f(pos, nrm, msk, zero_img, zero_img, zero_img))

    elif op == "realimg_realcam":
        f = jax.jit(lambda pos, nrm, msk, d, fnx, fny: assoc_like(
            pos, nrm, msk, d, fnx, fny, cam.fx, cam.fy, cam.cx, cam.cy))
        jax.block_until_ready(f(pos, nrm, msk, frame.depth, frame.nx,
                                frame.ny))

    elif op == "sum_consume":
        f = jax.jit(lambda d, fnx, fny: jnp.sum(d) + jnp.sum(fnx)
                    + jnp.sum(fny))
        jax.block_until_ready(f(frame.depth, frame.nx, frame.ny))

    else:
        raise SystemExit(f"unknown op {op}")

    floor("after-op")
    return 0


# ---------------------------------------------------------------------------
# op5: the real association vs no-quat / quat-only variants
# ---------------------------------------------------------------------------


def cmd_op5(op: str) -> int:
    import jax
    import jax.numpy as jnp

    from badslam_tpu.geometry import se3
    from badslam_tpu.geometry.linalg import rotate3, transform3
    from badslam_tpu.mapping.association import associate_surfels_with_frame

    floor = _floor_fn()
    cfg, cam, frame, _, _, q0, t0v = _vga_fixture()
    n = 1 << 17
    pos = jnp.zeros((n, 3), jnp.float32)
    nrm = jnp.zeros((n, 3), jnp.float32)
    msk = jnp.zeros((n,), jnp.bool_)
    jax.block_until_ready((frame.depth, pos))
    floor("setup")

    if op == "real":
        f = jax.jit(lambda pos, nrm, msk, q, t, d, fnx, fny:
                    associate_surfels_with_frame(
                        cam, pos, nrm, msk, q, t, d, fnx, fny,
                        cfg.baseline_fx))
        out = f(pos, nrm, msk, q0, t0v, frame.depth, frame.nx, frame.ny)
        jax.block_until_ready(out.valid)

    elif op == "quatonly":
        @jax.jit
        def f(pos, q, t):
            R = se3.quat_to_matrix(q)
            local = transform3(R, t, pos)
            nl = rotate3(R, pos)
            return local, nl
        jax.block_until_ready(f(pos, q0, t0v))

    elif op == "noquat":
        from badslam_tpu.ops import robust
        from badslam_tpu.ops.interp import gather_nearest
        from badslam_tpu.ops.preprocess import normal_z

        @jax.jit
        def f(positions, normals, surfel_mask, R, frame_t, depth, f_nx,
              f_ny):
            h, w = depth.shape
            local = transform3(R, frame_t, positions)
            lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
            proj = surfel_mask & (lz > 0)
            safe_z = jnp.where(proj, lz, 1.0)
            pxy_x = cam.fx * lx / safe_z + cam.cx
            pxy_y = cam.fy * ly / safe_z + cam.cy
            pxf = jnp.floor(pxy_x)
            pyf = jnp.floor(pxy_y)
            proj &= ((pxy_x >= 0) & (pxy_y >= 0) & (pxf < w) & (pyf < h)
                     & (pxf >= 0) & (pyf >= 0))
            px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
            py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
            d_pix = gather_nearest(depth, px, py)
            projects = proj & (d_pix > 0)
            nl = rotate3(R, normals)
            nlx, nly, nlz = nl[..., 0], nl[..., 1], nl[..., 2]
            dtype = positions.dtype
            un_x = cam.fx_inv * px.astype(dtype) + cam.cx_inv
            un_y = cam.fy_inv * py.astype(dtype) + cam.cy_inv
            stddev = (robust.DEPTH_UNCERTAINTY_EMPIRICAL_FACTOR
                      * jnp.abs(nlx * un_x + nly * un_y + nlz)
                      * (d_pix * d_pix)) / cfg.baseline_fx
            gap = d_pix - lz
            threshold = robust.DEPTH_TUKEY_PARAM * stddev
            fsv = projects & (gap > threshold)
            depth_ok = projects & (jnp.abs(gap) <= threshold)
            facing = (lx * nlx + ly * nly + lz * nlz) <= 0
            m_nx = gather_nearest(f_nx, px, py)
            m_ny = gather_nearest(f_ny, px, py)
            m_nz = normal_z(m_nx, m_ny)
            normal_ok = ((nlx * m_nx + nly * m_ny + nlz * m_nz)
                         >= robust.COS_NORMAL_COMPATIBILITY_THRESHOLD)
            valid = depth_ok & facing & normal_ok
            return (valid, projects, fsv, px, py, pxy_x, pxy_y, lx, ly, lz,
                    nlx, nly, nlz, d_pix, stddev)

        R0 = jnp.eye(3, dtype=jnp.float32)
        jax.block_until_ready(f(pos, nrm, msk, R0, t0v, frame.depth,
                                frame.nx, frame.ny))

    else:
        raise SystemExit(f"unknown op {op}")

    floor("after-op")
    return 0


# ---------------------------------------------------------------------------
# wedge: one synthetic trigger, then a sentinel read (JSON verdict line)
# ---------------------------------------------------------------------------


def cmd_wedge(stage: str) -> int:
    import jax
    import jax.numpy as jnp

    out = {"stage": stage, "backend": jax.default_backend()}

    sentinel = jnp.asarray(np.float32(42.0))
    jax.block_until_ready(sentinel)

    t0 = time.perf_counter()
    if stage == "canary":
        from badslam_tpu.utils.watchdog import probe_degradation

        out["canary_degraded"] = probe_degradation()
    elif stage == "scan":
        @jax.jit
        def scanned(x):
            def body(c, _):
                return jnp.tanh(c) + 0.1, jnp.sum(c)
            c, ys = jax.lax.scan(body, x, None, length=9)
            return c, ys

        x = jnp.zeros((240, 320), jnp.float32)
        jax.block_until_ready(scanned(x))
    elif stage == "while":
        @jax.jit
        def looped(x):
            def cond(s):
                i, v = s
                return (i < 10) & jnp.any(v < 1e9)

            def body(s):
                i, v = s
                return i + 1, jnp.tanh(v @ v) + 1.0

            return jax.lax.while_loop(cond, body, (jnp.int32(0), x))

        x = jnp.zeros((256, 256), jnp.float32)
        jax.block_until_ready(looped(x))
    elif stage == "donate":
        @jax.jit
        def upd(buf, i):
            return buf.at[i].set(1.0)

        upd_d = jax.jit(upd, donate_argnums=(0,))
        buf = jnp.zeros((1024,), jnp.float32)
        for i in range(120):
            buf = upd_d(buf, jnp.int32(i % 1024))
        jax.block_until_ready(buf)
    elif stage == "upload120":
        acc = jnp.zeros((), jnp.float32)
        add = jax.jit(lambda a, d, r: a + jnp.sum(d.astype(jnp.float32))
                      + jnp.sum(r.astype(jnp.float32)))
        rng = np.random.default_rng(0)
        for _ in range(120):
            d = jnp.asarray(
                rng.integers(0, 1000, (240, 320)).astype(np.uint16))
            r = jnp.asarray(
                rng.integers(0, 255, (240, 320, 3)).astype(np.uint8))
            acc = add(acc, d, r)
        jax.block_until_ready(acc)
    elif stage != "control":
        print(json.dumps({"error": f"unknown stage {stage}"}))
        return 2
    out["trigger_s"] = round(time.perf_counter() - t0, 3)

    try:
        v, dt = timed_read(sentinel)
        out["sentinel_read"] = float(v)
        out["read_s"] = round(dt, 3)
        out["wedged"] = False
    except Exception as e:
        out["read_error"] = repr(e)[:120]
        out["wedged"] = True
    print(json.dumps(out), flush=True)
    if out["wedged"]:
        sys.stdout.flush()
        os._exit(0)  # jax atexit would join the wedged transfer
    return 0


# ---------------------------------------------------------------------------
# wedge-slam: the real QVGA long-run cut at n frames, then ONE read
# ---------------------------------------------------------------------------


def cmd_wedge_slam(n: int, flags: set) -> int:
    import jax
    import jax.numpy as jnp

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam

    out = {"n": n, "flags": sorted(flags), "backend": jax.default_backend()}

    cam = syn.default_camera(W, H)
    scene = syn.room_scene(3.0)
    gt = syn.loop_trajectory(FRAMES, loop_frames=max(FRAMES - 70,
                                                     int(FRAMES * 0.9)))
    cfg = BadSlamConfig(
        num_scales=5,
        max_surfel_count=1 << 14 if "smallmap" in flags else 1 << 20,
        loop_detection_image_frequency=0.5,
        loop_detection_images_width=W,
        loop_detection_images_height=H,
        fps_restriction=0,
        enable_loop_detection=False,
        steady_frame_chunking="nochunk" not in flags,
    )
    if "noba" in flags:
        import dataclasses

        cfg = dataclasses.replace(cfg, max_num_ba_iterations_per_keyframe=0)
    rng = np.random.default_rng(7)
    depths, rgbs = [], []
    for p in gt:
        depth, inten = syn.render_scene(
            cam, scene, p, albedo=lambda q: syn.textured_intensity_at(
                q, cell=0.07))
        sigma = 0.01 * depth * depth
        depth = np.where(depth > 0, np.maximum(
            depth + sigma * rng.standard_normal(depth.shape), 1e-3), 0.0)
        depths.append(np.clip(depth / cfg.raw_to_float_depth, 0,
                              65535).astype(np.uint16))
        inten = inten + (3.0 / 255.0) * rng.standard_normal(inten.shape)
        gray = np.clip(inten * 255.0 + 0.5, 0, 255).astype(np.uint8)
        rgbs.append(np.stack([gray, gray, gray], axis=-1))

    import bench

    video = bench._InMemoryVideo(cam, depths, rgbs)
    sentinel = jnp.asarray(np.float32(42.0))
    jax.block_until_ready(sentinel)
    if "t0read" in flags:
        # Pre-pay the first-read session flush BEFORE any compiled program
        # (PERF_NOTES round 5): cheap, leaves the canary healthy, makes
        # post-run reads instant — but chunked heavy runs after it crashed
        # the worker 2/2 on 2026-08-19, hence this bisection flag.
        try:
            to = float(os.environ.get("PROBE_TIMEOUT", 240))
            v, dt = timed_read(sentinel, timeout_s=to)
            out["t0_read_s"] = round(dt, 3)
        except Exception as e:
            # Environmental (relay recovering from an earlier crash):
            # report and bail rather than running the ladder blind.
            out["t0_read_error"] = repr(e)[:120]
            print(json.dumps(out), flush=True)
            sys.stdout.flush()
            os._exit(0)

    slam = BadSlam(cfg, video)
    t0 = time.perf_counter()
    i = 0
    while i < n:  # n=0: init only (map/keyframe-store alloc, no frames)
        if slam.chunk_eligible(i, n):
            c = slam._chunk_len()
            slam._process_chunk(i, c)
            i += c
        else:
            slam.process_frame(i)
            i += 1
    jax.block_until_ready(slam.traj_q)
    out["run_s"] = round(time.perf_counter() - t0, 3)

    if "cbread" in flags:
        # Host-callback channel instead of a classic D2H read (see
        # PERF_NOTES: UNIMPLEMENTED in axon_pjrt as of 2026-08-19).
        t0 = time.perf_counter()
        try:
            @jax.jit
            def emit(x):
                jax.debug.print("CBVALUE {v}", v=x)
                return x + 0.0

            jax.block_until_ready(emit(sentinel))
            out["debug_print_s"] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            out["debug_print_error"] = repr(e)[:120]
        t0 = time.perf_counter()
        try:
            import jax.experimental as jex

            box = {}

            def sink(v):
                box["v"] = float(v)
                print(f"IOCB {box['v']}", flush=True)
                return np.float32(0.0)

            @jax.jit
            def emit2(x):
                return jex.io_callback(
                    sink, jax.ShapeDtypeStruct((), jnp.float32), x)

            jax.block_until_ready(emit2(sentinel))
            out["io_callback_s"] = round(time.perf_counter() - t0, 3)
            out["io_callback_value"] = box.get("v")
        except Exception as e:
            out["io_callback_error"] = repr(e)[:120]
    if "delslam" in flags:
        import gc

        del slam, video
        gc.collect()
        time.sleep(5.0)  # let the relay process the frees
        out["post_del_sleep_s"] = 5.0
    try:
        to = float(os.environ.get("PROBE_TIMEOUT", 60))
        v, dt = timed_read(sentinel, timeout_s=to)
        out["sentinel_read"] = float(v)
        out["read_s"] = round(dt, 3)
        out["wedged"] = False
        if "readtwice" in flags:
            v2, dt2 = timed_read(sentinel, timeout_s=to)
            out["read2_s"] = round(dt2, 3)
    except Exception as e:
        out["read_error"] = repr(e)[:120]
        out["wedged"] = True
    print(json.dumps(out), flush=True)
    sys.stdout.flush()
    if out["wedged"]:
        os._exit(0)  # jax atexit would join the wedged transfer
    return 0


# ---------------------------------------------------------------------------
# read-back / read-first / read-lore
# ---------------------------------------------------------------------------


def cmd_read_back() -> int:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x):
        for _ in range(8):
            x = jnp.tanh(x @ x) + 0.1
        return x

    x = jnp.array(np.random.default_rng(0).normal(size=(512, 512)),
                  jnp.float32)

    def measure(n=30):
        r = step(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = step(x)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n

    print(f"backend: {jax.default_backend()}", flush=True)
    before = measure()
    print(f"step time before any read: {1e3 * before:.3f} ms", flush=True)

    s = jnp.sum(x)
    try:
        s.copy_to_host_async()
        time.sleep(1.0)
        value = float(s)
        print(f"async-prefetched read ok: {value:.3f}", flush=True)
        after_async = measure()
        print(f"step time after async read: {1e3 * after_async:.3f} ms "
              f"({after_async / max(before, 1e-12):.2f}x)", flush=True)
    except Exception as e:
        print(f"copy_to_host_async failed: {e}", flush=True)

    value = float(jnp.sum(x))
    print(f"sync scalar read ok: {value:.3f}", flush=True)
    after = measure()
    print(f"step time after sync read: {1e3 * after:.3f} ms", flush=True)
    ratio = after / max(before, 1e-12)
    print(f"ratio: {ratio:.2f}x "
          + ("(degradation CONFIRMED)" if ratio > 5 else "(no degradation)"),
          flush=True)
    return 0


def cmd_read_first() -> int:
    import jax
    import jax.numpy as jnp

    out = {"backend": jax.default_backend()}

    x = jnp.asarray(np.float32(7.0))
    jax.block_until_ready(x)
    v, dt = timed_read(x, timeout_s=120)
    out["t0_read_s"] = round(dt, 3)

    from badslam_tpu.utils.watchdog import probe_degradation

    t0 = time.perf_counter()
    out["canary_degraded"] = probe_degradation()
    out["canary_total_s"] = round(time.perf_counter() - t0, 3)

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam
    import bench

    cam = syn.default_camera(W, H)
    scene = syn.room_scene(3.0)
    gt = syn.loop_trajectory(120, loop_frames=50)
    cfg = BadSlamConfig(
        num_scales=5, max_surfel_count=1 << 20, fps_restriction=0,
        enable_loop_detection=False)
    depths, rgbs = bench._render_frames(cam, scene, gt,
                                        cfg.raw_to_float_depth)
    video = bench._InMemoryVideo(cam, depths, rgbs)
    slam = BadSlam(cfg, video)
    t0 = time.perf_counter()
    slam.process_frames(0, 10)
    jax.block_until_ready(slam.traj_q)
    out["run10_s"] = round(time.perf_counter() - t0, 3)

    sentinel = jnp.asarray(np.float32(42.0))
    try:
        v, dt = timed_read(sentinel, timeout_s=600)
        out["post_run_read_s"] = round(dt, 3)
        out["post_run_read"] = float(v)
    except Exception as e:
        out["post_run_read_error"] = repr(e)[:120]
    print(json.dumps(out), flush=True)
    sys.stdout.flush()
    os._exit(0)


def cmd_read_lore() -> int:
    import jax
    import jax.numpy as jnp

    def median_canary_s(reps: int = 5) -> float:
        from badslam_tpu.utils.watchdog import _canary_fn

        fn = _canary_fn()
        x = jnp.asarray(np.float32(0.5))
        jax.block_until_ready(fn(x))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev})", flush=True)

    t_before = median_canary_s()
    print(f"canary before any read: {1e3 * t_before:.2f} ms", flush=True)

    x = jnp.asarray(np.float32(41.0)) + 1.0
    t0 = time.perf_counter()
    v = float(x)  # THE read
    print(f"read #1: value={v} in {time.perf_counter() - t0:.3f} s",
          flush=True)

    t_after1 = median_canary_s()
    print(f"canary after 1 read: {1e3 * t_after1:.2f} ms "
          f"({t_after1 / max(t_before, 1e-9):.1f}x)", flush=True)

    for i in range(2, 5):
        t0 = time.perf_counter()
        v = float(jnp.asarray(np.float32(i)) * 2.0)
        print(f"read #{i}: value={v} in {time.perf_counter() - t0:.3f} s",
              flush=True)

    t_after4 = median_canary_s()
    print(f"canary after 4 reads: {1e3 * t_after4:.2f} ms "
          f"({t_after4 / max(t_before, 1e-9):.1f}x)", flush=True)
    verdict = "LORE HOLDS (degraded)" if t_after4 > 10 * t_before + 0.01 \
        else "lore NOT reproduced on this build"
    print(verdict, flush=True)
    return 0


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    cmd = sys.argv[1]

    # TPU-only guarded persistent compile cache (utils/cache.py — never set
    # the config keys directly; XLA:CPU (de)serialization crashes here).
    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    if cmd == "op":
        return cmd_op(sys.argv[2])
    if cmd == "op2":
        return cmd_op2(sys.argv[2])
    if cmd == "op3":
        return cmd_op3(sys.argv[2])
    if cmd == "op4":
        return cmd_op4(sys.argv[2])
    if cmd == "op5":
        return cmd_op5(sys.argv[2])
    if cmd == "wedge":
        return cmd_wedge(sys.argv[2] if len(sys.argv) > 2 else "control")
    if cmd == "wedge-slam":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else FRAMES
        return cmd_wedge_slam(n, set(sys.argv[3:]))
    if cmd == "read-back":
        return cmd_read_back()
    if cmd == "read-first":
        return cmd_read_first()
    if cmd == "read-lore":
        return cmd_read_lore()
    print(f"unknown probe '{cmd}'\n{__doc__}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
