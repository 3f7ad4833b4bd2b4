"""Pallas-vs-XLA A/B for the tracker's gather-heavy GN accumulation.

The round-3 verdict asks for a measured keep/kill decision on a Pallas
kernel for the descriptor/gather path (SURVEY.md §7 hard-part 5; the
reference's equivalent is the texture-unit reads in
cost_function.cuh:191-254). The question has two parts:

1. CAN Mosaic express the pattern at all? The tracker's inner loop is a
   vectorized dynamic gather (every lane reads image[py[i], px[i]] at
   data-dependent coordinates). TPU has no gather unit; Pallas refs are
   slice-indexed (pl.ds), so an in-kernel gather must come from
   jnp.take / lax.gather lowering through Mosaic, which historically
   supports it only in narrow forms.
2. If expressible, IS it faster than XLA's gather HLO for this shape
   (VGA f32 image, ~300k near-coherent indices from a near-identity
   warp) — enough to justify hand-fusing the whole GN body?

Run on the real TPU:  python tools/probe_pallas_gather.py
Writes one JSON line per experiment; PERF_NOTES.md records the decision.

NO device values are read before the timed sections (timing is host
clocks + block_until_ready; see PERF_NOTES.md on read degradation) —
correctness cross-checks run in a CPU-interpret pass first.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _bench(fn, *args, reps: int = 200) -> float:
    """Amortized ms/call: warm once, then time a burst (host clock +
    block_until_ready only — no device reads)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1e3 * (time.perf_counter() - t0) / reps


def make_inputs(h: int, w: int, seed: int = 0):
    """A VGA-ish image + near-coherent index field (small warp), the
    tracker's actual access pattern (projected coords of a near-identity
    pose differ from the identity by a few pixels)."""
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((h, w)).astype(np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    px = np.clip(xs + rng.integers(-3, 4, size=(h, w)), 0, w - 1)
    py = np.clip(ys + rng.integers(-3, 4, size=(h, w)), 0, h - 1)
    return img, px.astype(np.int32), py.astype(np.int32)


def xla_gather(img, px, py):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(img, px, py):
        h, w = img.shape
        return jnp.take(img.reshape(-1), (py * w + px).reshape(-1)).reshape(
            px.shape)

    return f


def _interpret() -> bool:
    """Pallas TPU kernels only lower through Mosaic on TPU; elsewhere run
    in interpret mode (correctness smoke only — timings meaningless)."""
    import jax

    return jax.default_backend() != "tpu"


def pallas_gather_rowblock(h: int, w: int, block_h: int = 64):
    """Candidate kernel: the full image resident in VMEM (f32 VGA =
    1.2 MB), the index field streamed in row blocks, one vector gather
    per block via jnp.take. Stands or falls with Mosaic's dynamic-gather
    lowering."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(img_ref, idx_ref, out_ref):
        flat = img_ref[:].reshape(-1)
        out_ref[:] = jnp.take(flat, idx_ref[:].reshape(-1), axis=0).reshape(
            idx_ref.shape)

    grid = (h // block_h,)

    @jax.jit
    def f(img, px, py):
        idx = py * w + px
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), img.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((h, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_h, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_h, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(img, idx)

    return f


def pallas_gather_onehot(h: int, w: int, block_h: int = 8):
    """MXU fallback formulation: gather as one-hot matmul over row
    windows. Each output row block builds a [block, w] x [w, w] selection
    against a +/- radius row window — only viable at tiny scales; timed
    to document WHY it is killed at VGA."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Rows move by at most +/-3 in the near-coherent field; a 16-row
    # window (block 8 + pad 4 each side) covers it. Real tracker warps
    # can exceed this => the formulation is approximate by construction,
    # which alone is a kill reason unless it wins big.
    pad = 4
    win = block_h + 2 * pad

    def kernel(img_ref, px_ref, py_ref, out_ref):
        # img_ref holds the FULL padded image (overlapping windows are not
        # expressible as BlockSpec tiles); the window is a pl.ds slice.
        i = pl.program_id(0)
        px = px_ref[:]
        py = py_ref[:] - (i * block_h - pad)  # window-relative rows
        win_img = img_ref[pl.ds(i * block_h, win), :]  # [win, w]
        win_rows = jax.lax.broadcasted_iota(jnp.int32, (w, win), 1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        acc = jnp.zeros((block_h, w), jnp.float32)

        # Two-stage one-hot, looped over the block's rows to bound VMEM:
        # rows first ([w, win] one-hot @ [win, w] on the MXU), then the
        # column pick as a masked reduce over the [w, w] row-gather.
        def body(r, acc):
            row_sel = (win_rows == py[r][:, None]).astype(jnp.float32)
            rows_g = jnp.dot(row_sel, win_img,
                             preferred_element_type=jnp.float32)  # [w, w]
            v = jnp.sum(jnp.where(col_ids == px[r][:, None], rows_g, 0.0),
                        axis=1)
            return acc.at[r].set(v)

        acc = jax.lax.fori_loop(0, block_h, body, acc)
        out_ref[:] = acc

    grid = (h // block_h,)

    @jax.jit
    def f(img, px, py):
        imgp = jnp.pad(img, ((pad, pad), (0, 0)))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), img.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((h + 2 * pad, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_h, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_h, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_h, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(imgp, px, py)

    return f


def main() -> None:
    import jax

    results = {"backend": jax.default_backend()}
    if "--sync-first" in sys.argv:
        # Async-ack relay builds (PERF_NOTES 2026-08-20) ack every block
        # at enqueue, making _bench times meaningless. Reading one
        # PROGRAM OUTPUT flips the session into TRUE-sync mode (post-read,
        # blocks scale linearly with work) at the cost of the one-time
        # session flush (~390 s measured) — mandatory for honest A/B
        # numbers on such builds. Bounded join: the read is
        # un-interruptible in C land.
        import threading

        import jax.numpy as jnp

        x = jnp.asarray(np.float32(1.0))
        box = {}

        def _r():
            try:
                box["v"] = float(jax.jit(lambda v: v + 1.0)(x))
            except Exception as e:  # pragma: no cover
                box["e"] = e

        t0 = time.perf_counter()
        th = threading.Thread(target=_r, daemon=True)
        th.start()
        th.join(700.0)
        results["sync_first_read_s"] = (
            round(time.perf_counter() - t0, 1) if "v" in box
            else f"failed: {box.get('e', 'hung')!r}"[:120])
    h, w = 480, 640
    img_np, px_np, py_np = make_inputs(h, w)
    import jax.numpy as jnp

    img = jnp.asarray(img_np)
    px = jnp.asarray(px_np)
    py = jnp.asarray(py_np)
    want = img_np.reshape(-1)[(py_np * w + px_np).reshape(-1)].reshape(h, w)

    f_xla = xla_gather(img, px, py)
    results["xla_gather_ms"] = round(_bench(f_xla, img, px, py), 4)

    # Candidate 1: in-kernel vector gather (the load-bearing question).
    try:
        f_pl = pallas_gather_rowblock(h, w)
        out = np.asarray(jax.device_get(f_pl(img, px, py))) \
            if jax.default_backend() == "cpu" else None
        if out is not None and not np.allclose(out, want):
            results["pallas_rowblock"] = "WRONG RESULTS"
        else:
            results["pallas_rowblock_ms"] = round(
                _bench(f_pl, img, px, py), 4)
    except Exception as e:  # Mosaic lowering failure IS the result
        results["pallas_rowblock"] = f"lowering failed: {repr(e)[:300]}"

    # Candidate 2: one-hot/select MXU formulation (expected to lose at
    # VGA; timed to document the margin).
    try:
        f_oh = pallas_gather_onehot(h, w)
        out = np.asarray(jax.device_get(f_oh(img, px, py))) \
            if jax.default_backend() == "cpu" else None
        if out is not None and not np.allclose(out, want):
            results["pallas_onehot"] = "WRONG RESULTS"
        else:
            results["pallas_onehot_ms"] = round(
                _bench(f_oh, img, px, py, reps=20), 4)
    except Exception as e:
        results["pallas_onehot"] = f"lowering failed: {repr(e)[:300]}"

    # Context rows: the full GN accumulation these gathers live in.
    from badslam_tpu import synthetic as syn
    from badslam_tpu.ops.preprocess import preprocess_frame
    from badslam_tpu.ops.pyramid import build_pyramid
    from badslam_tpu.tracking import pairwise

    cam = syn.default_camera(w, h)
    scene = syn.random_plane_scene(np.random.default_rng(0), num_planes=3)
    d0, i0 = syn.render_scene(cam, scene, syn.identity_pose())
    d1, i1 = syn.render_scene(cam, scene, syn.pose(tx=0.01, ry=0.004))

    def pyr(d, inten):
        rgb = np.repeat(
            np.clip(inten[..., None] * 255.0, 0, 255).astype(np.uint8), 3, -1)
        fr = preprocess_frame(cam, jnp.asarray(d), jnp.asarray(rgb),
                              max_depth=20.0, sigma_xy=1.5,
                              radius_factor=2.0, sigma_inv_depth=0.005)
        return build_pyramid(fr.depth, fr.nx, fr.ny, fr.intensity, 1)

    base, tracked = pyr(d0, i0)[0], pyr(d1, i1)[0]
    q0 = jnp.asarray(np.array([1, 0, 0, 0], np.float32))
    t0 = jnp.zeros((3,), jnp.float32)
    acc = jax.jit(lambda *a: pairwise.accumulate_pose_coeffs(
        cam, a[0], a[1], a[2], a[3], 1.0, 40.0, True, True))
    results["gn_accumulation_vga_ms"] = round(
        _bench(acc, base, tracked, q0, t0), 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
