#!/usr/bin/env python
"""Generate tests/data/tum_fixture: a tiny on-disk dataset that
byte-replicates the REAL TUM-download quirks the loader must survive
(round-4 verdict #10 — real-data readiness until a dataset can be mounted):

  * raw rgb.txt/depth.txt streams (NO associated.txt) at independent rates
    with a dropped depth frame, forcing the in-loader association
    (io/dataset.py associate_frames; the reference requires associate.py,
    rgbd_video_io_tum_dataset.h:122-127);
  * f64 epoch timestamps (~1.3e9 s, 33 ms spacing — f32 would collapse);
  * groundtruth.txt with lines INTERLEAVED OUT OF ORDER (real mocap
    exports) and timestamps offset from the frames (forces slerp);
  * a radtan calibration line (k1 k2 p1 p2) exercising the camera-model
    grammar + undistortion-map construction;
  * 16-bit depth PNGs and 8-bit color PNGs written with cv2, read back by
    the native libpng loader / cv2 fallback.

Deterministic output; run once and check the directory in:
    python tools/make_tum_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]

W, H = 64, 48
EPOCH = 1305031102.175304  # real freiburg1-style epoch base
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "tum_fixture")


def main() -> int:
    import cv2

    rng = np.random.default_rng(11)
    os.makedirs(os.path.join(OUT, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "depth"), exist_ok=True)

    # fx fy cx cy + radtan k1 k2 p1 p2 (mild, freiburg-like magnitudes)
    with open(os.path.join(OUT, "calibration.txt"), "w") as f:
        f.write("60.0 60.0 32.0 24.0 0.05 -0.02 0.001 -0.001\n")

    # 6 rgb frames at 30 Hz; depth offset by ~7 ms, frame 3 DROPPED.
    rgb_lines, depth_lines = [], []
    n_rgb = 6
    for i in range(n_rgb):
        ts = EPOCH + i / 30.0
        name = f"{ts:.6f}"
        img = (40 + 20 * i + 8 * rng.standard_normal((H, W, 3))).clip(
            0, 255).astype(np.uint8)
        # gradient texture so preprocessing has structure
        img[:, :, :] += (np.linspace(0, 60, W, dtype=np.uint8)[None, :, None])
        cv2.imwrite(os.path.join(OUT, "rgb", name + ".png"), img[..., ::-1])
        rgb_lines.append(f"{name} rgb/{name}.png")

        if i == 3:
            continue  # dropped depth frame -> association must skip it
        dts = ts + 0.0071
        dname = f"{dts:.6f}"
        z = 1.5 + 0.3 * np.sin(np.linspace(0, 3, W))[None, :] \
            + 0.1 * np.cos(np.linspace(0, 2, H))[:, None] + 0.01 * i
        d16 = np.round(z * 5000.0).astype(np.uint16)
        d16[0, 0] = 0  # invalid pixel, real sensors have them
        ok = cv2.imwrite(os.path.join(OUT, "depth", dname + ".png"), d16)
        assert ok
        depth_lines.append(f"{dname} depth/{dname}.png")

    hdr = "# timestamp filename\n"
    with open(os.path.join(OUT, "rgb.txt"), "w") as f:
        f.write(hdr + "\n".join(rgb_lines) + "\n")
    with open(os.path.join(OUT, "depth.txt"), "w") as f:
        f.write(hdr + "\n".join(depth_lines) + "\n")

    # Groundtruth at 100 Hz around the frames, written OUT OF ORDER
    # (alternating halves), with a leading comment block like the real
    # files. Poses: slow x-translation + yaw.
    gt = []
    for j in range(-3, 25):
        ts = EPOCH + j / 100.0
        ang = 0.001 * j
        tx = 0.01 * j
        qw, qz = np.cos(ang / 2), np.sin(ang / 2)
        gt.append(f"{ts:.6f} {tx:.6f} 0.000000 0.000000 "
                  f"0.000000 0.000000 {qz:.6f} {qw:.6f}")
    shuffled = gt[len(gt) // 2:] + gt[: len(gt) // 2]
    with open(os.path.join(OUT, "groundtruth.txt"), "w") as f:
        f.write("# ground truth trajectory\n# timestamp tx ty tz qx qy qz "
                "qw\n" + "\n".join(shuffled) + "\n")
    print("wrote", os.path.abspath(OUT))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
