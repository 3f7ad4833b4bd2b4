"""RGB-D dataset IO: TUM / ETH3D format with lazy frame loading.

Rebuild of ReadTUMRGBDDatasetAssociatedAndCalibrated + RGBDVideo +
ImageCache (/root/reference/libvis/src/libvis/rgbd_video_io_tum_dataset.h:74-242,
rgbd_video.h:39-72, image_cache.h). Expected directory layout:

  dataset/
    calibration.txt     # "fx fy cx cy" (pixel-corner convention)
    associated.txt      # "rgb_ts rgb_file depth_ts depth_file" per line
    rgb/*.png, depth/*.png (16-bit, raw_to_float scaling, default 1/5000)
    [trajectory file]   # optional TUM format "ts tx ty tz qx qy qz qw"

Frames load lazily and can be dropped again (`clear_frame`) to bound RAM,
like the reference's ClearImageAndDerivedData (main.cc:753-754).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera


def _imread_depth(path: str) -> np.ndarray:
    from badslam_tpu.io import native_loader

    if native_loader.available():
        img = native_loader.read_png(path)
        if img is not None:
            if img.ndim == 3:
                img = img[..., 0]
            return img.astype(np.uint16)
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.uint16)


def _imread_color(path: str) -> np.ndarray:
    from badslam_tpu.io import native_loader

    if native_loader.available():
        img = native_loader.read_png(path)
        if img is not None:
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            return np.ascontiguousarray(img[..., :3]).astype(np.uint8)
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img[..., ::-1].copy()  # BGR -> RGB


@dataclass
class RGBDVideo:
    """Lazy-loading RGB-D sequence + cameras + per-frame poses."""

    base_path: str
    color_paths: List[str]
    depth_paths: List[str]
    timestamps: List[float]
    camera: PinholeCamera
    depth_camera: Optional[PinholeCamera] = None
    # global_T_frame per frame; identity until tracked (or loaded GT).
    poses: List[Optional[se3.SE3]] = field(default_factory=list)
    # [H, W, 2] source-pixel remap when the source images are distorted
    # (loader-built; preprocess_frame applies it on device). None = pinhole.
    undistortion_map: Optional[np.ndarray] = None
    _color_cache: Dict[int, np.ndarray] = field(default_factory=dict)
    _depth_cache: Dict[int, np.ndarray] = field(default_factory=dict)

    def __post_init__(self):
        if not self.poses:
            self.poses = [None] * len(self.color_paths)
        if self.depth_camera is None:
            self.depth_camera = self.camera

    def __len__(self) -> int:
        return len(self.color_paths)

    def depth_u16(self, index: int) -> np.ndarray:
        if index not in self._depth_cache:
            self._depth_cache[index] = _imread_depth(self.depth_paths[index])
        return self._depth_cache[index]

    def color_u8(self, index: int) -> np.ndarray:
        if index not in self._color_cache:
            self._color_cache[index] = _imread_color(self.color_paths[index])
        return self._color_cache[index]

    def clear_frame(self, index: int) -> None:
        self._color_cache.pop(index, None)
        self._depth_cache.pop(index, None)

    def set_pose(self, index: int, pose: se3.SE3) -> None:
        self.poses[index] = pose


def load_tum_trajectory(path: str) -> Tuple[List[float], List[se3.SE3]]:
    """TUM trajectory file: ts tx ty tz qx qy qz qw (global_T_frame)."""
    import jax.numpy as jnp

    timestamps, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            ts = float(parts[0])
            tx, ty, tz, qx, qy, qz, qw = (float(v) for v in parts[1:8])
            timestamps.append(ts)
            poses.append(
                se3.SE3(
                    jnp.array([qw, qx, qy, qz], jnp.float32),
                    jnp.array([tx, ty, tz], jnp.float32),
                )
            )
    return timestamps, poses


def _read_tum_file_list(path: str) -> List[Tuple[float, str]]:
    """One TUM rgb.txt/depth.txt: 'timestamp filename' per line."""
    out: List[Tuple[float, str]] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def associate_frames(
    rgb: List[Tuple[float, str]],
    depth: List[Tuple[float, str]],
    max_difference: float = 0.02,
) -> List[Tuple[float, str, float, str]]:
    """Match rgb/depth streams by nearest timestamp within a window.

    Real TUM sensors run the two streams at independent rates with drops;
    the reference requires the benchmark's associate.py to be run first
    (rgbd_video_io_tum_dataset.h:122-127). This builds the same pairing
    in-loader: each rgb frame takes its nearest depth frame within
    `max_difference` seconds (associate.py's default), each depth frame
    used at most once, ties resolved to the earlier candidate — a sorted
    two-pointer sweep instead of associate.py's O(N^2) candidate sort.
    """
    rgb = sorted(rgb)
    depth = sorted(depth)
    out: List[Tuple[float, str, float, str]] = []
    j = 0           # first depth frame with timestamp >= current rgb ts
    last_used = -1  # each depth frame pairs at most once
    for ts, fname in rgb:
        while j < len(depth) and depth[j][0] < ts:
            j += 1
        best = None
        for k in (j - 1, j):  # the two straddling candidates
            if last_used < k < len(depth):
                dt = abs(depth[k][0] - ts)
                if dt <= max_difference and (best is None or dt < best[0]):
                    best = (dt, k)
        if best is not None:
            k = best[1]
            out.append((ts, fname, depth[k][0], depth[k][1]))
            last_used = k
    return out


def load_tum_dataset(
    path: str,
    trajectory_filename: Optional[str] = None,
) -> RGBDVideo:
    calib_path = os.path.join(path, "calibration.txt")
    with open(calib_path) as f:
        tokens = f.readline().split()
    # Calibration grammar (model dispatch like libvis' camera hierarchy,
    # camera.h:287-295; the TUM loader itself is pinhole-only,
    # rgbd_video_io_tum_dataset.h:122-146):
    #   [model_name] fx fy cx cy [distortion...]
    # with the model inferred from the parameter count when unnamed:
    #   4 -> pinhole; 6/8 -> radtan (k1 k2 [p1 p2]);
    #   12 -> thin-prism fisheye (k1 k2 k3 k4 p1 p2 sx1 sy1).
    model_name = None
    if tokens and not tokens[0].lstrip("+-").replace(".", "", 1).isdigit():
        model_name = tokens.pop(0).lower()
    calib_vals = [float(v) for v in tokens]
    fx, fy, cx, cy = calib_vals[:4]
    distortion = calib_vals[4:]
    if model_name is None:
        model_name = {0: "pinhole", 2: "radtan", 4: "radtan",
                      8: "thin_prism_fisheye"}.get(len(distortion))
        if model_name is None:
            raise ValueError(
                f"calibration.txt: cannot infer camera model from "
                f"{4 + len(distortion)} parameters")

    color_paths: List[str] = []
    depth_paths: List[str] = []
    timestamps: List[float] = []
    assoc_path = os.path.join(path, "associated.txt")
    if os.path.exists(assoc_path):
        with open(assoc_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rgb_ts, rgb_file, depth_ts, depth_file = line.split()[:4]
                color_paths.append(os.path.join(path, rgb_file))
                depth_paths.append(os.path.join(path, depth_file))
                timestamps.append(float(rgb_ts))
    elif os.path.exists(os.path.join(path, "rgb.txt")) and os.path.exists(
            os.path.join(path, "depth.txt")):
        # Raw TUM download (no associate.py run): build the association
        # in-loader. The reference errors out here
        # (rgbd_video_io_tum_dataset.h:165-169).
        pairs = associate_frames(
            _read_tum_file_list(os.path.join(path, "rgb.txt")),
            _read_tum_file_list(os.path.join(path, "depth.txt")))
        for rgb_ts, rgb_file, _, depth_file in pairs:
            color_paths.append(os.path.join(path, rgb_file))
            depth_paths.append(os.path.join(path, depth_file))
            timestamps.append(rgb_ts)
    else:
        raise FileNotFoundError(
            f"{assoc_path} (and no rgb.txt/depth.txt to associate)")

    if not color_paths:
        raise ValueError(f"empty associated.txt in {path}")

    # Image size from the first frame.
    first_depth_path = depth_paths[0]
    first = _imread_depth(first_depth_path)
    h, w = first.shape
    camera = PinholeCamera(fx=fx, fy=fy, cx=cx, cy=cy, width=w, height=h)

    # Non-pinhole source: the SLAM pipeline runs on undistorted pinhole
    # frames (the reference undistorts on load, undistortion.h:40-58).
    # Pick the pinhole covering the source FOV (DecideForUndistortedCamera
    # with avoid_invalid_pixels=false — the depth-camera choice,
    # input_structure.cc:414) and build the remap table; preprocess_frame
    # applies it on device.
    src = None
    if model_name in ("radtan", "radtan8", "radtan9") and any(
            abs(v) > 0 for v in distortion):
        from badslam_tpu.geometry.camera import RadTanCamera

        k = (distortion + [0.0] * 4)[:4]
        src = RadTanCamera(pinhole=camera, k1=k[0], k2=k[1],
                           p1=k[2], p2=k[3])
    elif model_name in ("thin_prism_fisheye", "fisheye"):
        from badslam_tpu.geometry.camera import ThinPrismFisheyeCamera

        k = (distortion + [0.0] * 8)[:8]
        src = ThinPrismFisheyeCamera(
            pinhole=camera, k1=k[0], k2=k[1], k3=k[2], k4=k[3],
            p1=k[4], p2=k[5], sx1=k[6], sy1=k[7])
    elif model_name not in (None, "pinhole"):
        raise ValueError(f"unknown camera model '{model_name}'")

    if src is not None:
        from badslam_tpu.geometry.camera import decide_undistorted_camera

        camera = decide_undistorted_camera(src, avoid_invalid_pixels=False)

    frame_poses: List[Optional[se3.SE3]] = [None] * len(timestamps)
    if trajectory_filename:
        ts, poses = load_tum_trajectory(os.path.join(path, trajectory_filename))
        # Interpolate the trajectory at each frame timestamp: translation
        # lerp + quaternion slerp between the bracketing trajectory poses
        # (ReadTUMRGBDDatasetAssociatedAndCalibrated semantics,
        # rgbd_video_io_tum_dataset.h:149-199); clamp at the ends.
        # Deliberate deviation: real mocap exports can interleave lines
        # out of order; the reference's linear bracket scan then clamps
        # whole prefixes to the raw first line (InterpolatePose's failure
        # return is unreachable — between the sequence min and max a
        # bracketing adjacent pair always exists). Sorting by timestamp
        # first gives the interpolation those files intend. Timestamps
        # stay f64 throughout: real TUM stamps are ~1.3e9 s epochs, where
        # f32 resolution (~128 s) would collapse the 33 ms frame spacing.
        import jax.numpy as jnp

        from badslam_tpu.geometry import se3_np as s3np

        order = np.argsort(np.array(ts, np.float64), kind="stable")
        ts_arr = np.array(ts, np.float64)[order]
        np_poses = [
            s3np.SE3(np.asarray(poses[k].q, np.float64),
                     np.asarray(poses[k].t, np.float64))
            for k in order
        ]
        for i, t in enumerate(timestamps):
            j = int(np.searchsorted(ts_arr, t))
            if j <= 0:
                pose = np_poses[0]
            elif j >= len(np_poses):
                pose = np_poses[-1]
            else:
                a, b = np_poses[j - 1], np_poses[j]
                denom = max(ts_arr[j] - ts_arr[j - 1], 1e-12)
                f = float((t - ts_arr[j - 1]) / denom)
                pose = s3np.SE3(
                    s3np.slerp(a.q, b.q, f),
                    (1.0 - f) * a.t + f * b.t,
                )
            frame_poses[i] = se3.SE3(
                jnp.array(pose.q, jnp.float32), jnp.array(pose.t, jnp.float32)
            )

    video = RGBDVideo(
        base_path=path,
        color_paths=color_paths,
        depth_paths=depth_paths,
        timestamps=timestamps,
        camera=camera,
        poses=frame_poses,
    )
    if video.depth_paths and video.depth_paths[0] == first_depth_path:
        video._depth_cache[0] = first

    if src is not None:
        video.undistortion_map = src.undistortion_map(camera)
    return video


def save_tum_trajectory(path: str, timestamps, poses) -> None:
    """Write poses in TUM format (SavePoses analog, io.cc) for ETH3D
    benchmark submission via --export_poses."""
    with open(path, "w") as f:
        for ts, pose in zip(timestamps, poses):
            if pose is None:
                continue
            q = np.asarray(pose.q, np.float64)
            t = np.asarray(pose.t, np.float64)
            f.write(
                f"{ts} {t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]}\n"
            )
