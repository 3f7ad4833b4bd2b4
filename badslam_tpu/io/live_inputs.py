"""Live RGB-D inputs: capture threads feeding a growing RGBDVideo.

Rebuild of the reference's live-input layer
(/root/reference/applications/badslam/src/badslam/input_realsense.{h,cc},
input_azurekinect.{h,cc}, input_structure.{h,cc}): each input has
``start(&rgbd_video, depth_scaling)`` + a background thread that pushes
frames into the video while the SLAM loop consumes them.

Two inputs have REAL capture logic in this environment:

  * `DirectoryInput` — follows a directory that a camera process writes
    ``depth/*.png`` + ``rgb/*.png`` pairs into (the common file-drop
    staging idiom); frames are picked up as they appear, ordered by
    filename. A file named ``end`` marks end-of-stream.
  * `TCPInput` — accepts a length-prefixed binary frame stream on a TCP
    socket (header: magic, width, height, intrinsics, timestamp; payload:
    u16 depth + u8 RGB). `send_frame` is the matching client encoder.

The vendor-SDK inputs (RealSense / Azure Kinect / Structure) share the
same machinery but raise at start() when their SDK is absent — exactly
the reference's no-op stub classes compiled without the SDK
(input_realsense.h:94-103).
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time
from typing import List, Optional, Tuple

import numpy as np

from badslam_tpu.geometry.camera import PinholeCamera


class LiveRGBDVideo:
    """RGBDVideo-shaped growing frame container fed by an input thread.

    `__len__` is the static CAPACITY (max_frames) so BadSlam can size its
    static-shape trajectory buffers up front; `received` is the number of
    frames actually captured so far. The SLAM loop calls
    `wait_for_frame(i)` which blocks until frame i exists or the stream
    ends."""

    def __init__(self, camera: PinholeCamera, max_frames: int = 10000):
        self.camera = camera
        self.depth_camera = camera
        self._max_frames = max_frames
        self._depths: List[np.ndarray] = []
        self._rgbs: List[np.ndarray] = []
        self.timestamps: List[float] = []
        self.poses: List[Optional[object]] = []
        self._cv = threading.Condition()
        self._ended = False

    def __len__(self) -> int:
        return self._max_frames

    @property
    def received(self) -> int:
        with self._cv:
            return len(self._depths)

    # -- producer side (capture thread) --

    def push(self, timestamp: float, depth_u16: np.ndarray,
             rgb_u8: np.ndarray) -> bool:
        """Append one frame; returns False when capacity is exhausted."""
        with self._cv:
            if self._ended or len(self._depths) >= self._max_frames:
                return False
            self._depths.append(depth_u16)
            self._rgbs.append(rgb_u8)
            self.timestamps.append(timestamp)
            self.poses.append(None)
            self._cv.notify_all()
            return True

    def end_stream(self) -> None:
        with self._cv:
            self._ended = True
            self._cv.notify_all()

    # -- consumer side (SLAM loop) --

    def wait_for_frame(self, i: int, timeout: Optional[float] = None) -> bool:
        """Block until frame i is available; False on stream end/timeout."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cv:
            while len(self._depths) <= i:
                if self._ended or i >= self._max_frames:
                    return False
                remaining = (None if deadline is None
                             else deadline - time.monotonic())
                if remaining is not None and remaining <= 0:
                    return False
                self._cv.wait(remaining if remaining is not None else 0.5)
            return True

    def depth_u16(self, i: int) -> np.ndarray:
        with self._cv:
            return self._depths[i]

    def color_u8(self, i: int) -> np.ndarray:
        with self._cv:
            return self._rgbs[i]

    def set_pose(self, i: int, pose) -> None:
        self.poses[i] = pose

    def clear_frame(self, i: int) -> None:
        """Release a consumed frame's image memory (ClearImageAndDerivedData
        analog, main.cc:753-754) — live frames are not reloadable."""
        with self._cv:
            self._depths[i] = _EMPTY_U16
            self._rgbs[i] = _EMPTY_U8


_EMPTY_U16 = np.zeros((0, 0), np.uint16)
_EMPTY_U8 = np.zeros((0, 0, 3), np.uint8)


class LiveInputBase:
    """Start/stop + capture-thread lifecycle shared by all inputs."""

    name = "unknown"

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.video: Optional[LiveRGBDVideo] = None

    # subclasses: return the camera (probed from the device/stream).
    def _open(self) -> PinholeCamera:
        raise NotImplementedError

    # subclasses: block for one frame; None = end of stream.
    def _grab(self) -> Optional[Tuple[float, np.ndarray, np.ndarray]]:
        raise NotImplementedError

    def _close(self) -> None:
        pass

    def start(self, max_frames: int = 10000,
              depth_scaling: float = 5000.0) -> LiveRGBDVideo:
        """Open the source and launch the capture thread
        (Start(&rgbd_video, &depth_scaling) analog); returns the growing
        video the SLAM loop should consume."""
        camera = self._open()
        self._depth_scaling = depth_scaling
        self.video = LiveRGBDVideo(camera, max_frames)
        self._thread = threading.Thread(
            target=self._capture_loop, name=f"{self.name}-capture",
            daemon=True)
        self._thread.start()
        return self.video

    def _capture_loop(self) -> None:
        try:
            while not self._stop.is_set():
                item = self._grab()
                if item is None:
                    break
                ts, depth, rgb = item
                if not self.video.push(ts, depth, rgb):
                    break
        finally:
            self.video.end_stream()
            self._close()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)


class DirectoryInput(LiveInputBase):
    """Follow a directory a camera process drops frames into.

    Layout: ``<path>/calibration.txt`` (fx fy cx cy), ``depth/*.png``
    (u16) + ``rgb/*.png`` pairs matched by filename, picked up in sorted
    filename order as they appear. A file named ``end`` ends the stream.
    Timestamps come from the numeric part of the filename when present
    (e.g. 13.250.png), else the file mtime."""

    name = "DirectoryInput"

    def __init__(self, path: str, poll_interval: float = 0.02):
        super().__init__()
        self.path = path
        self.poll = poll_interval
        self._consumed: set = set()

    def _open(self) -> PinholeCamera:
        import cv2

        calib = os.path.join(self.path, "calibration.txt")
        deadline = time.monotonic() + 10.0
        while not os.path.exists(calib):
            if time.monotonic() > deadline:
                raise RuntimeError(f"no calibration.txt in {self.path}")
            time.sleep(self.poll)
        with open(calib) as f:
            fx, fy, cx, cy = (float(v) for v in f.readline().split()[:4])
        # Probe the first depth frame for the image size.
        first = self._wait_for_pair()
        if first is None:
            raise RuntimeError(f"stream in {self.path} ended before the "
                               "first frame")
        self._pending = first
        d = cv2.imread(first[1], cv2.IMREAD_UNCHANGED)
        h, w = d.shape[:2]
        return PinholeCamera(fx=fx, fy=fy, cx=cx, cy=cy, width=w, height=h)

    def _list_ready(self) -> List[Tuple[str, str, str]]:
        """Sorted (name, depth_path, rgb_path) pairs present in BOTH dirs
        and not yet consumed."""
        ddir = os.path.join(self.path, "depth")
        cdir = os.path.join(self.path, "rgb")
        if not (os.path.isdir(ddir) and os.path.isdir(cdir)):
            return []
        dnames = set(os.listdir(ddir))
        cnames = set(os.listdir(cdir))
        ready = sorted(dnames & cnames - self._consumed)
        return [(n, os.path.join(ddir, n), os.path.join(cdir, n))
                for n in ready if n not in self._consumed]

    def _wait_for_pair(self):
        while not self._stop.is_set():
            ready = self._list_ready()
            if ready:
                name, dp, cp = ready[0]
                self._consumed.add(name)
                return name, dp, cp
            if os.path.exists(os.path.join(self.path, "end")):
                # Late files may still have landed with the sentinel.
                ready = self._list_ready()
                if not ready:
                    return None
                continue
            time.sleep(self.poll)
        return None

    def _grab(self):
        import cv2

        if getattr(self, "_pending", None) is not None:
            name, dp, cp = self._pending
            self._pending = None
        else:
            item = self._wait_for_pair()
            if item is None:
                return None
            name, dp, cp = item
        # A file can be listed while the producer is still writing it —
        # cv2 returns None for a partial PNG; retry until both decode.
        depth = rgb = None
        deadline = time.monotonic() + 10.0
        while time.monotonic() < deadline and not self._stop.is_set():
            depth = cv2.imread(dp, cv2.IMREAD_UNCHANGED)
            rgb = cv2.imread(cp, cv2.IMREAD_COLOR)
            if depth is not None and rgb is not None:
                break
            time.sleep(self.poll)
        if depth is None or rgb is None:
            return None
        stem = os.path.splitext(name)[0]
        try:
            ts = float(stem)
        except ValueError:
            ts = os.path.getmtime(dp)
        return (ts, depth.astype(np.uint16),
                np.ascontiguousarray(rgb[..., ::-1]))  # BGR -> RGB


_TCP_MAGIC = b"BDSF"
_TCP_HEADER = struct.Struct("<4sII4fd")  # magic, w, h, fx fy cx cy, ts


def send_frame(sock: socket.socket, timestamp: float,
               depth_u16: np.ndarray, rgb_u8: np.ndarray,
               camera: PinholeCamera) -> None:
    """Client-side encoder matching TCPInput's wire format."""
    h, w = depth_u16.shape
    sock.sendall(_TCP_HEADER.pack(_TCP_MAGIC, w, h, camera.fx, camera.fy,
                                  camera.cx, camera.cy, timestamp))
    sock.sendall(np.ascontiguousarray(depth_u16, np.uint16).tobytes())
    sock.sendall(np.ascontiguousarray(rgb_u8, np.uint8).tobytes())


class TCPInput(LiveInputBase):
    """Binary RGB-D frame stream over TCP (one producer connection).

    Wire format per frame: `<4sII4fd` header (magic "BDSF", width,
    height, fx fy cx cy, timestamp) followed by width*height u16 depth
    and width*height*3 u8 RGB. Stream ends when the peer closes."""

    name = "TCPInput"

    def __init__(self, port: int = 0, host: str = "127.0.0.1"):
        super().__init__()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._conn: Optional[socket.socket] = None
        self._first_header = None

    def _recv_exact(self, n: int) -> Optional[bytes]:
        buf = b""
        while len(buf) < n:
            chunk = self._conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def _read_frame(self):
        raw = self._recv_exact(_TCP_HEADER.size)
        if raw is None:
            return None
        magic, w, h, fx, fy, cx, cy, ts = _TCP_HEADER.unpack(raw)
        if magic != _TCP_MAGIC:
            raise RuntimeError("TCPInput: bad frame magic")
        dbuf = self._recv_exact(w * h * 2)
        cbuf = self._recv_exact(w * h * 3)
        if dbuf is None or cbuf is None:
            return None
        depth = np.frombuffer(dbuf, np.uint16).reshape(h, w)
        rgb = np.frombuffer(cbuf, np.uint8).reshape(h, w, 3)
        cam = PinholeCamera(fx=fx, fy=fy, cx=cx, cy=cy, width=w, height=h)
        return ts, depth, rgb, cam

    def _open(self) -> PinholeCamera:
        self._srv.settimeout(30.0)
        self._conn, _ = self._srv.accept()
        first = self._read_frame()
        if first is None:
            raise RuntimeError("TCPInput: stream ended before first frame")
        ts, depth, rgb, cam = first
        self._first_header = (ts, depth, rgb)
        return cam

    def _grab(self):
        if self._first_header is not None:
            item = self._first_header
            self._first_header = None
            return item
        frame = self._read_frame()
        if frame is None:
            return None
        ts, depth, rgb, _ = frame
        return ts, depth, rgb

    def _close(self) -> None:
        try:
            if self._conn is not None:
                self._conn.close()
            self._srv.close()
        except OSError:
            pass


class _SDKInputBase(LiveInputBase):
    """Vendor-SDK inputs: same thread machinery, SDK-gated open
    (the reference compiles no-op stubs without the SDK).

    `config` (a BadSlamConfig or None) carries the vendor parameters
    (k4a_* / structure_*, bad_slam_config.h:287-366); each subclass
    extracts its own set in `_sdk_options` so a present SDK receives the
    full reference-parity configuration."""

    # config fields this input consumes (name parity with the reference).
    CONFIG_FIELDS: Tuple[str, ...] = ()

    def __init__(self, config=None):
        super().__init__()
        self.config = config

    def _sdk_options(self) -> dict:
        """Vendor parameters from the config (defaults when absent)."""
        if self.config is None:
            from badslam_tpu.config import BadSlamConfig

            self.config = BadSlamConfig()
        return {f: getattr(self.config, f) for f in self.CONFIG_FIELDS}

    def _import_sdk(self):
        raise NotImplementedError

    def _open(self) -> PinholeCamera:
        opts = self._sdk_options()
        try:
            self._sdk = self._import_sdk()
        except ImportError as e:
            raise RuntimeError(
                f"{self.name} support requires its SDK, which is not "
                f"installed in this environment (the reference behaves the "
                f"same when compiled without the SDK): {e}"
            ) from e
        raise NotImplementedError(
            f"{self.name}: device binding requires the vendor SDK runtime "
            f"(configured options: {opts})")


class RealSenseInputThread(_SDKInputBase):
    """Intel RealSense D400-series input (input_realsense.cc analog).
    The reference exposes no realsense-specific config parameters."""

    name = "RealSense"

    def _import_sdk(self):
        import pyrealsense2  # noqa: F401

        return pyrealsense2


class K4AInputThread(_SDKInputBase):
    """Azure Kinect input incl. .mkv recording (input_azurekinect.cc;
    parameters wired as in input_azurekinect.cc's Start: depth mode, fps,
    color resolution, downscale factor, IR-as-color, exposure, record
    path)."""

    name = "AzureKinect"
    CONFIG_FIELDS = ("k4a_mode", "k4a_fps", "k4a_resolution", "k4a_factor",
                     "k4a_use_ir", "k4a_exposure", "k4a_record_path")

    def _import_sdk(self):
        import pyk4a  # noqa: F401

        return pyk4a


class StructureInputThread(_SDKInputBase):
    """Occipital Structure Core input (input_structure.cc analog;
    parameters per input_structure.cc's sensor configuration)."""

    name = "StructureCore"
    CONFIG_FIELDS = (
        "structure_depth_range", "structure_depth_only",
        "structure_depth_resolution", "structure_expensive_correction",
        "structure_one_shot_dynamic_calibration",
        "structure_depth_diff_threshold",
        "structure_infrared_auto_exposure",
        "structure_visible_exposure_time")

    def _import_sdk(self):
        raise ImportError("no Python SDK exists for Structure Core")


def open_live_input(spec: str, config=None):
    """CLI dispatch: 'dir:<path>', 'tcp:<port>', 'realsense', 'k4a',
    'structure' (main.cc:511-569 input selection analog). `config`
    supplies the vendor k4a_*/structure_* parameters."""
    if spec.startswith("dir:"):
        return DirectoryInput(spec[4:])
    if spec.startswith("tcp:"):
        return TCPInput(port=int(spec[4:]))
    name = spec.lower()
    if name == "realsense":
        return RealSenseInputThread(config)
    if name in ("k4a", "azurekinect"):
        return K4AInputThread(config)
    if name == "structure":
        return StructureInputThread(config)
    raise ValueError(f"unknown live input '{spec}'")
