"""Frame preload thread: overlap dataset disk IO with device compute.

Rebuild of PreLoadThread
(/root/reference/applications/badslam/src/badslam/pre_load_thread.h,
pre_load_thread.cc:33-106): while the device processes frame t, a worker
thread decodes frame t+1's PNGs into the RGBDVideo cache, with the same
condition-variable handshake (PreLoad -> WaitUntilDone)."""

from __future__ import annotations

import threading
from typing import Optional


class PreLoadThread:
    def __init__(self, video):
        self.video = video
        self._index: Optional[int] = None
        self._done = True
        self._quit = False
        self._cv = threading.Condition()
        self._thread = threading.Thread(target=self._main, daemon=True)
        self._thread.start()

    def preload(self, index: int) -> None:
        """Request asynchronous load of frame `index`."""
        with self._cv:
            self._index = index
            self._done = False
            self._cv.notify_all()

    def wait_until_done(self) -> None:
        with self._cv:
            while not self._done:
                self._cv.wait()

    def stop(self) -> None:
        with self._cv:
            self._quit = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def _main(self) -> None:
        while True:
            with self._cv:
                while self._done and not self._quit:
                    self._cv.wait()
                if self._quit:
                    return
                index = self._index
            try:
                if index is not None and 0 <= index < len(self.video):
                    self.video.depth_u16(index)
                    self.video.color_u8(index)
            except Exception:
                pass
            with self._cv:
                self._done = True
                self._cv.notify_all()
