"""Asynchronous loop-detection worker (LoopDetector::DetectionThreadMain
analog, /root/reference/applications/badslam/src/badslam/loop_detector.cc:793-832).

The expensive host-side work — feature extraction, BoW indexing/query, and
RANSAC initial alignment — runs on a worker thread so it overlaps the
device-side tracking of the following frames. Determinism is preserved the
same way the reference preserves it: when the NEXT keyframe arrives, the
frontend waits for all previously enqueued detections before consuming
their results, so closures apply at a fixed point in the frame stream
regardless of thread timing (at worst one keyframe later than the
synchronous path applies them).

All detector state is owned by the worker thread; removals are routed
through the work queue to avoid concurrent mutation.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from badslam_tpu.geometry import se3_np as s3


@dataclass
class DetectionResult:
    kf_id: int
    candidate: Optional[int]
    cur_T_matched: Optional[s3.SE3]   # RANSAC initial alignment
    inliers: int = 0


class LoopDetectionThread:
    def __init__(self, detector):
        self.detector = detector
        self._work: "queue.Queue" = queue.Queue()
        self._results: List[DetectionResult] = []
        self._lock = threading.Lock()
        self._done_seq = -1
        self._next_seq = 0
        self._cv = threading.Condition(self._lock)
        self._thread = threading.Thread(target=self._main, daemon=True)
        self._thread.start()

    # -- producer side (frontend main thread) ---------------------------

    def enqueue(self, kf_id: int, gray_u8: np.ndarray,
                depth: np.ndarray) -> int:
        """Queue a keyframe for detection; returns its sequence number."""
        seq = self._next_seq
        self._next_seq += 1
        self._work.put(("add", seq, kf_id, gray_u8, depth))
        return seq

    def remove(self, kf_id: int) -> None:
        seq = self._next_seq
        self._next_seq += 1
        self._work.put(("remove", seq, kf_id, None, None))

    def wait_through(self, seq: int) -> None:
        """Block until every op with sequence <= seq has been processed."""
        with self._cv:
            while self._done_seq < seq:
                self._cv.wait(timeout=0.1)

    def drain_results(self) -> List[DetectionResult]:
        with self._lock:
            out = self._results
            self._results = []
        return out

    def stop(self) -> None:
        self._work.put(None)
        self._thread.join(timeout=10)

    # -- worker side -----------------------------------------------------

    def _main(self) -> None:
        # DEBUG_LOCKING analog: all detector state is owned by this
        # thread; any direct main-thread access now asserts.
        self.detector.claim_thread_ownership()
        while True:
            item = self._work.get()
            if item is None:
                return
            op, seq, kf_id, gray, depth = item
            try:
                if op == "remove":
                    self.detector.remove_keyframe(kf_id)
                else:
                    # Timed into the shared registry: on a single-core host
                    # this thread's CPU time is stolen from the main
                    # thread's dispatch path, so its magnitude matters even
                    # when the drain barrier never visibly waits.
                    from badslam_tpu.utils.timing import Timing

                    with Timing.time("loop detection (worker thread)"):
                        self.detector.add_keyframe(gray, depth, kf_id=kf_id)
                        candidate = self.detector.detect_candidate(kf_id)
                        result = DetectionResult(kf_id, candidate, None)
                        if candidate is not None:
                            init = self.detector.initial_alignment(
                                kf_id, candidate)
                            if init is not None:
                                result.cur_T_matched, result.inliers = init
                    with self._lock:
                        self._results.append(result)
            except Exception:  # never kill the worker; detection is optional
                import traceback

                traceback.print_exc()
            finally:
                with self._cv:
                    self._done_seq = seq
                    self._cv.notify_all()
