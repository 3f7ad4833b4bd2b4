"""Loop detection + closure (host subsystem, device only for verification).

Rebuild of the reference LoopDetector
(/root/reference/applications/badslam/src/badslam/loop_detector.h:154-277,
loop_detector.cc:208-711):

  1. per-keyframe FAST/BRIEF features — here ORB + a binary-word shortlist
     (features.py) instead of DBoW2/DLoopDetector;
  2. candidate shortlisting by bag-of-binary-words score with a recency
     window, plus temporal consistency (k consecutive supporting frames);
  3. descriptor matching + 3D-3D RANSAC initial alignment
     (loop_detector.cc:299-360, OpenGV replaced by ransac.py);
  4. direct-alignment refinement of the relative pose against the matched
     keyframe AND its previous/next neighbors (3 estimates,
     loop_detector.cc:436-548) — runs the device tracker;
  5. consistency gates: ≤10° viewing-direction angle and ≤2 cm translation
     between all refinement pairs (loop_detector.cc:575-604), then pose
     averaging;
  6. necessity test: mean keypoint pixel motion implied by the closure must
     exceed 1 px, else BA can absorb it (loop_detector.cc:624-666);
  7. pose-graph optimization over the odometry chain + the new loop edge,
     then trajectory deformation of the non-keyframes.

Steps 1-3 (feature extraction, BoW shortlisting, RANSAC) are host-side by
design, operating on the dataset's own numpy images — as in the reference,
which keeps them off the GPU. Steps 4-7 are READ-FREE device programs:
the 3-way refinement runs the device tracker and the gates + pose graph +
pose/trajectory application are one masked device program
(loop/closure_device.py) — closures happen mid-run, and on the axon
runtime a single device->host read degrades the session ~1000x
(PERF_NOTES.md), so nothing here reads device values.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from badslam_tpu.geometry import se3_np as s3
from badslam_tpu.loop.features import (
    KeyframeFeatures,
    extract_features,
    match_descriptors,
    match_descriptors_by_word,
)
from badslam_tpu.loop.ransac import ransac_point_cloud_alignment
from badslam_tpu.loop.vocabulary import (
    BinaryVocabulary,
    BowDatabase,
    l1_score,
)

def average_poses(poses: List[s3.SE3]) -> s3.SE3:
    """AveragePose analog (util.h:46): mean translation + normalized mean
    quaternion (consistent hemispheres)."""
    t = np.mean([np.asarray(p.t, float) for p in poses], axis=0)
    q0 = np.asarray(poses[0].q, float)
    qs = []
    for p in poses:
        q = np.asarray(p.q, float)
        qs.append(q if q @ q0 >= 0 else -q)
    q = np.mean(qs, axis=0)
    return s3.SE3(q / np.linalg.norm(q), t)


@dataclass
class LoopDetector:
    """Feature database + detection pipeline. Images arrive as HOST arrays
    (the dataset's own numpy data) so nothing is read back from the device.
    """

    cam: object                       # host PinholeCamera
    recent_window: int = 10           # exclude this many recent keyframes
    min_score: float = 0.3            # DLoopDetector alpha (vs eta norm)
    min_matches: int = 25
    # Consecutive supporting detections before the geometric check runs
    # (DLoopDetector's k; the reference runs the default k=3,
    # TemplatedLoopDetector.h:170-172). Also the main throttle on the
    # expensive per-candidate work: with k=1 the round-3 long-run billed a
    # full match+RANSAC (and often a 3-tracker closure attempt) for every
    # self-similar-texture false positive.
    temporal_consistency: int = 3
    max_features: int = 500
    vocabulary_path: str = ""         # pre-trained vocabulary (.npz); empty
                                      # -> train on the fly from the sequence
    train_after: int = 8              # keyframes before on-the-fly training
    images_size: Optional[Tuple[int, int]] = None  # (w, h) detection resize
    # Detection-image frequency [Hz]; > 0 derives the recency window as
    # DLoopDetector does (dislocal = 20 s * f, TemplatedLoopDetector.h:562).
    image_frequency: float = 0.0

    # Keyframe features keyed by SLOT id (slots are recycled after keyframe
    # merging, so ids are not temporal); `_order` tracks registration
    # (temporal) order.
    features: Dict[int, KeyframeFeatures] = field(default_factory=dict)
    _order: List[int] = field(default_factory=list)
    _consistent_streak: int = 0
    _last_candidate: int = -1
    _vocab: Optional[BinaryVocabulary] = None
    _db: Optional[BowDatabase] = None
    # DEBUG_LOCKING analog (direct_ba.h:47,231-249): when a detection
    # thread claims ownership, every state-touching call asserts it runs
    # on that thread. Active under __debug__ (cf. the reference's
    # debug-build-only CHECK(!mutex.try_lock()) assertions).
    _owner_thread: Optional[int] = None

    def claim_thread_ownership(self) -> None:
        """Called from the owning (detection) thread; from then on all
        detector state access must happen on that thread."""
        import threading

        self._owner_thread = threading.get_ident()

    def _check_owner(self) -> None:
        if __debug__ and self._owner_thread is not None:
            import threading

            assert threading.get_ident() == self._owner_thread, (
                "LoopDetector state accessed off its owning detection "
                "thread (DEBUG_LOCKING analog) — route the call through "
                "LoopDetectionThread's work queue"
            )

    def __post_init__(self):
        if self.image_frequency > 0:
            self.recent_window = max(1, int(round(20.0 * self.image_frequency)))
        if self.vocabulary_path:
            self._vocab = BinaryVocabulary.load(self.vocabulary_path)
            self._db = BowDatabase(self._vocab)
        if self.images_size is not None:
            w, h = self.images_size
            if w == self.cam.width and h == self.cam.height:
                self.images_size = None

    def _detection_inputs(self, gray_u8, depth):
        """Optionally resize to loop_detection_images_width/height
        (reference: LoopDetector ctor scales images + intrinsics)."""
        if self.images_size is None:
            return gray_u8, depth, self.cam
        import cv2

        w, h = self.images_size
        gray = cv2.resize(gray_u8, (w, h), interpolation=cv2.INTER_AREA)
        dep = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
        return gray, dep, self.cam.scaled(w / self.cam.width)

    def _train_vocabulary(self) -> None:
        """On-the-fly vocabulary: train from the keyframes seen so far,
        then (re)index all of them."""
        desc = np.concatenate(
            [self.features[i].descriptors for i in self._order
             if len(self.features[i].descriptors)] or
            [np.zeros((0, 32), np.uint8)]
        )
        if len(desc) < 64:
            return
        self._vocab = BinaryVocabulary.train(desc, k=32, iters=4)
        self._db = BowDatabase(self._vocab)
        for i in self._order:
            self._db.add(i, self.features[i].descriptors)

    def add_keyframe(
        self, gray_u8: np.ndarray, depth: np.ndarray, kf_id: int = None,
    ) -> int:
        """Register a keyframe's features under slot `kf_id` (defaults to
        the next sequential id); returns the id."""
        self._check_owner()
        if kf_id is None:
            kf_id = max(self.features, default=-1) + 1
        if kf_id in self.features:  # recycled slot: drop the old entry
            self._order.remove(kf_id)
        gray_u8, depth, det_cam = self._detection_inputs(gray_u8, depth)
        self.features[kf_id] = extract_features(
            gray_u8, depth, det_cam, self.max_features
        )
        self._order.append(kf_id)
        if self._db is not None:
            self._db.add(kf_id, self.features[kf_id].descriptors)
        elif len(self._order) >= self.train_after:
            self._train_vocabulary()
        return kf_id

    def remove_keyframe(self, kf_id: int) -> None:
        """Forget a merged/deleted keyframe's features."""
        self._check_owner()
        if kf_id in self.features:
            del self.features[kf_id]
            self._order.remove(kf_id)
        if self._db is not None:
            self._db.remove(kf_id)
        if self._last_candidate == kf_id:
            self._last_candidate = -1
            self._consistent_streak = 0

    def _temporal_pos(self, kf_id: int) -> int:
        return self._order.index(kf_id)

    # ------------------------------------------------------------------

    def detect_candidate(self, kf_id: int) -> Optional[int]:
        """Inverted-index BoW query + temporal consistency; returns a
        matched keyframe id or None (DBoW2 query + DLoopDetector gates).
        Recency is measured in registration order, not slot id."""
        self._check_owner()
        if self._db is None:
            # Detection requested before the training threshold: train now
            # from whatever keyframes exist.
            self._train_vocabulary()
        if self._db is None or kf_id not in self._db.vectors:
            return None
        cur_vec = self._db.vectors[kf_id]
        pos = self._temporal_pos(kf_id)
        # max(0, ...): a bare negative index would wrap the slice and make
        # the most RECENT keyframes eligible during the first `window` ones.
        eligible = set(self._order[: max(0, pos - self.recent_window)])
        if not eligible or not cur_vec:
            return None

        # Normalization score vs the previous keyframe (DLoopDetector eta:
        # expected score of a matching image pair).
        norm = max(
            l1_score(cur_vec,
                     self._db.vectors.get(self._order[pos - 1], {})),
            1e-3,
        )

        results = self._db.query(cur_vec)  # O(postings), already sorted
        best, best_score = -1, 0.0
        for kf, sc in results:
            if kf in eligible:
                best, best_score = kf, sc
                break
        if best < 0 or best_score < self.min_score * norm:
            self._consistent_streak = 0
            self._last_candidate = -1
            return None

        # Temporal consistency: consecutive detections close to each other
        # (in registration order).
        if (self._last_candidate >= 0
                and self._last_candidate in self.features
                and abs(self._temporal_pos(best)
                        - self._temporal_pos(self._last_candidate)) <= 3):
            self._consistent_streak += 1
        else:
            self._consistent_streak = 0
        self._last_candidate = best
        if self._consistent_streak + 1 < self.temporal_consistency:
            return None
        return best

    def initial_alignment(
        self, cur_id: int, matched_id: int,
        rng: Optional[np.random.Generator] = None,
    ) -> Optional[Tuple[s3.SE3, int]]:
        """Descriptor matching + 3D-3D RANSAC. Returns
        (cur_T_matched, inlier count) or None.

        Matching uses the vocabulary direct index when both keyframes are
        indexed (word-bucketed, DBoW2 GEOM_DI analog — an order of
        magnitude fewer Hamming tests per candidate on the 1-core host);
        brute force otherwise."""
        cur = self.features[cur_id]
        old = self.features[matched_id]
        if (self._db is not None and cur_id in self._db.words
                and matched_id in self._db.words):
            pairs = match_descriptors_by_word(
                cur.descriptors, self._db.words[cur_id],
                old.descriptors, self._db.words[matched_id],
                k=self._vocab.k)
        else:
            pairs = match_descriptors(cur.descriptors, old.descriptors)
        if len(pairs) < self.min_matches:
            return None
        a = old.points_local[pairs[:, 1]]   # matched keyframe frame
        b = cur.points_local[pairs[:, 0]]   # current keyframe frame
        pose, inliers = ransac_point_cloud_alignment(
            a, b, threshold=0.05, min_inliers=self.min_matches, rng=rng
        )
        if pose is None:
            return None
        return pose, int(inliers.sum())
