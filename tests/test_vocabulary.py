"""Binary BoW vocabulary + inverted-index database tests (DBoW2 analog,
/root/reference/applications/badslam/third_party/DBoW2)."""

import numpy as np
import pytest

from badslam_tpu.loop.vocabulary import (
    BinaryVocabulary,
    BowDatabase,
    bow_vector,
    hamming_matrix,
    l1_score,
)

import synthetic


def random_descriptors(rng, n):
    return rng.integers(0, 256, (n, 32), dtype=np.uint8)


def perturb(rng, desc, bits=8):
    """Flip `bits` random bits per descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(bits):
            b = rng.integers(0, 256)
            out[i, b // 8] ^= np.uint8(1 << (b % 8))
    return out


def test_vocabulary_quantize_consistency():
    rng = np.random.default_rng(0)
    corpus = random_descriptors(rng, 4096)
    vocab = BinaryVocabulary.train(corpus, k=16, iters=3)
    assert vocab.num_words == 256

    words = vocab.quantize(corpus[:256])
    assert words.shape == (256,)
    assert (words >= 0).all() and (words < vocab.num_words).all()
    # Identical descriptors map to identical words; mildly perturbed ones
    # usually stay in the same word (that's the whole point of BoW).
    again = vocab.quantize(corpus[:256])
    assert (words == again).all()
    near = vocab.quantize(perturb(rng, corpus[:256], bits=4))
    assert (near == words).mean() > 0.5


def test_vocabulary_save_load(tmp_path):
    rng = np.random.default_rng(1)
    corpus = random_descriptors(rng, 2048)
    vocab = BinaryVocabulary.train(corpus, k=8, iters=3)
    p = str(tmp_path / "vocab.npz")
    vocab.save(p)
    loaded = BinaryVocabulary.load(p)
    q = random_descriptors(rng, 100)
    assert (vocab.quantize(q) == loaded.quantize(q)).all()


def test_database_query_matches_bruteforce():
    rng = np.random.default_rng(2)
    corpus = random_descriptors(rng, 4096)
    vocab = BinaryVocabulary.train(corpus, k=16, iters=3)
    db = BowDatabase(vocab)
    kf_desc = {i: random_descriptors(rng, 120) for i in range(30)}
    for i, d in kf_desc.items():
        db.add(i, d)

    query = kf_desc[7]
    qvec = bow_vector(vocab.quantize(query))
    results = dict(db.query(qvec))
    # Inverted-index scores == brute-force L1 scores over stored vectors.
    for i in range(30):
        brute = l1_score(qvec, db.vectors[i])
        if i in results:
            assert abs(results[i] - brute) < 1e-9
        else:
            assert brute == 0.0
    # Self-similarity dominates.
    assert max(results, key=results.get) == 7
    assert results[7] > 0.99


def test_database_remove_and_replace():
    rng = np.random.default_rng(3)
    vocab = BinaryVocabulary.train(random_descriptors(rng, 2048), k=8,
                                   iters=2)
    db = BowDatabase(vocab)
    d0 = random_descriptors(rng, 50)
    db.add(0, d0)
    db.add(1, random_descriptors(rng, 50))
    db.remove(0)
    assert 0 not in db.vectors
    res = db.query(bow_vector(vocab.quantize(d0)))
    assert all(kf != 0 for kf, _ in res)
    # Recycled slot: re-add under the same id replaces cleanly.
    d0b = random_descriptors(rng, 50)
    db.add(0, d0b)
    res = dict(db.query(bow_vector(vocab.quantize(d0b))))
    assert res[0] > 0.99


def test_query_cost_scales_with_postings_not_keyframes():
    """The shortlist is O(shared postings), not O(K): querying a keyframe
    disjoint in word space from most of the database touches only the few
    keyframes that share words (the round-1 implementation rescanned all K
    with full histogram recomputation)."""
    rng = np.random.default_rng(4)
    corpus = random_descriptors(rng, 8192)
    vocab = BinaryVocabulary.train(corpus, k=16, iters=3)
    db = BowDatabase(vocab)

    # 200 keyframes sharing one descriptor pool; 5 from a disjoint pool.
    pool_a = corpus[:1024]
    pool_b = ~corpus[4096:4196]  # complemented bits: far from pool_a
    for i in range(200):
        db.add(i, pool_a[rng.choice(1024, 80, replace=False)])
    for i in range(200, 205):
        db.add(i, pool_b[rng.choice(100, 80, replace=False)])

    qvec = bow_vector(vocab.quantize(pool_b[:80]))
    results = db.query(qvec)
    scored = {kf for kf, _ in results}
    # Scores exist for the 5 same-pool keyframes; the 200 other keyframes
    # are mostly never touched, and postings touched << K * words.
    assert all(kf in scored for kf in range(200, 205))
    best = results[0]
    assert best[0] >= 200
    full_scan_cost = len(db.vectors) * len(qvec)
    assert db.last_postings_touched < 0.3 * full_scan_cost


def test_detector_revisit_closes(tmp_path):
    """Synthetic revisit: textured keyframes move away and come back; the
    vocabulary-based detector must shortlist the original view."""
    pytest.importorskip("cv2")
    from badslam_tpu.loop.detector import LoopDetector

    rng = np.random.default_rng(5)
    cam = synthetic.default_camera(320, 240)

    def textured(seed):
        r = np.random.default_rng(seed)
        img = r.uniform(0.1, 0.9, (240 // 8, 320 // 8))
        return (np.kron(img, np.ones((8, 8))) * 255).astype(np.uint8)

    depth = np.full((240, 320), 2.0, np.float32)
    det = LoopDetector(cam=cam, recent_window=4, temporal_consistency=1,
                       train_after=6)
    det.add_keyframe(textured(0), depth, kf_id=0)
    for i in range(1, 9):
        det.add_keyframe(textured(i), depth, kf_id=i)
    # Keyframe 9 revisits keyframe 0's view.
    det.add_keyframe(textured(0), depth, kf_id=9)
    assert det.detect_candidate(9) == 0


def test_detector_recency_window_excludes_early_keyframes():
    """Regression: while fewer than `recent_window` keyframes exist, NO
    candidate may be returned — a negative slice index used to wrap and
    make the most recent keyframes eligible, so near-identical adjacent
    keyframes self-matched during the first window (DLoopDetector's
    dislocal exclusion, TemplatedLoopDetector.h:562)."""
    pytest.importorskip("cv2")
    from badslam_tpu.loop.detector import LoopDetector

    cam = synthetic.default_camera(320, 240)
    depth = np.full((240, 320), 2.0, np.float32)
    tex = _blob_texture(np.random.default_rng(3))
    det = LoopDetector(cam=cam, recent_window=10, temporal_consistency=1,
                       train_after=4)
    # Identical images: maximal BoW scores — the recency window is the
    # only thing standing between them and a (false) self-match.
    for i in range(9):
        det.add_keyframe(tex, depth, kf_id=i)
        assert det.detect_candidate(i) is None, (
            f"kf {i}: candidate within the recency window")


def _blob_texture(rng, h=240, w=320, block=8):
    img = rng.uniform(0.2, 0.8, (h // block, w // block))
    img = np.kron(img, np.ones((block, block)))
    return (img * 255).astype(np.uint8)


def test_train_vocabulary_tool_and_pretrained_path(tmp_path):
    """tools/train_vocabulary.py trains from an image directory and the
    resulting .npz drives detection through
    BadSlamConfig.loop_detection_vocabulary_path (loop_detector.cc:97-187:
    the reference loads its pre-trained DBoW2 vocabulary the same way)."""
    cv2 = pytest.importorskip("cv2")
    import os
    import sys

    sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..", "tools")]
    import train_vocabulary as tv

    rng = np.random.default_rng(3)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(6):
        cv2.imwrite(str(img_dir / f"{i:03d}.png"), _blob_texture(rng))
    vocab_path = str(tmp_path / "vocab.npz")
    tv.train_vocabulary([str(img_dir)], vocab_path, k=8, iters=3,
                        frame_stride=1, quiet=True)
    vocab = BinaryVocabulary.load(vocab_path)
    assert vocab.num_words == 64

    # A pretrained detector indexes keyframes immediately (no on-the-fly
    # training threshold) and detects a same-place revisit.
    from badslam_tpu.loop.detector import LoopDetector

    cam = synthetic.default_camera(320, 240)
    depth = np.full((240, 320), 2.0, np.float32)
    det = LoopDetector(cam=cam, vocabulary_path=vocab_path,
                       recent_window=2, temporal_consistency=1)
    assert det._db is not None  # pretrained: live from keyframe 0
    place = _blob_texture(np.random.default_rng(77))
    det.add_keyframe(place, depth)                       # 0
    for s in range(3):
        det.add_keyframe(_blob_texture(np.random.default_rng(100 + s)),
                         depth)                          # 1..3
    kf = det.add_keyframe(place, depth)                  # 4: revisit
    assert det.detect_candidate(kf) == 0


def test_pretrained_vs_onfly_recall_precision(tmp_path):
    """Perceptual aliasing: places share half their texture. Measures
    detection recall/precision for the pretrained-vocabulary mode vs the
    on-the-fly mode on the same revisiting sequence (round-2 verdict:
    loop-detection quality knobs untested under aliasing)."""
    cv2 = pytest.importorskip("cv2")
    import os
    import sys

    sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..", "tools")]
    import train_vocabulary as tv

    h, w = 240, 320
    cam = synthetic.default_camera(w, h)
    depth = np.full((h, w), 2.0, np.float32)

    # 8 places; the top half of every place is a SHARED texture (aliasing),
    # the bottom half is place-specific.
    shared = _blob_texture(np.random.default_rng(1000))[: h // 2]
    places = []
    for i in range(8):
        own = _blob_texture(np.random.default_rng(2000 + i))[h // 2:]
        places.append(np.concatenate([shared, own], axis=0))

    # Offline corpus from DIFFERENT textures (generalization, like the
    # reference's vocabulary trained on unrelated imagery).
    img_dir = tmp_path / "corpus"
    img_dir.mkdir()
    rng = np.random.default_rng(4)
    for i in range(8):
        cv2.imwrite(str(img_dir / f"{i:03d}.png"), _blob_texture(rng))
    vocab_path = str(tmp_path / "vocab.npz")
    tv.train_vocabulary([str(img_dir)], vocab_path, k=16, iters=4,
                        frame_stride=1, quiet=True)

    from badslam_tpu.loop.detector import LoopDetector

    def run(vocabulary_path: str):
        det = LoopDetector(cam=cam, vocabulary_path=vocabulary_path,
                           recent_window=4, temporal_consistency=1,
                           train_after=8)
        for i in range(8):
            det.add_keyframe(places[i], depth, kf_id=i)
        correct = detected = 0
        for j in range(4):  # revisit places 0..3
            kf = det.add_keyframe(places[j], depth, kf_id=8 + j)
            cand = det.detect_candidate(kf)
            if cand is not None:
                detected += 1
                correct += int(cand == j)
        recall = correct / 4.0
        precision = correct / detected if detected else 1.0
        return recall, precision

    r_pre, p_pre = run(vocab_path)
    r_fly, p_fly = run("")
    print(f"pretrained recall={r_pre} precision={p_pre}; "
          f"on-the-fly recall={r_fly} precision={p_fly}")
    assert r_pre >= 0.75, (r_pre, p_pre)
    assert p_pre >= 0.75, (r_pre, p_pre)
    # The pretrained vocabulary must not underperform the 8-keyframe
    # on-the-fly one under aliasing.
    assert r_pre >= r_fly and p_pre >= p_fly, (
        (r_pre, p_pre), (r_fly, p_fly))
