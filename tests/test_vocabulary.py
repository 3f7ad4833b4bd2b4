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
