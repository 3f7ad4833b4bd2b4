"""Generic kernel autotuner: persisted store, variant timing, and the
bilateral implementation selection consumed by preprocess_frame."""

import numpy as np

from badslam_tpu.ops import autotune as tuner


def test_autotune_picks_faster_variant(tmp_path, monkeypatch):
    monkeypatch.setattr(tuner, "_TUNING_PATH",
                        str(tmp_path / "tuning.json"))
    import time

    calls = {"slow": 0, "fast": 0}

    def slow():
        calls["slow"] += 1
        time.sleep(0.01)
        return np.zeros(1)

    def fast():
        calls["fast"] += 1
        return np.zeros(1)

    best = tuner.autotune("dummy", {"slow": slow, "fast": fast},
                          iterations=3)
    assert best == "fast"
    assert calls["fast"] >= 4  # warmup + iterations
    assert tuner.get(tuner.backend_key("dummy")) == "fast"


def test_autotune_skips_raising_variants(tmp_path, monkeypatch):
    monkeypatch.setattr(tuner, "_TUNING_PATH",
                        str(tmp_path / "tuning.json"))

    def boom():
        raise RuntimeError("unsupported")

    best = tuner.autotune("dummy2", {"boom": boom, "ok": lambda: 1},
                          iterations=2)
    assert best == "ok"


def test_bilateral_impl_selection_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(tuner, "_TUNING_PATH",
                        str(tmp_path / "tuning.json"))
    from badslam_tpu.ops.pallas_kernels import (
        autotune_preprocess,
        tuned_bilateral_impl,
        tuned_block_height,
    )

    assert tuned_bilateral_impl(24, 32) is None  # untuned
    autotune_preprocess(24, 32)
    choice = tuned_bilateral_impl(24, 32)
    assert choice in (True, False)
    # Block height: persisted <= h when the Pallas kernel compiles on this
    # backend/shape; otherwise every candidate was skipped and the default
    # stands (the impl choice then records the XLA fallback as fastest).
    bh = tuned_block_height(24, 32)
    assert bh <= 24 or (bh == 64 and choice is False)
