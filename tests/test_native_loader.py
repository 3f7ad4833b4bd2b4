"""Native C++ PNG loader vs OpenCV golden test."""

import numpy as np
import pytest

from badslam_tpu.io import native_loader


@pytest.mark.skipif(not native_loader.available(),
                    reason="native loader not built (native/build.sh)")
def test_native_png_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)

    depth = rng.integers(0, 65535, (48, 64), dtype=np.uint16)
    dpath = str(tmp_path / "d.png")
    cv2.imwrite(dpath, depth)
    out = native_loader.read_png(dpath)
    np.testing.assert_array_equal(out, depth)
    assert out.dtype == np.uint16

    rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    cpath = str(tmp_path / "c.png")
    cv2.imwrite(cpath, rgb[..., ::-1])  # cv2 writes BGR
    out = native_loader.read_png(cpath)
    np.testing.assert_array_equal(out, rgb)


@pytest.mark.skipif(not native_loader.available(),
                    reason="native loader not built")
def test_native_prefetch_loader(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    paths, imgs = [], []
    for i in range(6):
        img = rng.integers(0, 65535, (32, 40), dtype=np.uint16)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        imgs.append(img)
    loader = native_loader.NativePrefetchLoader(paths, ring=3)
    for i in range(6):
        np.testing.assert_array_equal(loader.get(i), imgs[i])
    loader.close()
