"""Native C++ loader tests: decode parity vs PIL, in-order prefetch."""
import os

import numpy as np
import pytest
from PIL import Image

from uwslam_tpu.io import native


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 255, (32, 48), dtype=np.uint8)
        p = str(d / f"{i:04d}.png")
        Image.fromarray(arr).save(p)
        paths.append((p, arr))
    return paths


needs_native = pytest.mark.skipif(
    not native.available(), reason="native loader not built"
)


@needs_native
class TestNativeDecode:
    def test_png_8bit_matches_pil(self, png_dir):
        for p, arr in png_dir:
            img = native.decode(p)
            np.testing.assert_allclose(img, arr.astype(np.float32))

    def test_png_16bit(self, tmp_path):
        arr = (np.arange(32 * 24, dtype=np.uint16) * 7 % 50000).reshape(24, 32)
        p = str(tmp_path / "d.png")
        Image.fromarray(arr, mode="I;16").save(p)
        img = native.decode(p)
        np.testing.assert_allclose(img, arr.astype(np.float32))

    def test_pgm(self, tmp_path):
        arr = np.arange(16 * 8, dtype=np.uint8).reshape(8, 16)
        p = str(tmp_path / "x.pgm")
        with open(p, "wb") as f:
            f.write(b"P5\n16 8\n255\n")
            f.write(arr.tobytes())
        img = native.decode(p)
        np.testing.assert_allclose(img, arr.astype(np.float32))

    def test_jpeg_close(self, tmp_path):
        arr = np.full((40, 40), 128, np.uint8)
        p = str(tmp_path / "x.jpg")
        Image.fromarray(arr).save(p, quality=95)
        img = native.decode(p)
        assert abs(float(img.mean()) - 128.0) < 3.0

    def test_missing_file(self):
        with pytest.raises(IOError):
            native.decode("/nonexistent/file.png")


@needs_native
class TestNativeLoader:
    def test_in_order_iteration(self, png_dir):
        paths = [p for p, _ in png_dir]
        loader = native.NativeLoader(paths, lookahead=3, threads=2)
        seen = []
        for idx, img in loader:
            seen.append(idx)
            np.testing.assert_allclose(img, png_dir[idx][1].astype(np.float32))
        loader.close()
        assert seen == list(range(len(paths)))

    def test_multiple_threads(self, png_dir):
        paths = [p for p, _ in png_dir] * 4
        loader = native.NativeLoader(paths, lookahead=8, threads=4)
        count = sum(1 for _ in loader)
        loader.close()
        assert count == len(paths)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
