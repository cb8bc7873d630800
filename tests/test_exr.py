"""EXR codec roundtrip tests (HALF/FLOAT x none/zip/zips, RGB/RGBA,
non-multiple-of-16 heights)."""

import numpy as np
import pytest

from esrnerf_tpu.utils import exr

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("half", [True, False])
@pytest.mark.parametrize("compression", ["none", "zip", "zips"])
@pytest.mark.parametrize("shape", [(33, 17, 3), (16, 16, 4), (5, 64, 3)])
def test_roundtrip(tmp_path, half, compression, shape):
    rng = np.random.default_rng(0)
    img = (rng.gamma(2.0, 1.0, size=shape)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.imwrite(p, img, half=half, compression=compression)
    back = exr.imread(p)
    assert back.shape == img.shape
    if half:
        np.testing.assert_allclose(back, img.astype(np.float16), rtol=1e-3, atol=1e-3)
    else:
        np.testing.assert_array_equal(back, img)


def test_hdr_range_survives(tmp_path):
    img = np.array([[[0.0, 1.0, 1000.0], [1e-4, 5.5, 0.25]]], np.float32)
    p = str(tmp_path / "hdr.exr")
    exr.imwrite(p, img, half=False, compression="zip")
    np.testing.assert_array_equal(exr.imread(p), img)


def test_rejects_non_exr(tmp_path):
    p = str(tmp_path / "x.exr")
    open(p, "wb").write(b"not an exr at all")
    with pytest.raises(ValueError):
        exr.imread(p)
