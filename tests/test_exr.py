"""EXR/PFM round-trip tests for the pure-Python bitmap layer
(mitsuba3 src/core/bitmap.cpp parity — SURVEY.md §2.3)."""

import numpy as np

from mitsuba_customization_tpu.utils import exr


def _img(h=33, w=47, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 10, (h, w, 3)).astype(np.float32)


def test_exr_roundtrip_zip(tmp_path):
    img = _img()
    p = str(tmp_path / "a.exr")
    exr.write_exr(p, img, compression=exr.ZIP_COMPRESSION)
    out = exr.read_exr(p)
    np.testing.assert_array_equal(out, img)


def test_exr_roundtrip_none(tmp_path):
    img = _img(seed=1)
    p = str(tmp_path / "b.exr")
    exr.write_exr(p, img, compression=exr.NO_COMPRESSION)
    out = exr.read_exr(p)
    np.testing.assert_array_equal(out, img)


def test_exr_roundtrip_zips(tmp_path):
    img = _img(h=17, w=5, seed=2)
    p = str(tmp_path / "c.exr")
    exr.write_exr(p, img, compression=exr.ZIPS_COMPRESSION)
    out = exr.read_exr(p)
    np.testing.assert_array_equal(out, img)


def test_exr_nonmultiple_block_height(tmp_path):
    img = _img(h=35, w=8, seed=3)  # 35 rows: 2 full ZIP blocks + 3 rows
    p = str(tmp_path / "d.exr")
    exr.write_exr(p, img)
    np.testing.assert_array_equal(exr.read_exr(p), img)


def test_predictor_roundtrip():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 1001, dtype=np.uint8).tobytes()
    enc = exr._predictor_encode(data)
    dec = exr._predictor_decode(enc)
    assert dec == data


def test_pfm_roundtrip(tmp_path):
    img = _img(seed=4)
    p = str(tmp_path / "a.pfm")
    exr.write_pfm(p, img)
    np.testing.assert_array_equal(exr.read_pfm(p), img)


def test_write_image_dispatch(tmp_path):
    from mitsuba_customization_tpu.utils.io import read_image, write_image

    img = np.abs(_img(seed=6))
    p = str(tmp_path / "x.exr")
    write_image(p, img)
    np.testing.assert_allclose(read_image(p), img, rtol=1e-6)
