"""Native C++ image pipeline (`native/src/hgs_io.cpp`) vs PIL.

Skipped entirely when the shared library can't be built (no toolchain);
in this image g++/libjpeg/libpng are present so it normally runs.
"""
import os

import numpy as np
import pytest

from horizongs_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native hgs_io not built")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    base = (rng.uniform(0, 255, (97, 123, 3))).astype(np.uint8)
    # smooth it so JPEG error is small
    base = (base.astype(np.float32) * 0.2 +
            np.linspace(0, 200, 123)[None, :, None] * 0.8).astype(np.uint8)
    paths = {}
    Image.fromarray(base).save(d / "rgb.png")
    Image.fromarray(base).save(d / "rgb.jpg", quality=95)
    rgba = np.concatenate([base, rng.integers(0, 255, (97, 123, 1),
                                              dtype=np.uint8)], axis=-1)
    Image.fromarray(rgba).save(d / "rgba.png")
    gray = base[..., 0]
    Image.fromarray(gray).save(d / "gray.png")
    paths["rgb_png"] = str(d / "rgb.png")
    paths["rgb_jpg"] = str(d / "rgb.jpg")
    paths["rgba_png"] = str(d / "rgba.png")
    paths["gray_png"] = str(d / "gray.png")
    paths["base"] = base
    paths["rgba"] = rgba
    return paths


def test_image_info(images):
    assert native.image_info(images["rgb_png"]) == (123, 97, 3)
    assert native.image_info(images["rgba_png"]) == (123, 97, 4)
    assert native.image_info(images["gray_png"]) == (123, 97, 1)
    w, h, c = native.image_info(images["rgb_jpg"])
    assert (w, h, c) == (123, 97, 3)


def test_decode_identity_png(images):
    # same-size load: exact decode (PNG is lossless)
    out = native.load_image_rgba(images["rgb_png"], 123, 97)
    assert out.shape == (97, 123, 4)
    np.testing.assert_allclose(out[..., :3],
                               images["base"].astype(np.float32) / 255.0,
                               atol=1e-6)
    np.testing.assert_allclose(out[..., 3], 1.0)


def test_decode_rgba_alpha(images):
    out = native.load_image_rgba(images["rgba_png"], 123, 97)
    np.testing.assert_allclose(out[..., 3],
                               images["rgba"][..., 3].astype(np.float32) / 255,
                               atol=1e-6)


def test_decode_jpeg_close_to_pil(images):
    from PIL import Image
    out = native.load_image_rgba(images["rgb_jpg"], 123, 97)
    with Image.open(images["rgb_jpg"]) as im:
        ref = np.asarray(im).astype(np.float32) / 255.0
    # same libjpeg underneath: decodes should agree to ~1/255
    assert np.abs(out[..., :3] - ref).max() < 2.5 / 255


def test_resize_downscale_close_to_pil(images):
    from PIL import Image
    out = native.load_image_rgba(images["rgb_png"], 61, 48)
    with Image.open(images["rgb_png"]) as im:
        ref = np.asarray(im.resize((61, 48), Image.BILINEAR)
                         ).astype(np.float32) / 255.0
    # both are antialiased triangle filters; small boundary differences
    assert np.abs(out[..., :3] - ref).mean() < 2.0 / 255
    assert np.abs(out[..., :3] - ref).max() < 16.0 / 255


def test_pool_matches_single(images):
    jobs = [(images["rgb_png"], 50, 40), (images["rgba_png"], 64, 32),
            (images["rgb_jpg"], 123, 97), (images["gray_png"], 10, 10)]
    with native.ImagePool(4) as pool:
        outs = pool.load_many(jobs)
    for (path, tw, th), got in zip(jobs, outs):
        np.testing.assert_array_equal(
            got, native.load_image_rgba(path, tw, th))


def test_pool_error_surfaces(tmp_path):
    with native.ImagePool(2) as pool:
        t = pool.submit(str(tmp_path / "missing.png"), 8, 8)
        with pytest.raises(IOError):
            pool.get(t)


def test_camera_build_uses_native(images, monkeypatch):
    from horizongs_tpu.data.camera_build import _load_image
    arr = _load_image(images["rgb_jpg"], (61, 48))
    assert arr.shape == (48, 61, 3)
    arr4 = _load_image(images["rgba_png"], (61, 48))
    assert arr4.shape == (48, 61, 4)
    g = _load_image(images["gray_png"], (61, 48))
    assert g.shape == (48, 61, 1)


def test_colmap_points3d_native_matches_python(tmp_path):
    from horizongs_tpu.data import colmap as cm
    rng = np.random.default_rng(3)
    n = 500
    xyz = rng.normal(size=(n, 3))
    rgb = rng.integers(0, 255, (n, 3))
    err = rng.uniform(0, 1, n)
    path = str(tmp_path / "points3D.bin")
    cm.write_points3D_binary(xyz, rgb, err, path)

    ids_n, xyz_n, rgb_n, err_n = native.read_colmap_points3d(path)
    np.testing.assert_array_equal(ids_n, np.arange(1, n + 1))
    np.testing.assert_allclose(xyz_n, xyz)
    np.testing.assert_array_equal(rgb_n, rgb.astype(np.uint8))
    np.testing.assert_allclose(err_n, err)

    # public wrapper must agree regardless of backend
    xyz_w, rgb_w, err_w = cm.read_points3D_binary(path)
    np.testing.assert_allclose(xyz_w, xyz)
    np.testing.assert_allclose(err_w, err)
