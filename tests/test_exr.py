"""EXR codec round-trips (loader.rs:209-293 load, :1775-1879 save parity)."""

import os

import numpy as np
import pytest

from lupinpathtracer_tpu.io import exr, textures


def test_exr_roundtrip_half(tmp_path, rng):
    img = rng.uniform(0.0, 8.0, (37, 53, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, img)
    back = exr.read_exr(p)
    assert back.shape == (37, 53, 4)
    assert (back[..., 3] == 1.0).all()
    # half-float quantization only
    np.testing.assert_allclose(back[..., :3], img.astype(np.float16), rtol=1e-3)


def test_exr_roundtrip_exact_halves(tmp_path, rng):
    img = rng.uniform(0, 4, (16, 16, 3)).astype(np.float16).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, img)
    np.testing.assert_array_equal(exr.read_exr(p)[..., :3], img)


def test_exr_incompressible_block(tmp_path, rng):
    # Random noise defeats zlib -> exercises the store-raw fallback.
    img = rng.standard_normal((18, 24, 3)).astype(np.float32)
    p = str(tmp_path / "noise.exr")
    exr.write_exr(p, img)
    np.testing.assert_array_equal(
        exr.read_exr(p)[..., :3], img.astype(np.float16).astype(np.float32)
    )


def test_exr_via_texture_api(tmp_path, rng):
    img = rng.uniform(0, 2, (20, 30, 4)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    textures.save_texture(p, img)
    tex = textures.load_texture(p)
    assert tex.is_hdr
    np.testing.assert_allclose(
        tex.data[..., :3], img[..., :3].astype(np.float16), rtol=1e-3
    )


def test_exr_rejects_non_exr(tmp_path):
    p = str(tmp_path / "bogus.exr")
    with open(p, "wb") as f:
        f.write(b"not an exr at all")
    with pytest.raises(ValueError):
        exr.read_exr(p)


def test_exr_odd_height_zip_blocks(tmp_path, rng):
    # 35 rows = 2 full ZIP blocks (16 lines) + 3-line tail block.
    img = rng.uniform(0, 1, (35, 8, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, img)
    np.testing.assert_allclose(
        exr.read_exr(p)[..., :3], img.astype(np.float16), rtol=1e-3
    )
