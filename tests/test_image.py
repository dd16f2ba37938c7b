"""Image IO tests: Radiance HDR decode, PNG write."""

import os
import tempfile

import numpy as np
import pytest

from mc_path_tracer_tpu.utils.image import _load_radiance_hdr, load_hdr, write_png

REF_HDR = "/root/reference/hrdi/HDR_029_Sky_Cloudy_Env.hdr"


def test_radiance_hdr_decodes_floats():
    if not os.path.exists(REF_HDR):
        pytest.skip("reference HDR unavailable")
    img = load_hdr(REF_HDR)
    assert img.dtype == np.float32 and img.shape == (256, 512, 3)
    # true HDR radiance: sub-1 values AND >1 highlights, not 8-bit codes
    assert img.min() < 1.0
    assert 1.0 < img.max() < 1e5
    assert (img >= 0).all()


def test_hdr_roundtrip_synthetic():
    """Encode a synthetic RGBE image (flat scanlines) and decode it."""
    h, w = 4, 16
    rng = np.random.default_rng(0)
    # channels of similar magnitude: RGBE's shared exponent quantizes a tiny
    # channel next to a huge one to zero by design, which isn't what this
    # roundtrip is testing
    base = rng.uniform(0.1, 100.0, size=(h, w, 1)).astype(np.float32)
    rgb = base * rng.uniform(0.5, 1.0, size=(h, w, 3)).astype(np.float32)
    # encode to RGBE (shared exponent)
    maxc = rgb.max(axis=-1)
    exp = np.ceil(np.log2(np.maximum(maxc, 1e-32))).astype(np.int32) + 1
    scale = np.ldexp(1.0, -exp + 8).astype(np.float32)
    mant = np.clip((rgb * scale[..., None]), 0, 255).astype(np.uint8)
    rgbe = np.concatenate([mant, (exp + 128).astype(np.uint8)[..., None]], -1)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.hdr")
        with open(path, "wb") as f:
            f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
            f.write(f"-Y {h} +X {w}\n".encode())
            f.write(rgbe.tobytes())
        out = _load_radiance_hdr(path)
    # RGBE 8-bit mantissa truncation: up to ~3% relative error
    np.testing.assert_allclose(out, rgb, rtol=0.04, atol=1e-3)


def test_write_png_roundtrip():
    img = (np.arange(48).reshape(4, 4, 3) * 5).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.png")
        write_png(path, img)
        from PIL import Image

        back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, img)
