"""Image IO: Radiance .hdr loading and PNG/EXR-style output.

Replaces the reference's stb_image/stb_image_write usage (Texture.cpp:24-26,
RenderingContext.cpp:113-121).  imageio handles the common paths; a pure
numpy Radiance-RLE decoder is included as fallback so HDR environment maps
load even without plugins.
"""

from __future__ import annotations

import numpy as np


def load_hdr(path: str) -> np.ndarray:
    """Load a Radiance .hdr (or other float image) as float32 [H, W, 3]
    linear RGB.

    .hdr goes through our own RGBE decoder: imageio without an HDR plugin
    silently decodes Radiance files as 8-bit LDR (observed in this
    environment), which would wreck env-light radiometry.
    """
    if path.lower().endswith(".hdr"):
        return _load_radiance_hdr(path)
    import imageio.v3 as iio

    img = np.asarray(iio.imread(path)).astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return np.ascontiguousarray(img[..., :3])


def _load_radiance_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) decoder with new-style RLE."""
    with open(path, "rb") as f:
        data = f.read()
    # header
    pos = 0
    if not data.startswith(b"#?"):
        raise ValueError(f"{path}: not a Radiance HDR file")
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line == b"":
            break
    eol = data.index(b"\n", pos)
    dims = data[pos:eol].decode().split()
    pos = eol + 1
    if dims[0] != "-Y" or dims[2] != "+X":
        raise ValueError(f"{path}: unsupported orientation {dims}")
    h, w = int(dims[1]), int(dims[3])

    rgbe = np.zeros((h, w, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8, offset=pos)
    bp = 0
    for y in range(h):
        if w < 8 or w > 0x7FFF or buf[bp] != 2 or buf[bp + 1] != 2:
            # flat (uncompressed) scanline
            rgbe[y] = buf[bp : bp + 4 * w].reshape(w, 4)
            bp += 4 * w
            continue
        assert (int(buf[bp + 2]) << 8 | int(buf[bp + 3])) == w
        bp += 4
        for c in range(4):
            x = 0
            while x < w:
                n = int(buf[bp])
                bp += 1
                if n > 128:  # run
                    rgbe[y, x : x + n - 128, c] = buf[bp]
                    bp += 1
                    x += n - 128
                else:  # literal
                    rgbe[y, x : x + n, c] = buf[bp : bp + n]
                    bp += n
                    x += n
    exp = rgbe[..., 3].astype(np.int32) - 136  # 128 + 8 mantissa bits
    scale = np.ldexp(1.0, exp).astype(np.float32)
    rgb = rgbe[..., :3].astype(np.float32) * scale[..., None]
    rgb[rgbe[..., 3] == 0] = 0.0
    return rgb


def write_png(path: str, img: np.ndarray) -> None:
    """Write a uint8 or float [H, W, 3] image to PNG."""
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    try:
        import imageio.v3 as iio

        iio.imwrite(path, img)
        return
    except Exception:
        pass
    from PIL import Image

    Image.fromarray(img).save(path)


def write_hdr_npy(path: str, img: np.ndarray) -> None:
    """Save linear HDR radiance losslessly (npy; EXR-equivalent output)."""
    np.save(path, np.asarray(img, np.float32))
