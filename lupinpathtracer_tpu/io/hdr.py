"""Radiance RGBE (.hdr) reader/writer in numpy.

TPU-native rebuild of the reference's HDR texture IO, which goes through the
Rust `image` crate (lupin_loader/src/loader.rs:209-293 load, :1775-1879 save).
Supports both flat and adaptive-RLE scanlines (the `image` crate writes RLE),
so the checked-in golden renders under /root/reference/test_scenes load
bit-exactly for RMSE comparison.
"""

from __future__ import annotations

import numpy as np


def _rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """(..., 4) uint8 -> (..., 3) float32."""

    rgbe = rgbe.astype(np.int32)
    exp = rgbe[..., 3]
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136)).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def _float_to_rgbe(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) float32 -> (..., 4) uint8."""

    rgb = np.maximum(np.asarray(rgb, np.float32), 0.0)
    maxc = rgb.max(axis=-1)
    out = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    nz = maxc >= 1e-32
    frac, exp = np.frexp(maxc[nz])
    scale = frac * 256.0 / maxc[nz]
    out_nz = np.empty(rgb[nz].shape[:-1] + (4,), np.uint8)
    out_nz[..., :3] = np.clip(rgb[nz] * scale[..., None], 0, 255).astype(np.uint8)
    out_nz[..., 3] = (exp + 128).astype(np.uint8)
    out[nz] = out_nz
    return out


def read_hdr(path) -> np.ndarray:
    """Returns (H, W, 3) float32 linear radiance."""

    with open(path, "rb") as f:
        data = f.read()

    # Header: text lines until a blank line, then the resolution line.
    pos = 0
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    while True:
        nl = data.find(b"\n", pos)
        if nl < 0:
            raise ValueError(f"{path}: truncated header")
        line = data[pos:nl]
        pos = nl + 1
        if line == b"":
            break
    nl = data.find(b"\n", pos)
    res_line = data[pos:nl].split()
    pos = nl + 1
    if len(res_line) != 4 or res_line[0] != b"-Y" or res_line[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {res_line}")
    height = int(res_line[1])
    width = int(res_line[3])

    try:
        from ..accel.native import decode_rgbe_native

        decoded = decode_rgbe_native(data[pos:], width, height)
        if decoded is not None:
            return _rgbe_to_float(decoded)
    except Exception:
        pass

    buf = np.frombuffer(data, np.uint8, offset=pos)
    img = np.empty((height, width, 4), np.uint8)
    bp = 0
    for y in range(height):
        if (
            width >= 8
            and width < 32768
            and bp + 4 <= buf.size
            and buf[bp] == 2
            and buf[bp + 1] == 2
            and (int(buf[bp + 2]) << 8 | int(buf[bp + 3])) == width
        ):
            bp += 4
            # Adaptive RLE: 4 per-channel planes of run/dump packets.
            for c in range(4):
                x = 0
                row = img[y, :, c]
                while x < width:
                    code = int(buf[bp])
                    bp += 1
                    if code > 128:  # run
                        row[x : x + code - 128] = buf[bp]
                        bp += 1
                        x += code - 128
                    else:  # dump
                        row[x : x + code] = buf[bp : bp + code]
                        bp += code
                        x += code
        else:
            # Flat scanline (possibly with old-style RLE markers).
            row = buf[bp : bp + width * 4].reshape(width, 4)
            if np.any((row[:, 0] == 1) & (row[:, 1] == 1) & (row[:, 2] == 1)):
                # Old-style RLE: repeat previous pixel count times.
                out_row = np.empty((width, 4), np.uint8)
                x = 0
                shift = 0
                while x < width:
                    px = buf[bp : bp + 4]
                    bp += 4
                    if px[0] == 1 and px[1] == 1 and px[2] == 1:
                        count = int(px[3]) << shift
                        out_row[x : x + count] = out_row[x - 1]
                        x += count
                        shift += 8
                    else:
                        out_row[x] = px
                        x += 1
                        shift = 0
                img[y] = out_row
                continue
            img[y] = row
            bp += width * 4
    return _rgbe_to_float(img)


def write_hdr(path, rgb: np.ndarray) -> None:
    """Write (H, W, 3) float32 as flat (non-RLE) RGBE scanlines."""

    rgb = np.asarray(rgb, np.float32)
    if rgb.ndim == 3 and rgb.shape[2] == 4:
        rgb = rgb[..., :3]
    h, w = rgb.shape[:2]
    rgbe = _float_to_rgbe(rgb)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\n")
        f.write(b"FORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
