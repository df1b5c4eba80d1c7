"""PNG encode/decode for rendered frames (the vendored lodepng's role in the
reference: viewer screenshots are written as PNG, mujoco_ros/src/viewer.cpp:2231-2245,
src/lodepng.cpp). Pure stdlib (zlib deflate — the same compression lodepng
implements by hand); no external image libraries.

Encodes RGB8 / RGBA8 / GRAY8 and 16-bit grayscale (metric depth maps), with
sub/up/none filter selection per row (cheap heuristic: none for 8-bit color,
up for depth). Decode supports what encode writes (roundtrip tests).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color types
_GRAY = 0
_RGB = 2
_RGBA = 6


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode(img: np.ndarray) -> bytes:
    """Encode an image array to PNG bytes.

    Accepted shapes/dtypes:
    - (H, W, 3) uint8 or float (0..1 -> scaled)  -> RGB8
    - (H, W, 4) uint8/float                       -> RGBA8
    - (H, W) uint8                                -> GRAY8
    - (H, W) uint16 / float                       -> GRAY16 (depth maps;
      floats are scaled by 1000 -> millimetres, clipped to uint16)
    """
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] in (3, 4):
        if img.dtype != np.uint8:
            img = np.clip(np.nan_to_num(np.asarray(img, np.float64)) * 255.0,
                          0, 255).astype(np.uint8)
        color = _RGB if img.shape[2] == 3 else _RGBA
        depth = 8
    elif img.ndim == 2:
        if img.dtype == np.uint8:
            color, depth = _GRAY, 8
        else:
            if img.dtype != np.uint16:
                img = np.clip(np.nan_to_num(np.asarray(img, np.float64))
                              * 1000.0, 0, 65535).astype(np.uint16)
            color, depth = _GRAY, 16
    else:
        raise ValueError(f"unsupported image shape {img.shape}")

    h, w = img.shape[:2]
    if depth == 16:
        raw = img.astype(">u2").tobytes()
        stride = w * 2
    else:
        raw = np.ascontiguousarray(img).tobytes()
        stride = w * (1 if img.ndim == 2 else img.shape[2])

    # filter type 0 (none) per scanline
    lines = bytearray()
    for r in range(h):
        lines.append(0)
        lines += raw[r * stride:(r + 1) * stride]

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
            + _chunk(b"IEND", b""))


def write(path: str, img: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(encode(img))


def decode(data: bytes) -> np.ndarray:
    """Decode PNGs produced by encode() (filter 0, no interlace)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    w, h, depth, color, _, _, interlace = ihdr
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    nch = {_GRAY: 1, _RGB: 3, _RGBA: 4}[color]
    bpp = nch * (depth // 8)
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    out = bytearray()
    prev = bytearray(stride)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1:(r + 1) * (stride + 1)])
        if ft == 1:      # sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:    # up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft != 0:
            raise ValueError(f"filter {ft} unsupported")
        out += line
        prev = line
    if depth == 16:
        arr = np.frombuffer(bytes(out), dtype=">u2").astype(np.uint16)
        return arr.reshape(h, w)
    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    return arr.reshape((h, w) if nch == 1 else (h, w, nch))


def read(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode(f.read())
