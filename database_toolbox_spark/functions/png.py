"""Pure-stdlib PNG codec (zlib + struct) — no third-party imagery libs.

Retires the repo's last capability stub: `operators/multimodal.decode_image`
now decodes REAL image bytes through this module instead of raising.
Reference parity n/a — the reference ships no codecs (its multimodal surface
is opaque binary passthrough); this is the repo's own declared surface.

Scope (documented, validated): 8-bit depth, color types 0 (grayscale),
2 (RGB), 3 (palette — PLTE-indexed, expanded to RGB on decode),
4 (gray+alpha), 6 (RGBA), all five scanline filters
(None/Sub/Up/Average/Paeth), multiple IDAT chunks, CRC verification,
no interlacing. That covers everything `encode_png` emits and the common
subset of real-world PNGs.

This module is deliberately dependency-free (stdlib only) so Spark workers
can run it when it is registered for by-value pickling
(`pyspark.cloudpickle.register_pickle_by_value`) — module-level functions
otherwise pickle by reference and break driver sims whose cwd is outside
the repo (see tests/test_driver_path.py rationale).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only); type 3 (palette) is
# 1 byte/pixel on the wire, expanded to RGB on decode
_CHANNELS_OF_COLOR_TYPE = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE_OF_CHANNELS = {v: k for k, v in _CHANNELS_OF_COLOR_TYPE.items()}
_PALETTE_COLOR_TYPE = 3


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): pick left/up/up-left nearest to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _predictor(ftype: int, a: int, b: int, c: int) -> int:
    """Predicted byte for filter type 1-4 given left/up/up-left bytes."""
    if ftype == 1:
        return a
    if ftype == 2:
        return b
    if ftype == 3:
        return (a + b) >> 1
    return _paeth(a, b, c)


def filter_scanline(
    ftype: int, line: bytes, prev: bytes, bpp: int
) -> bytes:
    """Apply filter `ftype` to one raw scanline (encoder direction)."""
    if ftype == 0:
        return bytes(line)
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        c = prev[i - bpp] if i >= bpp else 0
        out[i] = (line[i] - _predictor(ftype, a, prev[i], c)) & 0xFF
    return bytes(out)


def unfilter_scanline(
    ftype: int, line: bytearray, prev: bytes, bpp: int
) -> bytearray:
    """Reverse filter `ftype` in place (decoder direction)."""
    if ftype == 0:
        return line
    if ftype not in (1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter type {ftype}")
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        c = prev[i - bpp] if i >= bpp else 0
        line[i] = (line[i] + _predictor(ftype, a, prev[i], c)) & 0xFF
    return line


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    filter_strategy: str = "cycle",
) -> bytes:
    """Encode raw 8-bit pixels into a valid PNG byte string.

    filter_strategy: "none" writes filter 0 everywhere; "cycle" rotates
    through all five filter types row by row so a decoder must implement
    every unfilter path to round-trip (that asymmetry is what the codec
    tests lean on)."""
    if channels not in _COLOR_TYPE_OF_CHANNELS:
        raise ValueError(f"unsupported channel count {channels}")
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, need {stride * height}"
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE_OF_CHANNELS[channels],
        0, 0, 0,
    )
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        ftype = 0 if filter_strategy == "none" else y % 5
        raw.append(ftype)
        raw += filter_scanline(ftype, line, prev, channels)
        prev = line
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Decode a PNG byte string → {"width", "height", "channels", "pixels"}.

    Validates the signature, every chunk CRC, and the decompressed stream
    length; supports 8-bit gray/RGB/gray-alpha/RGBA, all five filters,
    multiple IDAT chunks. Raises ValueError on anything malformed or
    outside that scope."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG: chunk header")
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG: chunk body")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length]
        )
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {ctype!r}: CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
    if ihdr is None or not seen_iend:
        raise ValueError("PNG missing IHDR or IEND")
    width, height, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    is_palette = color_type == _PALETTE_COLOR_TYPE
    if not is_palette and color_type not in _CHANNELS_OF_COLOR_TYPE:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if is_palette:
        if plte is None or len(plte) % 3 or not plte:
            raise ValueError("palette PNG missing or malformed PLTE chunk")
        channels = 1  # one index byte per pixel on the wire
    else:
        channels = _CHANNELS_OF_COLOR_TYPE[color_type]
    stride = width * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT stream corrupt: {exc}") from exc
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG pixel stream is {len(raw)} bytes, "
            f"expected {(stride + 1) * height}"
        )
    out = bytearray()
    prev: bytes = bytes(stride)
    at = 0
    for _ in range(height):
        ftype = raw[at]
        line = bytearray(raw[at + 1:at + 1 + stride])
        at += 1 + stride
        line = unfilter_scanline(ftype, line, prev, channels)
        out += line
        prev = bytes(line)
    if is_palette:
        n_entries = len(plte) // 3
        if any(i >= n_entries for i in out):
            raise ValueError("palette PNG index out of PLTE range")
        rgb = bytearray(len(out) * 3)
        for j, i in enumerate(out):
            rgb[j * 3:j * 3 + 3] = plte[i * 3:i * 3 + 3]
        return {
            "width": width,
            "height": height,
            "channels": 3,
            "pixels": bytes(rgb),
        }
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }
