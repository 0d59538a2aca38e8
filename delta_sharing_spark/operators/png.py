"""Minimal pure-python PNG decoder (stdlib only: zlib + struct).

Implements the public PNG specification (RFC 2083 / ISO 15948): chunk
stream with CRC-32 validation, IHDR geometry, IDAT zlib inflate, and the
five per-scanline filters (None/Sub/Up/Average/Paeth). Supports bit depth
8, non-interlaced, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA) — enough to make the multimodal ``decode_media``
path a REAL decode in environments without pillow/imageio (this module
registers as a codec; see ``register_png_codec``).

This is a correctness-first reference decoder for small assets and tests;
for bulk image decoding at 100 TB you would register pillow/imageio (SIMD
C codecs) instead — the Spark-side plumbing is identical either way.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per color type (PNG spec, IHDR colour types)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunks(data: bytes):
    if data[:8] != _SIGNATURE:
        raise PngError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def decode_png(data: bytes):
    """Decode to ``(width, height, channels, rows)`` where ``rows`` is a
    list of ``height`` bytearrays of ``width * channels`` samples (palette
    entries are expanded to RGB). Raises :class:`PngError` on malformed
    input or unsupported variants."""
    width = height = None
    color_type = None
    palette: bytes | None = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace \
                = struct.unpack(">IIBBBBB", body)
            if bit_depth != 8:
                raise PngError(f"unsupported bit depth {bit_depth}")
            if interlace != 0:
                raise PngError("interlaced PNG not supported")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngError("missing IHDR")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        raise PngError("IDAT size does not match geometry")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    pos = 0
    for _y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                ul = prev[i - nch] if i >= nch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown filter type {ftype}")
        rows.append(line)
        prev = line
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        n_entries = len(palette) // 3
        for line in rows:
            for idx in line:
                if idx >= n_entries:
                    raise PngError(
                        f"palette index {idx} out of range "
                        f"({n_entries} entries)")
        rows = [
            bytearray(b for idx in line
                      for b in palette[3 * idx:3 * idx + 3])
            for line in rows
        ]
        nch = 3
    return width, height, nch, rows


def encode_png(width: int, height: int, channels: int,
               rows: list[bytes | bytearray]) -> bytes:
    """Tiny encoder (filter 0 only) — lets tests round-trip pixels without
    any external library."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    return (_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def png_decode_meta(content: bytes):
    """Codec-registry adapter: bytes -> (width, height, channels, "png"),
    or None if the payload is not a decodable PNG. Runs the FULL decode
    (inflate + defilter), not just a header sniff, so a corrupt body is
    rejected like a real codec would."""
    try:
        w, h, nch, _rows = decode_png(content or b"")
        return (w, h, nch, "png")
    except (PngError, zlib.error, struct.error, IndexError):
        return None


def register_png_codec() -> None:
    """Make ``decode_media(codec='auto')`` a real decoder in codec-less
    environments: registered codecs take priority over the deterministic
    fake (multimodal.resolve_codec order)."""
    from delta_sharing_spark.operators.multimodal import register_codec

    register_codec("png", png_decode_meta)
