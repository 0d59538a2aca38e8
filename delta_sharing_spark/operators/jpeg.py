"""Minimal pure-python baseline JPEG codec (stdlib + numpy).

Implements the public JPEG specification (ITU-T T.81 / ISO/IEC 10918-1,
baseline sequential DCT with Huffman coding): marker stream parse
(SOI/APPn/COM/DQT/DHT/SOF0/SOF1/DRI/SOS/RSTn/EOI), interleaved MCU
entropy decode with byte unstuffing and restart markers, dequantization,
2-D IDCT, integer-factor chroma upsampling, and the JFIF full-range
YCbCr<->RGB transform. The encoder writes grayscale or color (4:4:4 or
4:2:0) baseline streams using the Annex K.3 example Huffman tables.

This is the compressed-codec twin of the vendored PNG decoder
(``operators/png.py``): it makes the multimodal ``decode_media`` path a
REAL transform-coded decode in environments without pillow/imageio (this
module registers as a codec; see ``register_jpeg_codec``). With all-ones
quantization tables and per-block-constant pixel data the round trip is
bit-exact (only the DC coefficient is non-zero and it is an exact
multiple of 8), which is what lets a SQL oracle replay decoded-pixel
aggregates integer-for-integer — see ``q_multimodal_jpeg``.

Correctness-first reference codec for small assets and tests; for bulk
decoding at 100 TB you would register pillow-simd/libjpeg-turbo instead —
the Spark-side plumbing (Arrow-batched mapInPandas over opaque binary
columns) is identical either way.
"""

from __future__ import annotations

import math
import struct

import numpy as np


class JpegError(ValueError):
    pass


# ------------------------------------------------------------- constants

def _zigzag_order() -> list[tuple[int, int]]:
    # (row, col) pairs in JPEG zigzag scan order: walk the anti-diagonals,
    # odd diagonals top-right -> bottom-left, even ones reversed
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(8, s + 1))]
        order.extend(diag if s % 2 else reversed(diag))
    return order


_ZIGZAG = _zigzag_order()          # index k -> (row, col)

# Annex K.3 example Huffman tables (ITU-T T.81): BITS (codes per length
# 1..16) and HUFFVAL. Both sides of this module use the same tables, and
# they are the tables virtually every baseline encoder emits.
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    m = np.empty((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


_DCT = _dct_matrix()     # F = _DCT @ f @ _DCT.T ; f = _DCT.T @ F @ _DCT


def _build_codes(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman assignment (T.81 C.2): value -> (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude_bits(v: int) -> tuple[int, int]:
    """(ssss category, appended bits) for a coefficient value (F.1.2.1)."""
    ssss = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return ssss, (v if v >= 0 else v + (1 << ssss) - 1)


def _extend(received: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return received if received >= (1 << (ssss - 1)) \
        else received - (1 << ssss) + 1


# --------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:           # byte stuffing (F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _encode_block(bw: _BitWriter, coeffs: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Huffman-encode one quantized 8x8 block; returns the new DC pred."""
    zz = [int(coeffs[r, c]) for (r, c) in _ZIGZAG]
    ssss, extra = _magnitude_bits(zz[0] - pred)
    code, length = dc_codes[ssss]
    bw.write(code, length)
    if ssss:
        bw.write(extra, ssss)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]   # ZRL
            bw.write(code, length)
            run -= 16
        ssss, extra = _magnitude_bits(v)
        code, length = ac_codes[(run << 4) | ssss]
        bw.write(code, length)
        bw.write(extra, ssss)
        run = 0
    if run:
        code, length = ac_codes[0x00]       # EOB
        bw.write(code, length)
    return zz[0]


def encode_jpeg(width: int, height: int, channels: int,
                rows: list, sampling: str = "4:4:4",
                quant: np.ndarray | None = None,
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG encoder: grayscale (channels=1) or RGB (channels=3,
    written as JFIF YCbCr at 4:4:4 or 4:2:0). ``quant`` is an 8x8 table
    applied to every component (default all-ones: near-lossless, and
    bit-exact for per-block-constant input). ``rows`` as in encode_png:
    ``height`` byte strings of ``width * channels`` samples."""
    if channels not in (1, 3):
        raise JpegError(f"unsupported channel count {channels}")
    img = np.frombuffer(b"".join(bytes(r) for r in rows), dtype=np.uint8)
    if img.size != width * height * channels:
        raise JpegError("rows do not match geometry")
    img = img.reshape(height, width, channels).astype(np.float64)
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, float)

    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b]
        if sampling == "4:4:4":
            factors = [(1, 1), (1, 1), (1, 1)]
        elif sampling == "4:2:0":
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            raise JpegError(f"unsupported sampling {sampling!r}")
    else:
        planes = [img[..., 0]]
        factors = [(1, 1)]

    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    comp_planes = []
    for plane, (hf, vf) in zip(planes, factors):
        if (hf, vf) != (hmax, vmax):
            # box-average downsample by integer factors
            fy, fx = vmax // vf, hmax // hf
            ph = -(-height // fy) * fy
            pw = -(-width // fx) * fx
            p = np.pad(plane, ((0, ph - height), (0, pw - width)),
                       mode="edge")
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * 8 * vf, mcux * 8 * hf
        plane = np.pad(plane, ((0, th - plane.shape[0]),
                               (0, tw - plane.shape[1])), mode="edge")
        comp_planes.append(plane)

    dc_tabs = [_build_codes(*_DC_LUMA)]
    ac_tabs = [_build_codes(*_AC_LUMA)]
    tab_ids = [(0, 0)]
    if channels == 3:
        dc_tabs.append(_build_codes(*_DC_CHROMA))
        ac_tabs.append(_build_codes(*_AC_CHROMA))
        tab_ids = [(0, 0), (1, 1), (1, 1)]

    bw = _BitWriter()
    preds = [0] * channels
    segments = []
    n_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_in_seg == restart_interval:
                bw.flush()
                segments.append(bytes(bw.out))
                bw = _BitWriter()
                preds = [0] * channels
                n_in_seg = 0
            for ci, (hf, vf) in enumerate(factors):
                dct, act = tab_ids[ci]
                for by in range(vf):
                    for bx in range(hf):
                        y0 = (my * vf + by) * 8
                        x0 = (mx * hf + bx) * 8
                        blk = comp_planes[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                        coeffs = np.round((_DCT @ blk @ _DCT.T) / q)
                        preds[ci] = _encode_block(
                            bw, coeffs, preds[ci],
                            dc_tabs[dct], ac_tabs[act])
            n_in_seg += 1
    bw.flush()
    segments.append(bytes(bw.out))
    scan = bytearray(segments[0])
    for i, seg in enumerate(segments[1:]):
        scan += bytes([0xFF, 0xD0 + (i % 8)]) + seg

    def marker(code: int, body: bytes) -> bytes:
        return struct.pack(">HH", code, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")                               # SOI
    out += marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_q = bytes(min(255, max(1, int(q[r, c]))) for (r, c) in _ZIGZAG)
    out += marker(0xFFDB, b"\x00" + zz_q)                      # DQT id 0
    if channels == 3:
        out += marker(0xFFDB, b"\x01" + zz_q)                  # DQT id 1
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci, (hf, vf) in enumerate(factors):
        qid = 0 if ci == 0 else 1
        sof += bytes([ci + 1, (hf << 4) | vf, qid if channels == 3 else 0])
    out += marker(0xFFC0, sof)                                 # SOF0
    huffs = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if channels == 3:
        huffs += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, vals) in huffs:
        out += marker(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += marker(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for ci in range(channels):
        dct, act = tab_ids[ci]
        sos += bytes([ci + 1, (dct << 4) | act])
    sos += b"\x00\x3f\x00"
    out += marker(0xFFDA, sos)                                 # SOS
    out += scan
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RST markers are
    segment boundaries handled by the caller (restart())."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegError("entropy data exhausted")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise JpegError("hit restart marker mid-symbol")
            else:
                raise JpegError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Align to byte boundary and consume an expected RST marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise JpegError("expected restart marker")


def _decode_huffman(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise JpegError("invalid Huffman code")


def decode_jpeg(data: bytes):
    """Decode a baseline JPEG to ``(width, height, channels, rows)`` —
    the same contract as ``decode_png``: ``rows`` is a list of ``height``
    bytearrays of ``width * channels`` samples (RGB interleaved for color).
    Raises :class:`JpegError` on malformed or non-baseline input."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG: bad SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError("expected marker")
        code = data[pos + 1]
        if code == 0xD9:                           # EOI
            raise JpegError("EOI before SOS")
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        pos += 2 + seglen
        if code == 0xDB:                           # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                n = 128 if prec else 64
                raw = body[i + 1:i + 1 + n]
                if len(raw) != n:
                    raise JpegError("truncated DQT")
                vals = (struct.unpack(f">{n // 2}H", raw) if prec
                        else list(raw))
                t = np.empty((8, 8))
                for k, (r, c) in enumerate(_ZIGZAG):
                    t[r, c] = vals[k]
                qtabs[tid] = t
                i += 1 + n
        elif code == 0xC4:                         # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                if len(vals) != nv:
                    raise JpegError("truncated DHT")
                fwd = _build_codes(bits, vals)
                htabs[(tc, th)] = {(ln, cd): v
                                   for v, (cd, ln) in fwd.items()}
                i += 17 + nv
        elif code in (0xC0, 0xC1):                 # SOF0/SOF1 (baseline)
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError(f"unsupported sample precision {prec}")
            comps = []
            for ci in range(ncomp):
                cid, hv, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
            frame = (w, h, comps)
        elif code in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline (SOF0/SOF1) JPEG is supported")
        elif code == 0xDD:                         # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif code == 0xDA:                         # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            return _decode_scan(data, pos, body, frame, qtabs, htabs,
                                restart_interval)
        # APPn / COM / others: skipped
    raise JpegError("missing SOS")


def _decode_scan(data: bytes, pos: int, sos: bytes, frame, qtabs, htabs,
                 restart_interval: int):
    width, height, comps = frame
    ns = sos[0]
    if ns != len(comps):
        raise JpegError("partial-scan JPEG not supported")
    scan_tabs = {}
    for i in range(ns):
        cid, tabs = sos[1 + 2 * i], sos[2 + 2 * i]
        scan_tabs[cid] = (tabs >> 4, tabs & 0x0F)
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = []
    for _cid, hf, vf, _qid in comps:
        if hmax % hf or vmax % vf:
            raise JpegError("non-integer sampling ratio")
        planes.append(np.zeros((mcuy * 8 * vf, mcux * 8 * hf)))

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    n_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_in_seg == restart_interval:
                br.restart()
                preds = [0] * len(comps)
                n_in_seg = 0
            for ci, (cid, hf, vf, qid) in enumerate(comps):
                if qid not in qtabs:
                    raise JpegError(f"missing quant table {qid}")
                dct, act = scan_tabs[cid]
                dc_tab = htabs.get((0, dct))
                ac_tab = htabs.get((1, act))
                if dc_tab is None or ac_tab is None:
                    raise JpegError("missing Huffman table")
                q = qtabs[qid]
                for by in range(vf):
                    for bx in range(hf):
                        coeffs = np.zeros((8, 8))
                        ssss = _decode_huffman(br, dc_tab)
                        preds[ci] += _extend(br.receive(ssss), ssss)
                        coeffs[0, 0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(br, ac_tab)
                            run, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if run == 15:       # ZRL
                                    k += 16
                                    continue
                                break               # EOB
                            k += run
                            if k > 63:
                                raise JpegError("AC index overflow")
                            r, c = _ZIGZAG[k]
                            coeffs[r, c] = _extend(br.receive(ssss), ssss)
                            k += 1
                        blk = _DCT.T @ (coeffs * q) @ _DCT + 128.0
                        y0 = (my * vf + by) * 8
                        x0 = (mx * hf + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            n_in_seg += 1

    full = []
    for plane, (_cid, hf, vf, _qid) in zip(planes, comps):
        fy, fx = vmax // vf, hmax // hf
        if fy > 1 or fx > 1:                       # replicate upsample
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        full.append(plane[:height, :width])

    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        out = out[..., None]
        nch = 1
    elif len(comps) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.clip(np.round(np.stack([r, g, b], axis=-1)),
                      0, 255).astype(np.uint8)
        nch = 3
    else:
        raise JpegError(f"unsupported component count {len(comps)}")
    rows = [bytearray(out[yy].tobytes()) for yy in range(height)]
    return width, height, nch, rows


# ----------------------------------------------------- registry adapter

def jpeg_decode_meta(content: bytes):
    """Codec-registry adapter: bytes -> (width, height, channels, "jpeg"),
    or None if the payload is not a decodable baseline JPEG. Runs the FULL
    decode (entropy + IDCT), not just a header sniff."""
    try:
        w, h, nch, _rows = decode_jpeg(bytes(content or b""))
        return (w, h, nch, "jpeg")
    except (JpegError, struct.error, IndexError):
        return None


def register_jpeg_codec() -> None:
    """Make ``decode_media(codec='auto')`` a real transform-coded decoder
    in codec-less environments (multimodal.resolve_codec order: registered
    codecs win over the deterministic fake)."""
    from delta_sharing_spark.operators.multimodal import register_codec

    register_codec("jpeg", jpeg_decode_meta)


# ------------------------------------------------ synthesis + features
#
# The audio-twin pattern (operators/audio.py synth_wav_column /
# audio_features): synthesize real compressed bytes from integer math a
# SQL oracle can replay, round-trip them through a separate Arrow-batched
# decode stage, and emit integer-exact pixel aggregates. Per-block
# CONSTANT values + all-ones quant tables make the JPEG round trip
# bit-exact (DC-only blocks, DC an exact multiple of 8).

def _synth_geometry(doc_id: int) -> tuple[int, int]:
    return 1 + doc_id % 3, 1 + doc_id % 2     # (blocks wide, blocks high)


def _synth_block_value(doc_id: int, bx: int, by: int) -> int:
    return (doc_id * 31 + bx * 7 + by * 13) % 256


def synth_jpeg_column(df, id_col: str, out_col: str = "image"):
    """Attach deterministic grayscale baseline-JPEG bytes per row:
    width = 8*(1 + id%3), height = 8*(1 + id%2), block (bx,by) constant
    value (id*31 + bx*7 + by*13) % 256. Arrow-batched mapInPandas —
    map-only, no shuffle."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    cols = df.columns

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = []
            for doc_id in pdf[id_col].values:
                wb, hb = _synth_geometry(int(doc_id))
                w, h = 8 * wb, 8 * hb
                arr = np.empty((h, w), dtype=np.uint8)
                for by in range(hb):
                    for bx in range(wb):
                        arr[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                            _synth_block_value(int(doc_id), bx, by)
                imgs.append(encode_jpeg(
                    w, h, 1, [arr[y].tobytes() for y in range(h)]))
            pdf = pdf.copy()
            pdf[out_col] = imgs
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} binary"
    return df.mapInPandas(synth, schema=schema)


def synth_jpeg_corpus(df, id_col: str, out_col: str = "image"):
    """Attach a deterministic NEAR-DUPLICATE image corpus: every row gets
    a 32x32 grayscale baseline JPEG of 4x4 flat blocks whose base values
    come from the row's FIXED-SIZE cluster (``id // 8`` — 8 members per
    cluster at every corpus size, so the true near-dup pair set grows
    LINEARLY with the corpus, the shape a dedup benchmark needs), with
    ONE block perturbed per row (block ``(id%8 * 2 + id//8) % 16``
    shifted by ``(id % 5) * 40``). Rows in the same cluster are
    near-duplicates (hamming <= 2 on a block-aligned aHash); rows across
    clusters are far apart except where the mod-256 base math repeats —
    those repeats ARE identical images, so finding them is correct.
    All-flat blocks + all-ones quant tables keep the JPEG round trip
    bit-exact, so a SQL oracle can replay the decoded pixels and the
    hash integer-for-integer. Arrow-batched mapInPandas, map-only."""
    from collections.abc import Iterator

    import pandas as pd

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = []
            for raw_id in pdf[id_col].values:
                doc_id = int(raw_id)
                cluster = doc_id // 8
                pert = ((doc_id % 8) * 2 + cluster) % 16
                arr = np.empty((32, 32), dtype=np.uint8)
                for by in range(4):
                    for bx in range(4):
                        i = by * 4 + bx
                        # the (cluster % 16) * i*i cross term varies the
                        # STRUCTURE per cluster, not just brightness —
                        # aHash is brightness-invariant, so a constant
                        # shift alone would make every cluster hash-equal
                        v = (cluster * 37 + i * 7
                             + (cluster % 16) * i * i) % 256
                        if i == pert:
                            v = (v + (doc_id % 5) * 40) % 256
                        arr[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
                imgs.append(encode_jpeg(
                    32, 32, 1, [arr[y].tobytes() for y in range(32)]))
            pdf = pdf.copy()
            pdf[out_col] = imgs
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} binary"
    return df.mapInPandas(synth, schema=schema)


def jpeg_features(df, image_col: str, id_col: str):
    """REAL JPEG decode in the distributed path: entropy-decode + IDCT
    each payload inside Arrow-batched mapInPandas and emit integer-exact
    pixel aggregates (sum, sum of squares, and a position-weighted sum
    that pins the spatial layout). Map-only; decode parallelism =
    partition count; payloads never leave the executor."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out = []
            for id_, content in zip(pdf["__id"].values,
                                    pdf["__content"].values):
                try:
                    w, h, nch, rows = decode_jpeg(bytes(content or b""))
                    px = np.frombuffer(
                        b"".join(bytes(r) for r in rows),
                        dtype=np.uint8).reshape(h, w * nch).astype(np.int64)
                    xs = np.arange(w * nch, dtype=np.int64)[None, :]
                    ys = np.arange(h, dtype=np.int64)[:, None]
                    weight = 1 + xs + ys * (w * nch)
                    rows_out.append((
                        id_, w, h, nch, int(px.size),
                        int(px.sum()), int((px * px).sum()),
                        int((px * weight).sum()), None))
                except (JpegError, struct.error, IndexError) as e:
                    rows_out.append((id_, None, None, None, None, None,
                                     None, None, str(e)))
            yield pd.DataFrame(
                rows_out,
                columns=[id_col, "width", "height", "channels", "n_pixels",
                         "sum_px", "sum_sq", "wsum", "error"])

    packed = df.select(F.col(id_col).alias("__id"),
                       F.col(image_col).alias("__content"))
    return packed.mapInPandas(
        feats,
        schema=f"{id_col} long, width int, height int, channels int,"
               " n_pixels bigint, sum_px bigint, sum_sq bigint,"
               " wsum bigint, error string")
