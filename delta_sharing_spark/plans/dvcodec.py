"""Delta-spec inline deletion-vector codec: 64-bit RoaringBitmapArray
("portable" format, magic 1681511377) serialized bytes, Z85-encoded for the
JSON descriptor — byte-compatible with what a real Delta reader expects for
``storageType: "i"`` descriptors (delta-io/delta PROTOCOL.md, "Deletion
Vector Descriptor Schema" / "Deletion Vector Format"; surfaced through the
sharing delta response format, reference PROTOCOL.md:4014-4137).

Layout of the serialized data (everything little-endian unless noted):

- ``uint32`` magic ``1681511377`` (portable RoaringBitmapArray format)
- ``int64``  number of 32-bit RoaringBitmaps (indexed by the high 32 bits
  of each 64-bit row index; empty gap bitmaps ARE serialized)
- each bitmap in the standard Roaring portable format
  (github.com/RoaringBitmap/RoaringFormatSpec): cookie 12347
  (no-run-containers) + container count, descriptive headers
  ``(key, cardinality-1)``, per-container byte offsets, then container
  payloads — sorted ``uint16`` arrays (cardinality ≤ 4096) or 8 KiB
  bitset containers.

The encoder always writes the no-run-container layout (always valid); the
decoder additionally understands run containers (cookie 12346) so vectors
produced by real Delta writers round-trip.

Z85 is the ZeroMQ base-85 alphabet over 4-byte groups; input is
zero-padded to a multiple of 4 and the descriptor's ``sizeInBytes``
(the UNPADDED serialized length, per the Delta spec) tells the decoder
how much is real.
"""

from __future__ import annotations

import struct

ROARING_ARRAY_PORTABLE_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUNCONTAINER = 12347
_SERIAL_COOKIE = 12346  # run-container-capable stream (read support only)
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX_CARDINALITY = 4096

_Z85_CHARS = ("0123456789abcdefghijklmnopqrstuvwxyz"
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


# ------------------------------------------------------------------ z85

def z85_encode(data: bytes) -> str:
    """Z85-encode, zero-padding to a 4-byte multiple (Delta's
    Base85Codec.encodeBytes behavior — the descriptor's sizeInBytes
    records the unpadded length for the decoder)."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i:i + 4], "big")
        group = []
        for _ in range(5):
            n, rem = divmod(n, 85)
            group.append(_Z85_CHARS[rem])
        out.extend(reversed(group))
    return "".join(out)


def z85_decode(encoded: str, output_length: int | None = None) -> bytes:
    if len(encoded) % 5:
        raise ValueError(
            f"z85 input length {len(encoded)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(encoded), 5):
        n = 0
        for c in encoded[i:i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if n > 0xFFFFFFFF:
            # 85^5 - 1 > 2^32: a syntactically-valid 5-char group can
            # encode a value no 4-byte group produces — invalid input,
            # not an OverflowError (callers catch ValueError to detect
            # non-z85 payloads, e.g. the legacy-codec fallback)
            raise ValueError(
                f"z85 group {encoded[i:i + 5]!r} exceeds 32 bits")
        out += n.to_bytes(4, "big")
    return bytes(out[:output_length] if output_length is not None else out)


# -------------------------------------------------- roaring serialization

def _serialize_bitmap32(values: list[int]) -> bytes:
    """One 32-bit RoaringBitmap, portable format, no run containers.
    ``values`` sorted uint32s."""
    containers: list[tuple[int, list[int]]] = []
    for v in values:
        key, low = v >> 16, v & 0xFFFF
        if containers and containers[-1][0] == key:
            containers[-1][1].append(low)
        else:
            containers.append((key, [low]))

    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUNCONTAINER,
                       len(containers))
    for key, lows in containers:
        out += struct.pack("<HH", key, len(lows) - 1)
    # offset header (always present in the no-run layout)
    payload_start = len(out) + 4 * len(containers)
    payloads = []
    pos = payload_start
    for _key, lows in containers:
        out += struct.pack("<I", pos)
        if len(lows) <= _ARRAY_MAX_CARDINALITY:
            payload = struct.pack(f"<{len(lows)}H", *lows)
        else:
            words = [0] * 1024
            for low in lows:
                words[low >> 6] |= 1 << (low & 63)
            payload = struct.pack("<1024Q", *words)
        payloads.append(payload)
        pos += len(payload)
    for p in payloads:
        out += p
    return bytes(out)


def _deserialize_bitmap32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Read one portable RoaringBitmap at ``pos``; return (uint32 values,
    new pos). Understands array, bitmap, and run containers."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n_containers = (cookie >> 16) + 1
        pos += 4
        run_flags = buf[pos:pos + (n_containers + 7) // 8]
        pos += (n_containers + 7) // 8
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUNCONTAINER:
        (n_containers,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")

    headers = []
    for i in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        is_run = bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)
        headers.append((key, card_m1 + 1, is_run))
    if has_offsets:
        pos += 4 * n_containers  # offsets are redundant for a linear read

    values: list[int] = []
    for key, card, is_run in headers:
        base = key << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start,
                                    base + start + length_m1 + 1))
        elif card <= _ARRAY_MAX_CARDINALITY:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + low for low in lows)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    lsb = w & -w
                    values.append(base + (wi << 6) + lsb.bit_length() - 1)
                    w ^= lsb
    return values, pos


def serialize_roaring_bitmap_array(row_indexes) -> bytes:
    """Sorted (or not) 64-bit row positions -> portable RoaringBitmapArray
    bytes (magic + per-high-word 32-bit bitmaps, empty gaps included)."""
    values = sorted(set(int(v) for v in row_indexes))
    if values and values[0] < 0:
        raise ValueError("row indexes must be non-negative")
    n_bitmaps = (values[-1] >> 32) + 1 if values else 0
    out = bytearray(struct.pack("<Iq", ROARING_ARRAY_PORTABLE_MAGIC,
                                n_bitmaps))
    start = 0
    for high in range(n_bitmaps):
        end = start
        bound = (high + 1) << 32
        while end < len(values) and values[end] < bound:
            end += 1
        out += _serialize_bitmap32([v & 0xFFFFFFFF
                                    for v in values[start:end]])
        start = end
    return bytes(out)


def deserialize_roaring_bitmap_array(data: bytes) -> list[int]:
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != ROARING_ARRAY_PORTABLE_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} "
            f"(expected {ROARING_ARRAY_PORTABLE_MAGIC})")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        vals, pos = _deserialize_bitmap32(data, pos)
        out.extend((high << 32) | v for v in vals)
    return out


# ------------------------------------------------------- inline DV facade

def encode_inline_dv(row_indexes) -> tuple[str, int]:
    """Row positions -> (z85 descriptor payload, sizeInBytes). sizeInBytes
    is the UNPADDED serialized byte length, as the Delta spec requires."""
    data = serialize_roaring_bitmap_array(row_indexes)
    return z85_encode(data), len(data)


def decode_inline_dv(encoded: str, size_in_bytes: int | None = None) -> list[int]:
    """Descriptor payload -> sorted row positions. Accepts the Delta-spec
    z85+roaring encoding; falls back to the pre-round-4 legacy
    base85+delta-varint encoding so tables written by earlier versions of
    this engine stay readable.

    The fallback is GATED on the descriptor shape: legacy descriptors
    recorded ``sizeInBytes == len(encoded)`` (the encoded-string length),
    while spec descriptors record the smaller unpadded serialized length.
    A corrupted spec payload therefore surfaces as a decode error instead
    of silently legacy-decoding into garbage row positions."""
    try:
        raw = z85_decode(encoded, size_in_bytes)
        return deserialize_roaring_bitmap_array(raw)
    except (ValueError, struct.error):
        if size_in_bytes is None or size_in_bytes == len(encoded):
            return _decode_legacy_varint(encoded)
        raise


def _decode_legacy_varint(encoded: str) -> list[int]:
    import base64

    raw = base64.b85decode(encoded)
    out: list[int] = []
    cur = shift = 0
    prev = -1
    for b in raw:
        cur |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            prev += cur
            out.append(prev)
            cur = shift = 0
    return out
