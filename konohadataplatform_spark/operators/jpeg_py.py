"""Pure-stdlib+numpy baseline JPEG codec (ITU T.81 / JFIF).

Closes the last gap in the native decode matrix (BMP/PNG/WAV landed in
rounds 4-5): baseline sequential DCT, 8-bit samples, Huffman entropy
coding, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling,
restart markers — and, as of r6, **progressive (SOF2)**: spectral
selection, successive approximation (DC + AC first/refinement scans,
EOB runs, buffered correction bits), coefficients accumulated across
scans with one IDCT after EOI. Arithmetic coding, 12-bit and
hierarchical modes stay behind ``DecodeNotAvailable`` — loudly, not
silently wrong.

The encoder exists for tests and fixtures: standard Annex K Huffman
tables, configurable quantization (identity tables by default so
round-trip error is only DCT float rounding), optional 4:2:0 and
restart intervals. The decoder reads tables from the stream, so it
also decodes third-party baseline JFIF files, not just its own.

Reference parity: the reference platform delegates media decode to
PIL/opencv workers (SURVEY §2 multimodal notes); this is the
in-container stand-in with the same contract as decode_png/decode_bmp.

Determinism: the IDCT is float64 matrix math with a fixed operation
order (numpy matmul over a precomputed orthonormal DCT-II basis), so
identical bytes decode to identical pixels on every executor.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Orthonormal 8-point DCT-II basis: A[u, x] = c(u) cos((2x+1)u pi / 16).
# block = A.T @ coeffs @ A  (inverse);  coeffs = A @ block @ A.T (forward).
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


class JpegError(ValueError):
    """Malformed or corrupt JPEG stream."""


# ZIGZAG as an ndarray: numpy fancy indexing with a list re-converts it
# on EVERY call (once per block); the array form indexes directly.
_ZIGZAG_ARR = np.array(ZIGZAG)

# shared identity quant table (the encoder default) — read-only so the
# per-image np.ones allocation disappears without aliasing hazards
_Q_IDENTITY = np.ones((8, 8))
_Q_IDENTITY.setflags(write=False)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

# Tables repeat across images (every encoder emits Annex K; a corpus
# of same-writer files shares DHT bytes), so construction is memoized
# on the table CONTENT — a media kernel decoding N images per task
# builds each distinct table once per process instead of once per
# image. Pure metadata memoization: no pixel or stream data is cached.
_CODES_CACHE: dict[tuple[bytes, bytes], dict[int, tuple[int, int]]] = {}
_DECODE_CACHE: dict[tuple[bytes, bytes], "_HuffLUT"] = {}


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) from the DHT bits/values lists (F.2.2.3)."""
    key = (bytes(bits), bytes(values))
    hit = _CODES_CACHE.get(key)
    if hit is not None:
        return hit
    if len(_CODES_CACHE) >= 256:
        _CODES_CACHE.pop(next(iter(_CODES_CACHE)))
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    _CODES_CACHE[key] = out
    return out


class _HuffLUT:
    """Flat 16-bit-peek Huffman decode table: entry = (length<<8)|value,
    0 = invalid. One lookup decodes any code (max length 16 per T.81)
    instead of the bit-at-a-time tree walk — identical decoded symbols
    by construction (canonical codes are left-aligned prefixes)."""

    __slots__ = ("lut",)

    def __init__(self, bits: list[int], values: list[int]):
        lut = [0] * (1 << 16)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                # overfull-DHT guard (r14 ADVICE): past 2^length codes
                # the slice below would silently APPEND entries beyond
                # index 65535 and bloat the cached LUT; decode behavior
                # was safe either way (the 16-bit peek can't reach
                # appended entries), but a corrupt table should fail
                # loudly, not waste cache memory
                if code >= 1 << length:
                    raise JpegError("overfull Huffman table")
                entry = (length << 8) | values[k]
                base = code << (16 - length)
                span = 1 << (16 - length)
                lut[base : base + span] = [entry] * span
                code += 1
                k += 1
            code <<= 1
        self.lut = lut


def _decode_table(bits: list[int], values: list[int]) -> "_HuffLUT":
    """Memoized LUT decoder table (same (bits, values) -> same object).
    FIFO-capped: a pathological corpus with per-file custom tables must
    not grow an unbounded cache of 512 KB LUTs."""
    key = (bytes(bits), bytes(values))
    hit = _DECODE_CACHE.get(key)
    if hit is None:
        if len(_DECODE_CACHE) >= 64:
            _DECODE_CACHE.pop(next(iter(_DECODE_CACHE)))
        _DECODE_CACHE[key] = hit = _HuffLUT(bits, values)
    return hit


class _BitReader:
    """MSB-first reader over entropy-coded data; un-stuffs 0xFF00 and
    stops at restart/terminating markers (caller handles resync)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None  # marker encountered (e.g. 0xD0-0xD7)

    def _fill(self) -> None:
        # trim consumed high bits so acc stays machine-word-sized over
        # arbitrarily long scans (only the low nbits bits are live)
        acc = self.acc & ((1 << self.nbits) - 1)
        if self.marker is not None:
            # past a marker: spec F.2.2.5 pads with 1-bits
            self.acc = (acc << 8) | 0xFF
            self.nbits += 8
            return
        if self.pos >= len(self.data):
            raise JpegError("unexpected end of entropy-coded data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.acc = (acc << 8) | 0xFF
                self.nbits += 8
                return
        self.acc = (acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode_huff(self, table: "_HuffLUT") -> int:
        # one 16-bit peek + LUT hit replaces the per-bit tree walk;
        # prefilling past the code boundary is safe (fill state is
        # position-consistent, and marker fills pad with 1-bits exactly
        # as the per-bit reader would on demand). Known divergence on
        # already-malformed input only (r14 ADVICE): a stream truncated
        # mid-scan with no terminating marker raises "unexpected end of
        # entropy-coded data" up to 15 bits earlier than the per-bit
        # walk would (which could still finish a short final code);
        # valid JPEGs always terminate with a marker, and both paths
        # raise JpegError.
        while self.nbits < 16:
            self._fill()
        entry = table.lut[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if entry == 0:
            raise JpegError("invalid Huffman code")
        self.nbits -= entry >> 8
        return entry & 0xFF

    def sync_to_marker(self) -> int:
        """Byte-align, confirm a marker was reached, return it."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet consumed by _fill: scan forward
            while self.pos < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and self.pos + 1 < len(self.data)
                    and self.data[self.pos + 1] != 0x00
                ):
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
            else:
                raise JpegError("expected a marker in entropy stream")
        else:
            # _fill consumed the 0xFF prefix already (pos sits ON the
            # marker byte) — consume exactly that one byte, or the
            # first entropy byte of the next restart interval is lost
            self.pos += 1
        m, self.marker = self.marker, None
        return m


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map t received bits to a signed coefficient."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(content: bytes) -> dict:
    """Decode a baseline JFIF/JPEG. Returns {width, height, channels,
    pixels} with pixels as top-down interleaved RGB (or grayscale)
    bytes — the same contract as decode_png/decode_bmp."""
    from konohadataplatform_spark.operators.multimodal import DecodeNotAvailable

    if content[:2] != b"\xff\xd8":
        raise DecodeNotAvailable("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffLUT] = {}
    huff_ac: dict[int, _HuffLUT] = {}
    frame = None
    coeff_store = None
    restart_interval = 0
    pos = 2
    n = len(content)
    while pos < n:
        if content[pos] != 0xFF:
            raise JpegError(f"expected marker at byte {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (seglen,) = struct.unpack_from(">H", content, pos)
        seg = content[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = struct.unpack_from(f">{64}H", seg, p)
                    p += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, p)
                    p += 64
                table = np.zeros(64)
                table[_ZIGZAG_ARR] = vals
                qt[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17 : p + 17 + nvals])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, values)
                p += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline + SOF2 progressive
            prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise DecodeNotAvailable(f"{prec}-bit JPEG unsupported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": width, "h": height, "comps": comps,
                     "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise DecodeNotAvailable(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}): "
                "hierarchical/arithmetic/lossless modes need PIL"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0x0F))
            if not frame.get("prog"):
                return _decode_scan(
                    content, pos, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if coeff_store is None:
                coeff_store = _alloc_coeffs(frame)
            pos = _decode_prog_scan(
                content, pos, frame, scan, ss, se, ahal >> 4, ahal & 0x0F,
                huff_dc, huff_ac, restart_interval, coeff_store,
            )
        # else: APPn / COM / others — skipped
    if frame is not None and frame.get("prog") and coeff_store is not None:
        return _reconstruct_progressive(frame, coeff_store, qt)
    raise JpegError("no SOS marker found")


def _decode_scan(content, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }
    reader = _BitReader(content, pos)
    pred = {c["id"]: 0 for c in comps}
    nmcu = 0
    rst_expected = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                m = reader.sync_to_marker()
                if m != 0xD0 + rst_expected:
                    raise JpegError(f"bad restart marker 0xFF{m:02X}")
                rst_expected = (rst_expected + 1) % 8
                pred = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], pred, comp["id"]
                        )
                        block = _A.T @ (coeffs * q) @ _A + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            nmcu += 1
    return _planes_to_pixels(planes, comps, w, h, hmax, vmax)


def _decode_block(reader, dc_table, ac_table, pred, cid) -> np.ndarray:
    zz = np.zeros(64)
    t = reader.decode_huff(dc_table)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.decode_huff(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    out = np.zeros(64)
    out[_ZIGZAG_ARR] = zz
    return out.reshape(8, 8)


# ---------------------------------------------------------------------------
# progressive (SOF2) scans — T.81 §G: each scan contributes a spectral
# band and/or a successive-approximation bit plane to a persistent
# per-component coefficient array; the IDCT runs once, after EOI.
# ---------------------------------------------------------------------------

def _alloc_coeffs(frame):
    """Per-component int32 coefficient grids (zigzag order; T.81
    coefficients plus successive-approximation headroom fit easily),
    sized to the MCU-padded block grid so interleaved and
    non-interleaved scans index the same storage."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }


def _comp_used_blocks(frame, comp):
    """Non-interleaved block grid: ceil(ceil(dim*f/fmax)/8) per spec
    A.2.2 — may be smaller than the MCU-padded storage."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch = -(-frame["h"] * comp["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _next_marker_pos(content, p):
    """Position of the next non-stuffing, non-restart marker at or
    after ``p`` (the end of a progressive scan's entropy data)."""
    n = len(content)
    while p + 1 < n:
        if content[p] == 0xFF and content[p + 1] != 0x00:
            if 0xD0 <= content[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise JpegError("ran off the end looking for a marker")


def _decode_prog_scan(
    content, pos, frame, scan, ss, se, ah, al,
    huff_dc, huff_ac, restart_interval, coeffs,
):
    reader = _BitReader(content, pos)
    if ss == 0:
        if se != 0:
            raise JpegError("progressive DC scan must have Se=0")
        _prog_dc(reader, frame, scan, ah, al, huff_dc, restart_interval, coeffs)
    else:
        if len(scan) != 1:
            raise JpegError("progressive AC scans are non-interleaved")
        comp, _td, ta = scan[0]
        if ah == 0:
            _prog_ac_first(reader, frame, comp, huff_ac[ta], ss, se, al,
                           restart_interval, coeffs)
        else:
            _prog_ac_refine(reader, frame, comp, huff_ac[ta], ss, se, al,
                            restart_interval, coeffs)
    # trailing pad bits may have made _fill touch the scan-terminating
    # marker already — in that case pos sits ON the marker byte, one
    # past its 0xFF prefix
    end = reader.pos - 1 if reader.marker is not None else reader.pos
    return _next_marker_pos(content, end)


def _prog_dc(reader, frame, scan, ah, al, huff_dc, restart_interval, coeffs):
    pred = {c["id"]: 0 for c, _td, _ta in scan}
    rst_expected = 0
    nunit = 0

    def block(comp, td, by, bx):
        cz = coeffs[comp["id"]]
        if ah == 0:
            t = reader.decode_huff(huff_dc[td])
            diff = _extend(reader.read_bits(t), t) if t else 0
            pred[comp["id"]] += diff
            cz[by, bx, 0] = pred[comp["id"]] << al
        else:
            if reader.read_bit():
                cz[by, bx, 0] |= 1 << al

    def maybe_restart():
        nonlocal rst_expected, pred
        if restart_interval and nunit and nunit % restart_interval == 0:
            m = reader.sync_to_marker()
            if m != 0xD0 + rst_expected:
                raise JpegError(f"bad restart marker 0xFF{m:02X}")
            rst_expected = (rst_expected + 1) % 8
            pred = {c["id"]: 0 for c, _td, _ta in scan}

    if len(scan) > 1:  # interleaved over MCUs
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                maybe_restart()
                for comp, td, _ta in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            block(comp, td,
                                  my * comp["v"] + by, mx * comp["h"] + bx)
                nunit += 1
    else:
        comp, td, _ta = scan[0]
        bw, bh = _comp_used_blocks(frame, comp)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                block(comp, td, by, bx)
                nunit += 1


def _prog_ac_first(reader, frame, comp, ac, ss, se, al, restart_interval, coeffs):
    cz = coeffs[comp["id"]]
    bw, bh = _comp_used_blocks(frame, comp)
    eobrun = 0
    rst_expected = 0
    nunit = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and nunit and nunit % restart_interval == 0:
                m = reader.sync_to_marker()
                if m != 0xD0 + rst_expected:
                    raise JpegError(f"bad restart marker 0xFF{m:02X}")
                rst_expected = (rst_expected + 1) % 8
                eobrun = 0
            nunit += 1
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = reader.decode_huff(ac)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    # EOBn: this block ends; r extension bits count more
                    eobrun = (1 << r) - 1 + (reader.read_bits(r) if r else 0)
                    break
                k += r
                if k > se:
                    raise JpegError("AC run past end of spectral band")
                cz[by, bx, k] = _extend(reader.read_bits(s), s) << al
                k += 1


def _prog_ac_refine(reader, frame, comp, ac, ss, se, al, restart_interval, coeffs):
    cz = coeffs[comp["id"]]
    bw, bh = _comp_used_blocks(frame, comp)
    p1, m1 = 1 << al, -(1 << al)
    eobrun = 0
    rst_expected = 0
    nunit = 0

    def correct(zz, k):
        """Append a correction bit to an already-nonzero coefficient
        (magnitude grows toward the true value, spec G.1.2.3)."""
        if reader.read_bit():
            if zz[k] > 0 and not (zz[k] & p1):
                zz[k] += p1
            elif zz[k] < 0 and not (-zz[k] & p1):
                zz[k] += m1

    for by in range(bh):
        for bx in range(bw):
            if restart_interval and nunit and nunit % restart_interval == 0:
                m = reader.sync_to_marker()
                if m != 0xD0 + rst_expected:
                    raise JpegError(f"bad restart marker 0xFF{m:02X}")
                rst_expected = (rst_expected + 1) % 8
                eobrun = 0
            nunit += 1
            zz = cz[by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode_huff(ac)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                            break
                        newval = 0  # ZRL: skip 16 zero-history coeffs
                    elif s == 1:
                        newval = p1 if reader.read_bit() else m1
                    else:
                        raise JpegError("AC refinement size must be 0 or 1")
                    # advance over r zero-history coefficients, emitting
                    # correction bits for nonzero-history ones en route
                    while k <= se:
                        if zz[k] != 0:
                            correct(zz, k)
                        else:
                            if r == 0:
                                if s == 1:
                                    zz[k] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                # EOB tail: correction bits only, for the rest of the band
                while k <= se:
                    if zz[k] != 0:
                        correct(zz, k)
                    k += 1
                eobrun -= 1


def _reconstruct_progressive(frame, coeffs, qt):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = {}
    for c in comps:
        cz = coeffs[c["id"]]
        bh, bw_ = cz.shape[0], cz.shape[1]
        plane = np.zeros((bh * 8, bw_ * 8))
        q = qt[c["tq"]]
        for by in range(bh):
            for bx in range(bw_):
                nat = np.zeros(64)
                nat[_ZIGZAG_ARR] = cz[by, bx]
                block = nat.reshape(8, 8)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ (block * q) @ _A + 128.0
                )
        planes[c["id"]] = plane
    return _planes_to_pixels(planes, comps, frame["w"], frame["h"], hmax, vmax)


def _planes_to_pixels(planes, comps, w, h, hmax, vmax) -> dict:
    full = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "channels": 1, "pixels": gray.tobytes()}
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": rgb.tobytes()}


# ---------------------------------------------------------------------------
# encoder (tests/fixtures; also a valid baseline JFIF writer)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        # whole-code shift instead of a per-bit loop; byte emission and
        # 0xFF stuffing order are identical to the bit-at-a-time form
        acc = (self.acc << length) | (code & ((1 << length) - 1))
        nbits = self.nbits + length
        out = self.out
        while nbits >= 8:
            nbits -= 8
            b = (acc >> nbits) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits = nbits

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits (spec F.1.2.3)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, coeffs, pred, cid, dc_codes, ac_codes) -> None:
    # one tolist() then pure-Python scalars: numpy scalar indexing in
    # the trailing-zero scan costs ~10x a list access (values are exact
    # small integers out of rint, so the conversion is lossless)
    zz = coeffs.reshape(64)[_ZIGZAG_ARR].tolist()
    dc = int(zz[0])
    diff = dc - pred[cid]
    pred[cid] = dc
    t = _category(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)


def _dht_segment(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, values = table
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


_DQT_CACHE: dict[tuple[int, bytes], bytes] = {}


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    key = (tq, q.tobytes())
    hit = _DQT_CACHE.get(key)
    if hit is not None:
        return hit
    if len(_DQT_CACHE) >= 256:
        _DQT_CACHE.pop(next(iter(_DQT_CACHE)))
    zz = q.reshape(64)[_ZIGZAG_ARR]
    body = bytes([tq]) + bytes(int(v) for v in zz)
    out = b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    _DQT_CACHE[key] = out
    return out


def _ycc_planes(width, height, rgb, subsampling):
    """RGB bytes -> padded (Y, Cb, Cr) planes + (sh, sv) sampling
    factors — the ONE color-transform/subsample/pad pipeline shared by
    the baseline and progressive encoders (the progressive test
    suite's bit-identity contract depends on there being exactly one)."""
    px = np.frombuffer(rgb, np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    sh, sv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]

    def pad(plane, mh, mv):
        ph = -(-plane.shape[0] // mv) * mv
        pw = -(-plane.shape[1] // mh) * mh
        if ph == plane.shape[0] and pw == plane.shape[1]:
            return plane  # already aligned: skip the np.pad copy
        return np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    y = pad(y, 8 * sh, 8 * sv)
    cbs, crs = cb, cr
    if (sh, sv) != (1, 1):

        def box_mean(plane):
            p = pad(plane, sh, sv)
            return p.reshape(
                p.shape[0] // sv, sv, p.shape[1] // sh, sh
            ).mean(axis=(1, 3))

        cbs, crs = box_mean(cb), box_mean(cr)
    return y, pad(cbs, 8, 8), pad(crs, 8, 8), sh, sv


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    subsampling: str = "444",
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode top-down RGB bytes as baseline JFIF. Identity quant
    tables by default (round-trip error is then only DCT rounding)."""
    if subsampling not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    ql = _Q_IDENTITY if quant_luma is None else np.asarray(quant_luma, float)
    qc = _Q_IDENTITY if quant_chroma is None else np.asarray(quant_chroma, float)
    y, cbs, crs, sh, sv = _ycc_planes(width, height, rgb, subsampling)
    hmax, vmax = sh, sv

    mcux = y.shape[1] // (8 * hmax)
    mcuy = y.shape[0] // (8 * vmax)
    dc_l = _canonical_codes(*DC_LUM)
    ac_l = _canonical_codes(*AC_LUM)
    dc_c = _canonical_codes(*DC_CHR)
    ac_c = _canonical_codes(*AC_CHR)

    def fdct_q(plane, y0, x0, q):
        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        return np.rint((_A @ block @ _A.T) / q)

    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    entropy = bytearray()
    nmcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw.flush()
                entropy += bw.out
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = {1: 0, 2: 0, 3: 0}
            for by in range(vmax):
                for bx in range(hmax):
                    c = fdct_q(y, (my * vmax + by) * 8, (mx * hmax + bx) * 8, ql)
                    _encode_block(bw, c, pred, 1, dc_l, ac_l)
            for cid, plane in ((2, cbs), (3, crs)):
                c = fdct_q(plane, my * 8, mx * 8, qc)
                _encode_block(bw, c, pred, cid, dc_c, ac_c)
            nmcu += 1
    bw.flush()
    entropy += bw.out

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, ql) + _dqt_segment(1, qc)
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes([1, (hmax << 4) | vmax, 0])
    sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, AC_LUM)
    out += _dht_segment(0, 1, DC_CHR) + _dht_segment(1, 1, AC_CHR)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(
    width: int, height: int, gray: bytes, quant: np.ndarray | None = None
) -> bytes:
    """Single-component (grayscale) baseline JFIF — exercises the
    decoder's 1-channel path."""
    q = _Q_IDENTITY if quant is None else np.asarray(quant, float)
    y = np.frombuffer(gray, np.uint8).reshape(height, width).astype(np.float64)
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    if (ph, pw) != (height, width):
        y = np.pad(y, ((0, ph - height), (0, pw - width)), mode="edge")
    dc_l = _canonical_codes(*DC_LUM)
    ac_l = _canonical_codes(*AC_LUM)
    bw = _BitWriter()
    pred = {1: 0}
    for my in range(ph // 8):
        for mx in range(pw // 8):
            block = y[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
            coeffs = np.rint((_A @ block @ _A.T) / q)
            _encode_block(bw, coeffs, pred, 1, dc_l, ac_l)
    bw.flush()
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, q)
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, AC_LUM)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bw.out + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder — exists to prove the SOF2 decoder against real
# multi-scan streams (no JPEG library ships in this container). Emits
# every scan species the spec defines: interleaved DC first + DC
# refinement bit plane, per-component AC spectral bands with
# successive approximation (first pass at Al=1, refinement to Al=0),
# EOB runs, ZRL, buffered correction bits.
# ---------------------------------------------------------------------------

# one flat 8-bit-code Huffman table covering every (run, size) symbol a
# progressive AC scan can emit (EOBn r<<4, ZRL 0xF0, sizes 1-12);
# 208 codes < 255 so the all-ones code never occurs
PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 208, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(13)],
)


def _quantized_coeff_blocks(width, height, rgb, subsampling):
    """Identity-quant zigzag coefficient grids per component, via the
    shared ``_ycc_planes`` pipeline (same planes as encode_jpeg by
    construction)."""
    y, cbs, crs, sh, sv = _ycc_planes(width, height, rgb, subsampling)
    comps = [
        {"id": 1, "h": sh, "v": sv, "tq": 0},
        {"id": 2, "h": 1, "v": 1, "tq": 0},
        {"id": 3, "h": 1, "v": 1, "tq": 0},
    ]
    grids = {}
    for cid, plane in ((1, y), (2, cbs), (3, crs)):
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        grid = np.zeros((bh, bw_, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw_):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coeffs = np.rint(_A @ block @ _A.T)
                grid[by, bx] = coeffs.reshape(64)[_ZIGZAG_ARR]
        grids[cid] = grid
    return comps, grids


def _shifted(c: int, al: int) -> int:
    """AC successive approximation: magnitude shift (toward zero)."""
    m = abs(c) >> al
    return m if c >= 0 else -m


def _enc_dc_first(comps, grids, al, dc_codes):
    bw_ = _BitWriter()
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcuy = grids[1].shape[0] // comps[0]["v"]
    mcux = grids[1].shape[1] // comps[0]["h"]
    pred = {c["id"]: 0 for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        v = int(
                            grids[c["id"]][my * c["v"] + by, mx * c["h"] + bx, 0]
                        ) >> al
                        diff = v - pred[c["id"]]
                        pred[c["id"]] = v
                        t = _category(diff)
                        code, length = dc_codes[t]
                        bw_.write(code, length)
                        if t:
                            bw_.write(
                                diff if diff >= 0 else diff + (1 << t) - 1, t
                            )
    bw_.flush()
    return bytes(bw_.out)


def _enc_dc_refine(comps, grids, al):
    bw_ = _BitWriter()
    mcuy = grids[1].shape[0] // comps[0]["v"]
    mcux = grids[1].shape[1] // comps[0]["h"]
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        v = int(
                            grids[c["id"]][my * c["v"] + by, mx * c["h"] + bx, 0]
                        )
                        bw_.write((v >> al) & 1, 1)
    bw_.flush()
    return bytes(bw_.out)


def _enc_ac_first(grid, used, ss, se, al, ac_codes):
    bw_ = _BitWriter()
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun == 0:
            return
        r = eobrun.bit_length() - 1
        code, length = ac_codes[r << 4]
        bw_.write(code, length)
        if r:
            bw_.write(eobrun - (1 << r), r)
        eobrun = 0

    used_h, used_w = used
    for by in range(used_h):
        for bx in range(used_w):
            vals = [_shifted(int(grid[by, bx, k]), al) for k in range(ss, se + 1)]
            last = -1
            for i, v in enumerate(vals):
                if v:
                    last = i
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()
                continue
            emit_eobrun()
            r = 0
            for v in vals[: last + 1]:
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    code, length = ac_codes[0xF0]
                    bw_.write(code, length)
                    r -= 16
                s = _category(v)
                code, length = ac_codes[(r << 4) | s]
                bw_.write(code, length)
                bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
                r = 0
            if last < se - ss:
                eobrun += 1
    emit_eobrun()
    bw_.flush()
    return bytes(bw_.out)


def _enc_ac_refine(grid, used, ss, se, al, ac_codes):
    bw_ = _BitWriter()
    eobrun = 0
    pending: list[int] = []  # correction bits buffered behind an EOB run

    def emit_eobrun():
        nonlocal eobrun, pending
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            code, length = ac_codes[r << 4]
            bw_.write(code, length)
            if r:
                bw_.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            bw_.write(b, 1)
        pending = []

    used_h, used_w = used
    for by in range(used_h):
        for bx in range(used_w):
            coefs = [int(grid[by, bx, k]) for k in range(ss, se + 1)]
            absv = [abs(c) >> al for c in coefs]
            eob = -1
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i
            r = 0
            br: list[int] = []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    emit_eobrun()
                    code, length = ac_codes[0xF0]
                    bw_.write(code, length)
                    r -= 16
                    for b in br:
                        bw_.write(b, 1)
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                # newly significant (magnitude exactly 1 at this plane)
                emit_eobrun()
                code, length = ac_codes[(r << 4) | 1]
                bw_.write(code, length)
                bw_.write(1 if coefs[i] >= 0 else 0, 1)
                for b in br:
                    bw_.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    emit_eobrun()
    emit_eobrun()
    bw_.flush()
    return bytes(bw_.out)


def encode_jpeg_progressive(
    width: int, height: int, rgb: bytes, subsampling: str = "444"
) -> bytes:
    """Encode top-down RGB bytes as a progressive (SOF2) JFIF with
    identity quant tables and a full scan script: interleaved DC first
    (Al=1) + DC refinement, per-component AC bands 1-5 and 6-63 at Al=1
    with AC refinement passes down to Al=0."""
    if subsampling not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    comps, grids = _quantized_coeff_blocks(width, height, rgb, subsampling)
    dc_codes = _canonical_codes(*DC_LUM)
    ac_codes = _canonical_codes(*PROG_AC)

    out = bytearray(b"\xff\xd8")
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, _Q_IDENTITY)
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, PROG_AC)

    def sos(comp_specs, ss, se, ah, al, body):
        hdr = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            hdr += bytes([cid, (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        return (
            b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr + body
        )

    # non-interleaved AC scans cover only the USED block grid (spec
    # A.2.2 ceil dims), never the MCU-padding blocks the interleaved DC
    # scan carries — same helper the decoder uses, so encoder and
    # decoder block counts cannot diverge
    frame_like = {"w": width, "h": height, "comps": comps}
    used = {
        c["id"]: tuple(reversed(_comp_used_blocks(frame_like, c)))
        for c in comps
    }
    all_dc = [(c["id"], 0, 0) for c in comps]
    out += sos(all_dc, 0, 0, 0, 1, _enc_dc_first(comps, grids, 1, dc_codes))
    for cid in (1, 2, 3):
        out += sos([(cid, 0, 0)], 1, 5, 0, 1,
                   _enc_ac_first(grids[cid], used[cid], 1, 5, 1, ac_codes))
    for cid in (1, 2, 3):
        out += sos([(cid, 0, 0)], 6, 63, 0, 1,
                   _enc_ac_first(grids[cid], used[cid], 6, 63, 1, ac_codes))
    out += sos(all_dc, 0, 0, 1, 0, _enc_dc_refine(comps, grids, 0))
    for cid in (1, 2, 3):
        out += sos([(cid, 0, 0)], 1, 5, 1, 0,
                   _enc_ac_refine(grids[cid], used[cid], 1, 5, 0, ac_codes))
    for cid in (1, 2, 3):
        out += sos([(cid, 0, 0)], 6, 63, 1, 0,
                   _enc_ac_refine(grids[cid], used[cid], 6, 63, 0, ac_codes))
    out += b"\xff\xd9"
    return bytes(out)
