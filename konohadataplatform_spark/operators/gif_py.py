"""Pure-stdlib GIF codec (GIF87a/89a, LZW) — the animated format.

With BMP/PNG (stills), WAV (audio), and JPEG (compressed stills)
already native, GIF gives the multimodal pipeline a REAL multi-frame
"video" payload: ``decode_gif`` returns every frame as RGB bytes, so
frame-sampling operators exercise genuine decode work instead of the
deterministic-fake byte decimation.

Implemented: logical screen + global/local color tables, graphic
control extensions (frame delay), image descriptors, full LZW
decompression (variable code width, clear/EOI codes), interlaced row
ordering, and an encoder with real LZW compression (dictionary reset
at 4096 codes) for round-trip tests. Not implemented: frame
composition/disposal blending (frames decode independently against
their palette) and transparency flattening — documented, loud where it
matters.
"""

from __future__ import annotations

import struct

GIF_SIGS = (b"GIF87a", b"GIF89a")


class GifError(ValueError):
    """Malformed GIF stream."""


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """Variable-width LZW per the GIF spec, little-endian bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table) and table[code]:
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise GifError(f"bad LZW code {code}")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(min_code_size: int, pixels: list[int]) -> bytes:
    """Real LZW compression (prefix-dict), dictionary reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    buf: tuple = ()
    for px in pixels:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (px,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    order = (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )
    fixed: list[bytes] = [b""] * height
    for src, dst in enumerate(order):
        fixed[dst] = rows[src]
    return fixed


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_gif(content: bytes) -> dict:
    """Decode every frame. Returns {width, height, n_frames, frames:
    [{x, y, width, height, delay_ms, pixels(RGB top-down)}]}."""
    if content[:6] not in GIF_SIGS:
        raise GifError("not a GIF signature")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = content[pos : pos + 3 * n]
        pos += 3 * n
    frames = []
    delay_ms = 0
    while pos < len(content):
        b = content[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = content[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = content[pos]
                _gflags, delay_cs = struct.unpack_from("<BH", content, pos + 1)
                delay_ms = delay_cs * 10
                pos += 1 + size
                if content[pos] != 0:
                    raise GifError("graphic control missing terminator")
                pos += 1
            else:  # skip sub-blocks (comment, app, plain text)
                while True:
                    size = content[pos]
                    pos += 1
                    if size == 0:
                        break
                    pos += size
        elif b == 0x2C:  # image descriptor
            x, y, w, h, iflags = struct.unpack_from("<HHHHB", content, pos)
            pos += 9
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                palette = content[pos : pos + 3 * n]
                pos += 3 * n
            elif gct is not None:
                palette = gct
            else:
                raise GifError("no color table for frame")
            min_code = content[pos]
            pos += 1
            data = bytearray()
            while True:
                size = content[pos]
                pos += 1
                if size == 0:
                    break
                data += content[pos : pos + size]
                pos += size
            idx = _lzw_decode(min_code, bytes(data))
            if len(idx) < w * h:
                raise GifError(f"frame underflow: {len(idx)} < {w * h}")
            rows = [
                bytes(
                    byte
                    for i in idx[r * w : (r + 1) * w]
                    for byte in palette[3 * i : 3 * i + 3]
                )
                for r in range(h)
            ]
            if iflags & 0x40:
                rows = _deinterlace(rows, h)
            frames.append(
                {
                    "x": x,
                    "y": y,
                    "width": w,
                    "height": h,
                    "delay_ms": delay_ms,
                    "pixels": b"".join(rows),
                }
            )
            delay_ms = 0
        else:
            raise GifError(f"unknown block 0x{b:02X} at byte {pos - 1}")
    return {"width": sw, "height": sh, "n_frames": len(frames), "frames": frames}


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: bytes | None = None,
    delay_ms: int = 100,
) -> bytes:
    """Encode RGB frames as an animated GIF89a. Colors are quantized
    to the (at most 256-entry) palette by exact match — callers supply
    frames drawn FROM the palette (the deterministic-fixture contract;
    a general quantizer is out of scope). Default palette: 216-color
    web cube + grays."""
    if palette is None:
        cube = bytes(
            c
            for r in range(0, 256, 51)
            for g in range(0, 256, 51)
            for b in range(0, 256, 51)
            for c in (r, g, b)
        )
        grays = bytes(c for v in range(0, 256, 8) for c in (v, v, v))
        palette = (cube + grays)[: 256 * 3]
    n_colors = len(palette) // 3
    size_pow = max(1, (n_colors - 1).bit_length())
    padded = palette + b"\x00" * ((2 << (size_pow - 1)) * 3 - len(palette))
    lookup = {
        tuple(palette[3 * i : 3 * i + 3]): i for i in range(n_colors)
    }
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (size_pow - 1), 0, 0)
    out += padded
    min_code = max(2, size_pow)
    for rgb in frames:
        idx = []
        for i in range(0, len(rgb), 3):
            key = (rgb[i], rgb[i + 1], rgb[i + 2])
            if key not in lookup:
                raise GifError(f"color {key} not in palette (exact-match encoder)")
            idx.append(lookup[key])
        out += b"\x21\xf9" + struct.pack("<BBHB", 4, 0, delay_ms // 10, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(min_code)
        payload = _lzw_encode(min_code, idx)
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
