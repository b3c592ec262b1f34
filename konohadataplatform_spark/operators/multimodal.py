"""Multimodal column plumbing (beyond-reference surface).

Images/audio/video are carried as opaque ``binary`` columns with a
typed metadata struct — the Spark-side schema, partitioning, and
Arrow-batched UDF plumbing are real and tested. Decode is REAL for
uncompressed 24-bit BMP, the COMPLETE PNG spec matrix (stdlib zlib +
filter reconstruction: gray/gray+alpha 1/2/4/8/16-bit, palette incl.
tRNS, RGB/RGBA 8/16-bit, gray/RGB tRNS color keys, Adam7 interlace —
r7), uncompressed baseline TIFF (both byte orders), PCM-16 WAV, and
JPEG (jpeg_py: Huffman + IDCT, 4:4:4/4:2:2/4:2:0, restart markers,
baseline AND progressive SOF2 — r6); the remaining PIL-only formats
(arithmetic-coded JPEG, compressed BMP/TIFF, WebP) raise
``DecodeNotAvailable`` loudly, with a deterministic-fake
feature fallback so the pipeline shape can be exercised end to end.

Scale posture: binary payloads never pass through a shuffle — feature
extraction is ``mapInPandas`` (per-partition, Arrow batches), and any
downstream joins/groupBys use only the extracted scalar features.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


class DecodeNotAvailable(NotImplementedError):
    """Raised when a real media decoder is requested in this container."""


# --------------------------------------------------------------------------
# Real codecs, no media libraries: uncompressed 24-bit BMP, 8-bit PNG,
# PCM-16 WAV (stdlib) and baseline JPEG (jpeg_py, numpy IDCT). Formats
# beyond these still raise DecodeNotAvailable for PIL/opencv.
# --------------------------------------------------------------------------

def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Build an uncompressed 24-bit BMP. ``pixels`` is top-down rows of
    BGR triplets (len == width*height*3); rows are written bottom-up
    with 4-byte padding per the format."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes of BGR")
    row_len = width * 3
    pad = (-row_len) % 4
    body = b"".join(
        pixels[r * row_len : (r + 1) * row_len] + b"\x00" * pad
        for r in range(height - 1, -1, -1)
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + info + body


TIFF_II = b"II*\x00"
TIFF_MM = b"MM\x00*"
_TIFF_TYPE = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}  # BYTE / SHORT / LONG


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    big_endian: bool = False,
) -> bytes:
    """Build an uncompressed baseline TIFF (classic, strip-based).

    ``pixels`` is top-down rows of 8-bit samples (RGB for channels=3,
    grayscale for channels=1), one strip. Both byte orders are
    supported (II little-endian default, MM big-endian) — the decoder
    must handle either, so the encoder can produce either for tests.
    """
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixels must be width*height*channels bytes")
    e = ">" if big_endian else "<"
    px_off = 8
    bps_off = px_off + len(pixels)
    # BitsPerSample: 3 SHORTs don't fit the 4-byte inline slot, so RGB
    # stores them externally; grayscale's single SHORT is inline
    ifd_off = bps_off + (6 if channels == 3 else 0)

    def entry(tag: int, typ: int, count: int, inline: bytes) -> bytes:
        return struct.pack(e + "HHI", tag, typ, count) + inline

    def short(v: int) -> bytes:  # left-justified inline SHORT
        return struct.pack(e + "HH", v, 0)

    def long_(v: int) -> bytes:
        return struct.pack(e + "I", v)

    entries = [
        entry(256, 3, 1, short(width)),
        entry(257, 3, 1, short(height)),
        entry(258, 3, channels, long_(bps_off) if channels == 3 else short(8)),
        entry(259, 3, 1, short(1)),  # Compression = none
        entry(262, 3, 1, short(2 if channels == 3 else 1)),  # RGB | BlackIsZero
        entry(273, 4, 1, long_(px_off)),  # StripOffsets
        entry(277, 3, 1, short(channels)),  # SamplesPerPixel
        entry(278, 3, 1, short(height)),  # RowsPerStrip
        entry(279, 4, 1, long_(len(pixels))),  # StripByteCounts
    ]
    ifd = struct.pack(e + "H", len(entries)) + b"".join(entries) + struct.pack(
        e + "I", 0
    )
    head = (TIFF_MM if big_endian else TIFF_II) + struct.pack(e + "I", ifd_off)
    bps_blob = struct.pack(e + "HHH", 8, 8, 8) if channels == 3 else b""
    return head + pixels + bps_blob + ifd


def decode_tiff(content: bytes) -> dict:
    """Decode an uncompressed baseline TIFF (either byte order,
    8-bit grayscale or RGB, any strip layout). Compressed / deeper
    bit-depth / tiled variants raise DecodeNotAvailable; structurally
    broken files raise ValueError."""
    if content[:4] == TIFF_II:
        e = "<"
    elif content[:4] == TIFF_MM:
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order/magic header")
    (ifd_off,) = struct.unpack_from(e + "I", content, 4)
    if ifd_off < 8 or ifd_off + 2 > len(content):
        raise ValueError("corrupt TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack_from(e + "H", content, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(content):
        raise ValueError("corrupt TIFF: truncated IFD")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", content, off)
        if typ not in _TIFF_TYPE:  # RATIONAL/ASCII metadata — not needed
            continue
        ch, size = _TIFF_TYPE[typ]
        total = size * cnt
        data_off = off + 8
        if total > 4:
            (data_off,) = struct.unpack_from(e + "I", content, off + 8)
        if data_off + total > len(content):
            raise ValueError(f"corrupt TIFF: tag {tag} data out of range")
        tags[tag] = list(struct.unpack_from(e + ch * cnt, content, data_off))
    try:
        width, height = tags[256][0], tags[257][0]
        strip_offsets = tags[273]
    except KeyError as exc:
        raise ValueError(f"corrupt TIFF: missing required tag {exc}") from exc
    compression = tags.get(259, [1])[0]
    if compression != 1:
        raise DecodeNotAvailable(
            f"TIFF compression={compression} requires PIL/libtiff; only "
            "uncompressed strips decode natively"
        )
    channels = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * channels)
    photometric = tags.get(262, [1])[0]
    if channels not in (1, 3) or any(b != 8 for b in bits) or photometric not in (
        0, 1, 2
    ):
        raise DecodeNotAvailable(
            f"TIFF spp={channels} bits={bits} photometric={photometric} "
            "requires PIL/libtiff"
        )
    counts = tags.get(279, [width * height * channels])
    data = b"".join(
        content[o : o + c] for o, c in zip(strip_offsets, counts)
    )
    expected = width * height * channels
    if len(data) < expected:
        raise ValueError("corrupt TIFF: strip data shorter than dimensions")
    pixels = data[:expected]
    if photometric == 0:  # WhiteIsZero: invert to BlackIsZero convention
        pixels = bytes(255 - b for b in pixels)
    return {
        "width": width,
        "height": height,
        "bpp": 8 * channels,
        "channels": channels,
        "pixels": pixels,
    }


def decode_image(content: bytes) -> dict:
    """Decode an image natively: uncompressed 24-bit BMP (stdlib
    struct; Windows BITMAPINFOHEADER layout), the complete PNG matrix
    (stdlib zlib + filter reconstruction: gray/gray+alpha/RGB/RGBA/
    palette, 1-16 bit, tRNS incl. color keys, Adam7 — r7), or JPEG
    (jpeg_py Huffman+IDCT, baseline + progressive SOF2 — r6). Returns
    width/height/bpp and the raw pixel bytes as top-down rows.
    Remaining formats (arithmetic-coded JPEG / compressed BMP / WebP)
    need PIL/opencv -> DecodeNotAvailable."""
    if content[:8] == PNG_SIG:
        return decode_png(content)
    if content[:2] == b"\xff\xd8":
        from konohadataplatform_spark.operators.jpeg_py import decode_jpeg

        img = decode_jpeg(content)
        return {
            "width": img["width"],
            "height": img["height"],
            "bpp": img["channels"] * 8,
            "channels": img["channels"],
            "pixels": img["pixels"],
        }
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from konohadataplatform_spark.operators.gif_py import decode_gif

        g = decode_gif(content)
        first = g["frames"][0]
        return {
            "width": first["width"],
            "height": first["height"],
            "bpp": 24,
            "channels": 3,
            "pixels": first["pixels"],
            "n_frames": g["n_frames"],
        }
    if content[:4] in (TIFF_II, TIFF_MM):
        return decode_tiff(content)
    if len(content) < 54 or content[:2] != b"BM":
        raise DecodeNotAvailable(
            "only JPEG (baseline + progressive), uncompressed 24-bit "
            "BMP, PNG (gray/RGB/RGBA/palette, 1-16 bit, Adam7), GIF, "
            "and uncompressed baseline TIFF decode natively; other "
            "image formats require PIL/opencv, not available in this "
            "environment"
        )
    offset = struct.unpack_from("<I", content, 10)[0]
    _, width, height, _, bpp, compression = struct.unpack_from(
        "<IiiHHI", content, 14
    )
    if bpp != 24 or compression != 0:
        raise DecodeNotAvailable(
            f"BMP bpp={bpp} compression={compression} requires PIL/opencv"
        )
    top_down = height < 0
    height = abs(height)
    row_len = width * 3
    stride = row_len + ((-row_len) % 4)
    rows = [
        content[offset + r * stride : offset + r * stride + row_len]
        for r in range(height)
    ]
    if not top_down:
        rows.reverse()
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "pixels": b"".join(rows),
    }


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2) -> bytes:
    """Build a non-interlaced 8-bit PNG (color_type 0 gray / 2 RGB /
    4 gray+alpha / 6 RGBA) from top-down pixel rows, filter 0 per
    scanline."""
    channels = _PNG_CHANNELS[color_type]
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixels must be width*height*{channels} bytes")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> dict:
    """Decode a PNG with the stdlib: chunk walk (CRC-checked), zlib
    inflate, then full scanline filter reconstruction (None/Sub/Up/
    Average/Paeth per the PNG spec §9).

    Native matrix (r6 widened, r7 COMPLETE — every color-type/depth/
    interlace/transparency combination the PNG spec defines): 8-bit
    gray/gray+alpha/RGB/RGBA non-interlaced on the fast byte path,
    PLUS palette (color_type 3 with PLTE, tRNS -> RGBA), gray/RGB tRNS
    transparent-color keys (alpha channel added, key compared at
    source depth), bit depths 1/2/4 (gray + palette) and 16
    (gray/gray+alpha/RGB/RGBA, emitted as 8-bit high bytes with
    ``bit_depth`` recording the source), and Adam7 interlace for all
    of the above on the general sample path."""
    if content[:8] != PNG_SIG:
        raise DecodeNotAvailable("not a PNG signature")
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos + 12 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if comp or filt:
        raise ValueError(
            f"PNG compression={comp} filter_method={filt}: only method 0 "
            "is defined by the spec"
        )
    supported = (
        (color_type in (0, 3) and depth in (1, 2, 4, 8, 16))
        or (color_type in (2, 4, 6) and depth in (8, 16))
    )
    if color_type == 3 and depth == 16:
        supported = False  # not a legal PNG combination
    if not supported:
        raise DecodeNotAvailable(
            f"PNG depth={depth} color_type={color_type}: outside the "
            "native matrix (gray 1/2/4/8/16, palette 1/2/4/8, "
            "gray+alpha/RGB/RGBA 8/16)"
        )
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    # gray/RGB tRNS (transparent-color key) compares at SOURCE depth,
    # so it routes through the general sample path even for plain 8-bit
    if (depth != 8 or color_type == 3 or interlace
            or (trns is not None and color_type in (0, 2))):
        return _decode_png_general(
            width, height, depth, color_type, interlace,
            zlib.decompress(b"".join(idat)), plte, trns,
        )
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    out, _consumed = _png_unfilter(raw, height, stride, channels)
    return {
        "width": width,
        "height": height,
        "bpp": 8 * channels,
        "channels": channels,
        "bit_depth": 8,
        "pixels": bytes(out),
    }


# Adam7 interlace passes: (x0, y0, dx, dy) per the PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> tuple[bytes, int]:
    """Reverse the per-scanline filters over packed bytes. ``bpp`` is
    the filter distance in BYTES (max(1, channels*depth//8)) — the spec
    defines Sub/Average/Paeth at byte granularity even for sub-byte
    depths. Returns (unfiltered bytes, bytes consumed).

    Sub and Up reconstruct vectorized (Sub is a per-byte-lane cumsum,
    Up one vector add); Average/Paeth keep the serial byte loop — their
    left-neighbor dependency is inherently sequential in x."""
    import numpy as np

    if len(raw) < height * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    rpos = 0
    for _r in range(height):
        f = raw[rpos]
        line = bytearray(raw[rpos + 1 : rpos + 1 + stride])
        rpos += 1 + stride
        if f == 1:  # Sub: out[i] = in[i] + out[i-bpp] == lane cumsum
            arr = np.frombuffer(bytes(line), dtype=np.uint8).astype(np.uint64)
            for lane in range(bpp):
                arr[lane::bpp] = np.cumsum(arr[lane::bpp])
            line = bytearray((arr & 0xFF).astype(np.uint8).tobytes())
        elif f == 2:  # Up: one wrapping vector add
            arr = np.frombuffer(bytes(line), dtype=np.uint8) + np.frombuffer(
                bytes(prev), dtype=np.uint8
            )
            line = bytearray(arr.tobytes())
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        out += line
        prev = line
    return bytes(out), rpos


# Per-byte Python filter reconstruction (Average/Paeth rows are
# serial in x) caps the general path: beyond this many pixels the
# decode would burn executor-minutes — fail loudly instead (the
# documented stand-in posture for a native imaging library).
PNG_GENERAL_MAX_PIXELS = 16_777_216  # 4096 x 4096


def _png_unpack_samples_np(row: bytes, n_samples: int, depth: int):
    """Packed scanline bytes -> uint16 sample vector (MSB-first),
    vectorized: frombuffer for 8/16-bit, unpackbits + a weight dot for
    sub-byte depths — no per-sample Python loop."""
    import numpy as np

    if depth == 8:
        return np.frombuffer(row, dtype=np.uint8, count=n_samples).astype(
            np.uint16
        )
    if depth == 16:
        return np.frombuffer(row, dtype=">u2", count=n_samples).astype(
            np.uint16
        )
    bits = np.unpackbits(np.frombuffer(row, dtype=np.uint8))
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return bits[: n_samples * depth].reshape(-1, depth) @ weights


def _decode_png_general(
    width: int,
    height: int,
    depth: int,
    color_type: int,
    interlace: int,
    raw: bytes,
    plte: bytes | None,
    trns: bytes | None,
) -> dict:
    """The general PNG sample path: palette / sub-byte / 16-bit /
    gray+alpha / Adam7. Output pixels are always 8 bits per channel
    (16-bit samples emit their high byte — the standard display
    downconversion); ``bit_depth`` records the source depth.

    Sample handling is numpy end to end (unpack -> strided scatter ->
    scale / palette fancy-indexing): the image holds one uint16 ndarray,
    never per-pixel Python objects. The remaining Python cost is the
    serial part of filter reconstruction, bounded by
    PNG_GENERAL_MAX_PIXELS."""
    import numpy as np

    if width * height > PNG_GENERAL_MAX_PIXELS:
        raise DecodeNotAvailable(
            f"PNG {width}x{height} exceeds the {PNG_GENERAL_MAX_PIXELS}-"
            "pixel general-path cap (stdlib filter reconstruction; "
            "use a native imaging library for larger images)"
        )
    channels = 1 if color_type in (0, 3) else _PNG_CHANNELS[color_type]
    # per-pixel samples of the full image, scattered by pass
    img = np.zeros((height, width * channels), dtype=np.uint16)
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * channels * depth + 7) // 8
        bpp = max(1, (channels * depth) // 8)
        unfiltered, consumed = _png_unfilter(raw[pos:], ph, stride, bpp)
        pos += consumed
        # unpack the whole pass, then scatter with strided indexing:
        # rows land at y0::dy, pixel i's channels at (x0 + i*dx)*ch + c
        samples = np.vstack([
            _png_unpack_samples_np(
                unfiltered[j * stride : (j + 1) * stride], pw * channels, depth
            )
            for j in range(ph)
        ])  # (ph, pw*channels)
        cols = (
            (x0 + np.arange(pw) * dx)[:, None] * channels + np.arange(channels)
        ).ravel()
        img[y0 : y0 + ph * dy : dy][:, cols] = samples
    if pos != len(raw):
        raise ValueError("PNG scanline data length mismatch")
    # sample -> 8-bit channel values, vectorized
    if color_type == 3:
        idx = img  # palette indices
        n_pal = len(plte) // 3
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError(
                f"palette index {int(idx.max())} out of range"
            )
        pal = np.frombuffer(plte, dtype=np.uint8)[: n_pal * 3].reshape(-1, 3)
        if trns is not None:
            alpha = np.full(n_pal, 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            pal = np.hstack([pal, alpha[:, None]])
        rgb = pal[idx.ravel()]  # (h*w, 3 or 4) fancy-indexed lookup
        channels = rgb.shape[1]
        out = rgb.reshape(-1).tobytes()
    else:
        if depth == 16:
            scaled = (img >> 8).astype(np.uint8)
        elif depth == 8:
            scaled = img.astype(np.uint8)
        else:
            mx = (1 << depth) - 1
            scaled = ((img.astype(np.uint32) * 255) // mx).astype(np.uint8)
        if trns is not None and color_type in (0, 2):
            # transparent-color key (spec §11.3.2): a pixel matching the
            # key on EVERY channel at source depth gets alpha 0 — the
            # output gains an alpha channel (gray->GA, RGB->RGBA)
            key = np.frombuffer(trns, dtype=">u2").astype(np.uint16)
            if key.size != channels:
                raise ValueError(
                    f"PNG tRNS carries {key.size} samples for a "
                    f"{channels}-channel color type"
                )
            px = img.reshape(height, width, channels)
            transparent = (px == key[None, None, :]).all(axis=2)
            alpha = np.where(transparent, 0, 255).astype(np.uint8)
            scaled = np.concatenate(
                [scaled.reshape(height, width, channels), alpha[:, :, None]],
                axis=2,
            )
            channels += 1
        out = scaled.tobytes()
    return {
        "width": width,
        "height": height,
        "bpp": 8 * channels,
        "channels": channels,
        "bit_depth": depth,
        "pixels": out,
    }


def encode_wav(samples: list[int], sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Build a PCM-16 mono/stereo WAV from signed 16-bit samples."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    block = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block, block, 16,
    )
    data = struct.pack("<4sI", b"data", len(body)) + body
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_audio(content: bytes) -> dict:
    """Decode a PCM-16 RIFF/WAV (stdlib struct, chunk-walking).
    Returns channels / sample_rate / n_samples / duration_ms / samples.
    Non-PCM or non-WAV audio requires a codec library."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise DecodeNotAvailable(
            "only PCM WAV decodes natively; other audio formats require "
            "a codec library, not available in this environment"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise DecodeNotAvailable("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise DecodeNotAvailable(
            f"WAV format={audio_format} bits={bits} requires a codec library"
        )
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "n_samples": n // channels,
        "duration_ms": (n // channels) * 1000 // sample_rate,
        "samples": samples,
    }


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding: bytes of sha256 scaled to [0,1).
    Stands in for a real encoder so plumbing is testable."""
    h = hashlib.sha256(content).digest()
    return [b / 256.0 for b in h[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Uses mapInPandas so each executor processes whole record batches;
    the binary column is consumed here and dropped from the output, so
    nothing heavy crosses a shuffle afterwards.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": content.map(lambda b: len(b) if b is not None else 0),
                    "content_sha": content.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": content.map(
                        lambda b: _fake_feature(b, dim) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat documents.text as opaque binary payloads, giving a
    deterministic media table for exercising the pipeline."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
        T.StructField("frame_sha", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 64, stride: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video/audio payloads.

    Real decoders would emit decoded frames; without media libs the
    "frames" are fixed-size byte windows taken every ``stride`` windows
    — the Spark-side shape (binary in, many typed rows out, Arrow
    batches, no shuffle of payloads) is exactly the production plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": [], "frame_sha": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                n = len(content)
                for idx, off in enumerate(range(0, n, frame_size * stride)):
                    frame = bytes(content[off : off + frame_size])
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(frame)
                    out["frame_sha"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), True),       # bmp|wav|opaque
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mean_val", T.DoubleType(), True),  # pixel or sample mean
    ]
)


def decode_features(media: DataFrame) -> DataFrame:
    """REAL decode over binary payloads (Arrow batches, no payload
    shuffle): BMP -> width/height/mean pixel, WAV -> sample count/
    duration/mean amplitude, anything else -> opaque row with nulls.
    The Spark plan is identical to a production decode stage — only the
    codec set is container-limited (stdlib BMP/WAV; PIL formats raise
    DecodeNotAvailable inside decode_image/decode_audio)."""

    def one(mid, content):
        if content is None:
            return (mid, None, None, None, None, None, None)
        b = bytes(content)
        if b[:8] == PNG_SIG:
            img = decode_png(b)
            px = img["pixels"]
            mean = sum(px) / len(px) if px else None
            return (mid, "png", img["width"], img["height"], None, None, mean)
        if b[:2] == b"BM":
            img = decode_image(b)
            px = img["pixels"]
            mean = sum(px) / len(px) if px else None
            return (mid, "bmp", img["width"], img["height"], None, None, mean)
        if b[:2] == b"\xff\xd8":
            img = decode_image(b)
            px = img["pixels"]
            mean = sum(px) / len(px) if px else None
            return (mid, "jpeg", img["width"], img["height"], None, None, mean)
        if b[:4] in (TIFF_II, TIFF_MM):
            img = decode_tiff(b)
            px = img["pixels"]
            mean = sum(px) / len(px) if px else None
            return (mid, "tiff", img["width"], img["height"], None, None, mean)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            from konohadataplatform_spark.operators.gif_py import decode_gif

            g = decode_gif(b)
            first = g["frames"][0]
            px = first["pixels"]
            mean = sum(px) / len(px) if px else None
            total_ms = sum(f["delay_ms"] for f in g["frames"])
            return (
                mid, "gif", first["width"], first["height"],
                g["n_frames"], total_ms, mean,
            )
        if b[:4] == b"RIFF":
            au = decode_audio(b)
            ss = au["samples"]
            mean = sum(ss) / len(ss) if ss else None
            return (
                mid, "wav", None, None, au["n_samples"], au["duration_ms"], mean,
            )
        return (mid, "opaque", None, None, None, None, None)

    cols = [f.name for f in DECODED_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(m, c) for m, c in zip(pdf["media_id"], pdf["content"])]
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, DECODED_SCHEMA)


def documents_as_bmp(docs: DataFrame, width: int = 8, height: int = 4) -> DataFrame:
    """Deterministic REAL image payloads: each document becomes a
    width x height 24-bit BMP whose pixel bytes are the md5 digest of
    its text cycled to fill the image — so decoded features are exactly
    reproducible from the text (the SQL oracle recomputes them from
    md5 hex)."""
    npix = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_bmp(
                    width, height,
                    (hashlib.md5(t.encode()).digest() * ((npix // 16) + 1))[:npix],
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": content})

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )


def documents_as_png(docs: DataFrame, width: int = 8, height: int = 4) -> DataFrame:
    """Deterministic REAL PNG payloads: each document becomes a
    width x height 8-bit RGB PNG whose pixel bytes are the md5 digest
    of its text cycled to fill the image — decode round-trips through
    zlib + filter reconstruction, and decoded features are exactly
    reproducible from the text (the SQL oracle recomputes the digest-
    byte mean from md5 hex, valid whenever width*height*3 is a
    multiple of 16)."""
    npix = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_png(
                    width, height,
                    (hashlib.md5(t.encode()).digest() * ((npix // 16) + 1))[:npix],
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": content})

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )


def documents_as_tiff(docs: DataFrame, width: int = 8, height: int = 4) -> DataFrame:
    """Deterministic REAL TIFF payloads: each document becomes a
    width x height 8-bit RGB uncompressed TIFF whose pixel bytes are
    the md5 digest of its text cycled to fill the image — the same
    oracle contract as documents_as_bmp/png. Byte order alternates by
    doc_id parity so both II and MM files flow through the decoder."""
    npix = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_tiff(
                    width, height,
                    (hashlib.md5(t.encode()).digest() * ((npix // 16) + 1))[:npix],
                    big_endian=bool(i % 2),
                )
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": content})

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )


def documents_as_wav(
    docs: DataFrame, sample_rate: int = 8000, n_samples: int = 8
) -> DataFrame:
    """Deterministic REAL audio payloads: ``n_samples`` signed 16-bit
    samples (little-endian pairs) from an md5 hash chain, PCM mono WAV.

    The byte stream is the digest of ``md5(text)`` extended by
    re-hashing the previous *hex string* (`md5(md5(text))`, then
    ``md5(md5(md5(text)))``, ...) — exactly what SQL ``md5()``
    composition produces, so an engine-independent oracle can rebuild
    the samples with nothing but nested ``md5`` calls. The default
    ``n_samples=8`` consumes a single digest and is byte-identical to
    the original fixed-8 builder."""
    nbytes = 2 * n_samples

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for t in pdf["text"]:
                hx = hashlib.md5(t.encode()).hexdigest()
                buf = bytes.fromhex(hx)
                while len(buf) < nbytes:
                    hx = hashlib.md5(hx.encode()).hexdigest()
                    buf += bytes.fromhex(hx)
                samples = list(
                    struct.unpack(f"<{n_samples}h", buf[:nbytes])
                )
                content.append(encode_wav(samples, sample_rate))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": content})

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize for the natively-decodable formats
    (BMP, 8-bit PNG, baseline JPEG), re-encoded in the source format.
    PIL-only formats raise DecodeNotAvailable from decode_image."""
    is_png = content[:8] == PNG_SIG
    is_jpeg = content[:2] == b"\xff\xd8"
    is_tiff = content[:4] in (TIFF_II, TIFF_MM)
    img = decode_image(content)
    ch = img.get("channels", 3)
    src_w, src_h, px = img["width"], img["height"], img["pixels"]
    out = bytearray()
    for y in range(height):
        sy = y * src_h // height
        row_base = sy * src_w
        for x in range(width):
            off = (row_base + x * src_w // width) * ch
            out += px[off : off + ch]
    if is_png:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        return encode_png(width, height, bytes(out), color_type)
    if is_jpeg:
        from konohadataplatform_spark.operators.jpeg_py import (
            encode_jpeg,
            encode_jpeg_gray,
        )

        if ch == 1:
            return encode_jpeg_gray(width, height, bytes(out))
        return encode_jpeg(width, height, bytes(out))
    if is_tiff:
        return encode_tiff(
            width, height, bytes(out), channels=ch,
            big_endian=content[:2] == b"MM",
        )
    return encode_bmp(width, height, bytes(out))


def thumbnail_features(media: DataFrame, dim: int = 4) -> DataFrame:
    """Resize-then-embed pipeline shape with the resize stubbed to a
    deterministic byte-decimation (every k-th byte), then the fake
    encoder. The operator chain (binary -> smaller binary -> feature)
    matches a production thumbnail pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["content"].map(
                lambda b: bytes(b[::8]) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": thumbs.map(lambda b: len(b) if b is not None else 0),
                    "content_sha": thumbs.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": thumbs.map(
                        lambda b: _fake_feature(b, dim) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_jpeg(docs: DataFrame) -> DataFrame:
    """Deterministic REAL baseline-JPEG payloads: each document becomes
    a 16x16 grayscale JPEG of four 8x8 constant blocks whose values are
    the first 4 md5 bytes of its text. Constant blocks are DC-only, so
    the identity-quant encode/decode round trip is EXACT (verified over
    every fixture doc and all 256 block values) — decoded features are
    reproducible from the text and the SQL oracle recomputes them from
    md5 hex, the same contract as documents_as_bmp/png."""
    from konohadataplatform_spark.operators.jpeg_py import encode_jpeg_gray

    def one(text: str) -> bytes:
        d = hashlib.md5(text.encode()).digest()[:4]
        # four constant 8x8 quadrants, assembled row-wise (identical
        # bytes to the per-pixel indexing, ~10x fewer Python ops)
        top = (bytes([d[0]]) * 8 + bytes([d[1]]) * 8) * 8
        bot = (bytes([d[2]]) * 8 + bytes([d[3]]) * 8) * 8
        return encode_jpeg_gray(16, 16, top + bot)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": [one(t) for t in pdf["text"]]}
            )

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )


def documents_as_gif(docs: DataFrame, n_frames: int = 2) -> DataFrame:
    """Deterministic REAL animated-GIF payloads (the video-column
    analog): each doc becomes an 8x4 GIF whose frames index a 16-gray
    palette by md5 digest bytes (frame k starts at byte offset 4*k,
    cycling) — exact-match palette encode, so decode round-trips
    bit-perfectly and the SQL oracle recomputes frame means from md5
    hex, like documents_as_bmp/png/jpeg."""
    from konohadataplatform_spark.operators.gif_py import encode_gif

    palette = bytes(c for i in range(16) for c in (17 * i, 17 * i, 17 * i))
    w, h = 8, 4

    def one(text: str) -> bytes:
        d = hashlib.md5(text.encode()).digest()
        frames = []
        for k in range(n_frames):
            px = bytes(
                c
                for i in range(w * h)
                for g in (17 * (d[(i + 4 * k) % 16] % 16),)
                for c in (g, g, g)
            )
            frames.append(px)
        return encode_gif(w, h, frames, palette=palette, delay_ms=40)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": [one(t) for t in pdf["text"]]}
            )

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )


GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("delay_ms", T.LongType(), True),
        T.StructField("frame_mean", T.DoubleType(), True),
    ]
)


def gif_frames(media: DataFrame, stride: int = 1) -> DataFrame:
    """REAL frame extraction from animated-GIF payloads: one output row
    per kept frame (every ``stride``-th), with per-frame pixel means —
    the video frame-sampling stage with actual decode work. Arrow
    batches, payloads never shuffle; downstream joins see only scalar
    frame features."""
    from konohadataplatform_spark.operators.gif_py import decode_gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                g = decode_gif(bytes(content))
                for i, fr in enumerate(g["frames"]):
                    if i % stride:
                        continue
                    px = fr["pixels"]
                    rows.append(
                        (
                            mid, i, fr["width"], fr["height"], fr["delay_ms"],
                            sum(px) / len(px) if px else None,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in GIF_FRAME_SCHEMA.fields])

    return media.mapInPandas(run, GIF_FRAME_SCHEMA)


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("diff_sum", T.LongType(), True),
        T.StructField("is_cut", T.BooleanType(), True),
    ]
)


def video_scene_cuts(media: DataFrame, threshold: int = 8160) -> DataFrame:
    """Scene-change detection over animated payloads (the video-column
    analog): one row per frame TRANSITION — ``frame_idx`` is the later
    frame — with the exact integer sum of absolute per-channel pixel
    differences and an ``is_cut`` flag at ``threshold``. This is the
    shot-segmentation primitive a video training pipeline runs before
    sampling representative frames (cut-bounded strides instead of
    blind ones). Exact integer arithmetic end to end; Arrow batches,
    payloads never shuffle."""
    from konohadataplatform_spark.operators.gif_py import decode_gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                g = decode_gif(bytes(content))
                frames = [bytes(fr["pixels"]) for fr in g["frames"]]
                for i in range(1, len(frames)):
                    a, b = frames[i - 1], frames[i]
                    d = sum(abs(x - y) for x, y in zip(a, b))
                    rows.append((mid, i, d, d >= threshold))
            yield pd.DataFrame(
                rows, columns=[f.name for f in SCENE_CUT_SCHEMA.fields]
            )

    return media.mapInPandas(run, SCENE_CUT_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def audio_window_stats(media: DataFrame, window: int = 4) -> DataFrame:
    """Windowed audio analysis over PCM payloads: per fixed window of
    ``window`` samples, the energy (sum of squares), zero-crossing
    count (sign changes between consecutive in-window samples; 0 counts
    as non-negative), and peak |amplitude| — the silence/clipping/
    activity features an audio curation pipeline filters on. Exact
    integer math end to end (oracle-replayable); trailing partial
    windows are kept. Arrow batches, payloads never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                au = decode_audio(bytes(content))
                ss = au["samples"]
                for w0 in range(0, len(ss), window):
                    sub = ss[w0 : w0 + window]
                    zc = sum(
                        1
                        for a, b in zip(sub, sub[1:])
                        if (a < 0) != (b < 0)
                    )
                    rows.append(
                        (
                            mid,
                            w0 // window,
                            sum(x * x for x in sub),
                            zc,
                            max(abs(x) for x in sub),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_WINDOW_SCHEMA.fields]
            )

    return media.mapInPandas(run, AUDIO_WINDOW_SCHEMA)


def documents_as_mixed_media(docs: DataFrame) -> DataFrame:
    """One binary column, five modalities: each doc becomes a BMP, PNG,
    JPEG, GIF, or WAV payload (doc_id % 5) built from its md5 digest
    with the same per-format fixtures as the single-format builders —
    the realistic shape of a crawled multimodal corpus, exercising the
    full decode dispatch under ONE scan."""
    from konohadataplatform_spark.operators.gif_py import encode_gif
    from konohadataplatform_spark.operators.jpeg_py import encode_jpeg_gray

    gif_pal = bytes(c for i in range(16) for c in (17 * i, 17 * i, 17 * i))

    def one(doc_id: int, text: str) -> bytes:
        d = hashlib.md5(text.encode()).digest()
        kind = doc_id % 5
        if kind == 0:
            return encode_bmp(8, 4, (d * 7)[: 8 * 4 * 3])
        if kind == 1:
            return encode_png(8, 4, (d * 7)[: 8 * 4 * 3])
        if kind == 2:
            top = (bytes([d[0]]) * 8 + bytes([d[1]]) * 8) * 8
            bot = (bytes([d[2]]) * 8 + bytes([d[3]]) * 8) * 8
            return encode_jpeg_gray(16, 16, top + bot)
        if kind == 3:
            frames = []
            for k in range(2):
                frames.append(
                    bytes(
                        c
                        for i in range(32)
                        for g in (17 * (d[(i + 4 * k) % 16] % 16),)
                        for c in (g, g, g)
                    )
                )
            return encode_gif(8, 4, frames, palette=gif_pal, delay_ms=40)
        return encode_wav(list(struct.unpack("<8h", d)), 8000)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": [
                        one(int(i), t) for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )


def audio_utterances(media: DataFrame, window: int = 4) -> DataFrame:
    """VAD-style utterance segmentation: windows whose energy exceeds
    the clip's mean (integer cross-multiplication — ``energy * n_win >
    total_energy``, no float division) are "speech"; consecutive
    active windows merge into utterance spans via the island trick
    (window_idx - per-clip rank is constant within a run). Returns
    (media_id, utt_idx, start_win, end_win, n_windows, utt_energy) —
    the segments a speech pipeline would cut and transcribe.

    Scale: decode stays in audio_window_stats' mapInPandas (payloads
    never shuffle); the mean join keys on media_id (unique per clip);
    the island windows partition per clip, bounded by clip length —
    never by corpus size. Same island-merge shape as
    dedup.exact_substring_spans."""
    from pyspark.sql.window import Window as _W

    stats = audio_window_stats(media, window)
    # per-clip mean via an unordered window over the SAME relation —
    # one decode pass (an aggregate+join spelling re-runs the
    # mapInPandas decode for each subplan); partition size is bounded
    # by clip length, never corpus size
    clip_w = _W.partitionBy("media_id")
    active = stats.withColumn(
        "_te", F.sum("energy").over(clip_w)
    ).withColumn("_nw", F.count(F.lit(1)).over(clip_w)).where(
        F.col("energy") * F.col("_nw") > F.col("_te")
    )
    rank_w = _W.partitionBy("media_id").orderBy("window_idx")
    grouped = active.withColumn(
        "_isl", F.col("window_idx") - F.row_number().over(rank_w)
    ).groupBy("media_id", "_isl").agg(
        F.min("window_idx").alias("start_win"),
        F.max("window_idx").alias("end_win"),
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("energy").alias("utt_energy"),
    )
    utt_w = _W.partitionBy("media_id").orderBy("start_win")
    return grouped.select(
        "media_id",
        (F.row_number().over(utt_w) - 1).alias("utt_idx"),
        "start_win",
        "end_win",
        "n_windows",
        "utt_energy",
    )
