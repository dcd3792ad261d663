"""Pure-numpy media codecs (SURVEY.md §2.11 multimodal support).

The container ships no PIL/ffmpeg/soundfile, but three real formats need no
codec library at all — their containers are plain structs (PNG's one
dependency, DEFLATE, is stdlib zlib):

- BMP (Windows DIB, uncompressed 24-bit BI_RGB): 14-byte file header +
  40-byte BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes.
- WAV (RIFF PCM, 16-bit): RIFF/WAVE container, `fmt ` + `data` chunks.
- PNG (r12 verdict #7): 8-byte signature + IHDR/IDAT/IEND chunks, zlib
  inflate + per-row unfiltering (all five filter types) for 8-bit
  grayscale / gray+alpha / RGB / RGBA, non-interlaced.

These give ``decoder="real"`` an honest end-to-end path: real bytes in,
real pixels/samples out, executor-side inside mapInPandas. Encoders exist
so tests can synthesize valid files deterministically. Formats beyond
these still raise NotImplementedError at the decode site.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

BMP_HEADER_SIZE = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) → uncompressed 24-bit BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects a (H, W, 3) uint8 array")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    image_size = row_size * h
    file_size = BMP_HEADER_SIZE + image_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, BMP_HEADER_SIZE)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up row order, BGR channel order
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → RGB uint8 array (H, W, 3)."""
    if len(data) < BMP_HEADER_SIZE or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", data, 10)[0]
    (
        info_size,
        w,
        h,
        _planes,
        bpp,
        compression,
    ) = struct.unpack_from("<IiiHHI", data, 14)
    if info_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array (n,) or (n, channels) → PCM-16 WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    data = samples.astype("<i2").tobytes()  # interleaved frames
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 WAV bytes → (int16 array (n, channels), sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, end = 12, len(data)
    channels = sample_rate = None
    pcm = None
    while pos + 8 <= end:
        chunk_id = data[pos : pos + 4]
        chunk_len = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if chunk_id == b"fmt ":
            audio_format, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if audio_format != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM-16 WAV supported (format={audio_format}, bits={bits})"
                )
        elif chunk_id == b"data":
            pcm = data[body : body + chunk_len]
        pos = body + chunk_len + (chunk_len & 1)  # chunks are word-aligned
    if channels is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
    return samples.reshape(-1, channels), sample_rate


# --- PNG (pure stdlib-zlib + numpy; r12 verdict #7) --------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# IHDR color type → channel count (8-bit depths only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(kind: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + kind
        + body
        + struct.pack(">I", zlib.crc32(kind + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (H, W) grayscale or (H, W, C) with C ∈ {2, 3, 4} →
    non-interlaced 8-bit PNG bytes. ``filter_type`` picks the per-row
    filter (0-4) so tests can exercise every decoder unfilter path; 0
    (None) is the production default — our payloads are synthetic, and
    DEFLATE already removes the redundancy filtering targets."""
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("encode_png expects a (H, W[, C]) uint8 array")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter type {filter_type}")
    h, w = pixels.shape[:2]
    channels = 1 if pixels.ndim == 2 else pixels.shape[2]
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")
    flat = pixels.reshape(h, w * channels).astype(np.int64)
    bpp = channels
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int64)
    for y in range(h):
        row = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if filter_type == 0:
            out = row
        elif filter_type == 1:  # Sub
            out = row - left
        elif filter_type == 2:  # Up
            out = row - prev
        elif filter_type == 3:  # Average
            out = row - (left + prev) // 2
        else:  # Paeth
            out = row - _paeth(left, prev, upleft)
        raw.append(filter_type)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over int64 arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG bytes → uint8 array (H, W) for grayscale,
    (H, W, C) otherwise. Pure stdlib zlib inflate + numpy unfiltering —
    filters None/Sub/Up/Average/Paeth all supported. None/Up/Sub rows are
    fully vectorized (Sub is a per-lane prefix sum); Average/Paeth carry a
    floor/select dependency along the row and fall back to a per-pixel
    loop — foreign PNGs that filter with them decode correctly but slowly
    (a real deployment would swap in PIL here; see _real_decode's note)."""
    if len(data) < 8 or data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG file")
    pos, end = 8, len(data)
    width = height = color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= end:
        (length,) = struct.unpack_from(">I", data, pos)
        kind = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if kind == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif kind == b"IDAT":
            idat.extend(body)
        elif kind == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB/alpha PNG supported "
            f"(bit_depth={bit_depth}, color_type={color_type}, interlace={interlace})"
        )
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, rows = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    bpp = channels
    for y in range(height):
        f, row = int(filters[y]), rows[y]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f == 1:
            # Sub is a pure per-lane prefix sum (out[x] = row[x] + out[x-bpp])
            # and mod distributes over addition — vectorized as cumsum per
            # channel lane (r13 review: foreign PNGs filter nearly every
            # row, and the Python fallback below is per-pixel)
            cur = (row.reshape(-1, bpp).cumsum(axis=0) % 256).reshape(stride)
        elif f in (3, 4):  # Average/Paeth: floor/select break prefix linearity
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 3:
                    cur[x] = (row[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f} in row {y}")
        out[y] = cur
    pixels = out.astype(np.uint8)
    if channels == 1:
        return pixels.reshape(height, width)
    return pixels.reshape(height, width, channels)


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format detection for the real-decode dispatch."""
    if len(data) >= 2 and data[:2] == b"BM":
        return "bmp"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) >= 8 and data[:8] == PNG_SIGNATURE:
        return "png"
    return None
