"""Pure-numpy media codecs (SURVEY.md §2.11 multimodal support).

The container ships no PIL/ffmpeg/soundfile, but two real formats need no
codec library at all — their containers are plain structs:

- BMP (Windows DIB, uncompressed 24-bit BI_RGB): 14-byte file header +
  40-byte BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes.
- WAV (RIFF PCM, 16-bit): RIFF/WAVE container, `fmt ` + `data` chunks.

These give ``decoder="real"`` an honest end-to-end path: real bytes in,
real pixels/samples out, executor-side inside mapInPandas. Encoders exist
so tests can synthesize valid files deterministically. Formats beyond
these still raise NotImplementedError at the decode site.
"""

from __future__ import annotations

import struct

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


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format detection for the real-decode dispatch."""
    if len(data) >= 2 and data[:2] == b"BM":
        return "bmp"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None
