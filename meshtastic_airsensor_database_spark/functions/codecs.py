"""Pure-Python media codecs for the multimodal operators
(SURVEY.md §2.11 multimodal_columns).

This container ships no PIL/librosa/ffmpeg, but two formats need only
``struct``/``numpy``: binary PPM (P6) images and PCM WAV audio. These
give the ``mapInPandas`` media path REAL byte decoding — header parse,
pixel/sample array, nearest-neighbor resize, re-encode — instead of a
stand-in, while anything unrecognized still falls back to the
documented deterministic stub. Production swaps/extends the codec
table; the Spark plumbing (Arrow batches, schemas, 1:N caps) is
format-agnostic.

All functions operate on ``bytes`` in, ``bytes``/arrays out — no
filesystem, no global state — so they are safe inside Arrow-batched
Python workers.
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    """Malformed media bytes (drop-and-continue at the operator level)."""


# --- PPM (P6 binary) ----------------------------------------------------------


def sniff_format(data: bytes) -> str | None:
    """'ppm' | 'wav' | None (unrecognized)."""
    if data[:2] == b"P6":
        return "ppm"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


def _ppm_header_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse whitespace/comment-separated ASCII header ints; returns
    (tokens, offset-of-first-pixel-byte). PPM headers allow ``#``
    comments and arbitrary whitespace between tokens, with exactly one
    whitespace byte after maxval."""
    tokens: list[int] = []
    i = 2  # past magic
    while len(tokens) < n_tokens:
        if i >= len(data):
            raise CodecError("truncated PPM header")
        c = data[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(data) and data[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(data) and data[j : j + 1].isdigit():
                j += 1
            tokens.append(int(data[i:j]))
            i = j
        else:
            raise CodecError(f"bad PPM header byte {c!r}")
    if i >= len(data) or not data[i : i + 1].isspace():
        raise CodecError("PPM header missing terminal whitespace")
    return tokens, i + 1


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 bytes -> uint8 array of shape (height, width, 3)."""
    if data[:2] != b"P6":
        raise CodecError("not a P6 PPM")
    (width, height, maxval), off = _ppm_header_tokens(data, 3)
    if maxval <= 0 or maxval > 255:
        raise CodecError(f"unsupported PPM maxval {maxval}")
    n = width * height * 3
    pixels = data[off : off + n]
    if len(pixels) < n:
        raise CodecError("truncated PPM pixel data")
    return np.frombuffer(pixels, dtype=np.uint8, count=n).reshape(height, width, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (H, W, 3) -> P6 bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise CodecError(f"expected (H, W, 3), got {pixels.shape}")
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — index math
    only, the classic thumbnailer."""
    src_h, src_w = pixels.shape[:2]
    rows = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    cols = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return pixels[rows[:, None], cols[None, :]]


# --- WAV (RIFF PCM) -----------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples int16 array of shape (n, channels),
    sample_rate). Walks RIFF chunks; PCM 16-bit only (8-bit widened)."""
    if sniff_format(data) != "wav":
        raise CodecError("not a RIFF/WAVE stream")
    pos, end = 12, len(data)
    fmt = None
    while pos + 8 <= end:
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            if size < 16:
                raise CodecError("short fmt chunk")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if audio_fmt != 1 or bits not in (8, 16) or channels < 1:
                raise CodecError(
                    f"unsupported WAV (fmt={audio_fmt}, bits={bits}, ch={channels})"
                )
            fmt = (channels, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise CodecError("data chunk before fmt")
            channels, rate, bits = fmt
            raw = data[body : body + size]
            if bits == 16:
                samples = np.frombuffer(raw[: len(raw) - len(raw) % 2], dtype="<i2")
            else:  # 8-bit WAV is unsigned; widen and center
                samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) * 256
            n = len(samples) - len(samples) % channels
            return samples[:n].reshape(-1, channels), rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise CodecError("no data chunk")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) int16 -> PCM16 WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    body = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(body))
    return hdr + body
