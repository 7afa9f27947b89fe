"""Real, dependency-free video container codec: uncompressed AVI ('DIB '
video stream, 24-bit bottom-up BGR frames).

AVI is RIFF — the same container family as WAV (operators/audio.py) — so a
struct walker covers it without any codec library; the frames themselves
are raw BMP-style pixel arrays. With this, the frame-sampling operator in
``operators/multimodal.py`` decodes REAL frames for AVI payloads; compressed
codecs (h264 etc.) remain the declared pyav/ffmpeg seam.

Scope (declared): one video stream, 24 bpp BI_RGB 'DIB ' frames in
'00db'/'00dc' movi chunks, non-interleaved index-free layout (players want
an idx1; parsers do not).
"""

from __future__ import annotations

import struct

import numpy as np

from pyanomalydetector2_spark.operators.image_codec import UnsupportedImageError


class UnsupportedVideoError(ValueError):
    """Payload is not a container/profile this codec handles."""


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(subtype: bytes, *children: bytes) -> bytes:
    return _chunk(b"LIST", subtype + b"".join(children))


def _dib_frame(frame: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → bottom-up BGR rows padded to 4 bytes (the BMP
    pixel-array layout, no header)."""
    h, w = frame.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _undib_frame(data: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    if len(data) < stride * h:
        raise UnsupportedVideoError("truncated DIB frame")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1].copy()


def encode_avi(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w, 3) uint8 RGB → uncompressed 'DIB ' AVI."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_avi expects (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    frame_sz = ((w * 3 + 3) & ~3) * h
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_sz * fps,    # dwMaxBytesPerSec
        0, 0,              # padding, flags
        n, 0, 1,           # totalframes, initialframes, streams
        frame_sz,          # suggested buffer
        w, h, 0, 0, 0, 0,  # width, height, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,            # scale, rate → fps frames/sec
        0, n, frame_sz, 0xFFFFFFFF - (1 << 31), 0,  # start, length, bufsize, quality(-1 as int), samplesize
        0, 0, w if w < 65536 else 0, h if h < 65536 else 0,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_sz, 2835, 2835, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih),
        _list(b"strl", _chunk(b"strh", strh), _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", *[_chunk(b"00db", _dib_frame(f)) for f in frames])
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) across a RIFF chunk run.
    ``end`` is clamped to the real buffer so a declared LIST size larger
    than the (possibly truncated) payload can never drive unpack past it;
    a chunk whose declared size overruns the buffer is not yielded."""
    end = min(end, len(data))
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > end:
            raise UnsupportedVideoError("chunk overruns buffer (truncated RIFF)")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def avi_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from the headers alone."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise UnsupportedVideoError("not an AVI payload")
    w = h = n = None
    for fourcc, start, size in _walk(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[start : start + 4] == b"hdrl":
            for f2, s2, z2 in _walk(payload, start + 4, start + size):
                if f2 == b"avih" and z2 >= 40:
                    n = struct.unpack_from("<I", payload, s2 + 16)[0]
                    w = struct.unpack_from("<I", payload, s2 + 32)[0]
                    h = struct.unpack_from("<I", payload, s2 + 36)[0]
    if w is None or not w or not h:
        raise UnsupportedVideoError("no usable avih header")
    return int(w), int(h), int(n or 0)


def parse_avi(payload: bytes) -> np.ndarray:
    """Uncompressed 'DIB ' AVI → (n, h, w, 3) uint8 RGB frames."""
    w, h, _ = avi_header(payload)
    frames: list[np.ndarray] = []
    for fourcc, start, size in _walk(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[start : start + 4] == b"movi":
            for f2, s2, z2 in _walk(payload, start + 4, start + size):
                if f2 in (b"00db", b"00dc"):
                    frames.append(_undib_frame(payload[s2 : s2 + z2], w, h))
    if not frames:
        raise UnsupportedVideoError("no 00db/00dc frames in movi list")
    return np.stack(frames)


def decode_video(payload: bytes) -> np.ndarray:
    """Dispatch on container magic → (n, h, w, 3) uint8. Only AVI today;
    everything else raises (the pyav/ffmpeg seam)."""
    if payload is None or len(payload) < 12:
        raise UnsupportedVideoError("empty payload")
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return parse_avi(payload)
    raise UnsupportedVideoError("unknown video container")


__all__ = [
    "UnsupportedImageError",
    "UnsupportedVideoError",
    "encode_avi",
    "parse_avi",
    "avi_header",
    "decode_video",
]
