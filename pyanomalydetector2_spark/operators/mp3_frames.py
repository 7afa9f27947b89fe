"""MPEG audio (MP3) frame-level container parsing — stdlib only.

Same boundary as ogg_opus.py for the `mp3` rows: the FRAME WALK is real
(ID3v2 skip with syncsafe sizes, 11-bit sync, MPEG-1/2/2.5 × Layer I-III
header fields, bitrate/samplerate tables, exact frame-length arithmetic,
per-frame duration accounting), while the audio payload inside each frame
stays the declared deterministic fake (a real MP3 decoder needs the
subband/IMDCT pipeline of e.g. ffmpeg). `mp3_info` is the metadata
extractor a validation suite runs without decoding audio.

Tables and the frame-length formulas are the public ISO/IEC 11172-3 /
13818-3 values.
"""

from __future__ import annotations

import struct

# bitrate kbps tables: [version_key][layer][index]; index 0 = free, 15 = bad
_BITRATES = {
    # MPEG-1
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    # MPEG-2 / 2.5
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}
# samples per frame: [version][layer]
_SAMPLES = {(1, 1): 384, (1, 2): 1152, (1, 3): 1152,
            (2, 1): 384, (2, 2): 1152, (2, 3): 576}


class Mp3Error(ValueError):
    """Payload is not an MPEG audio stream / profile this parser handles."""


def skip_id3v2(payload: bytes) -> int:
    """Return the offset past an ID3v2 tag (syncsafe 28-bit size, plus the
    10-byte footer when the v2.4 footer flag is set), or 0."""
    if len(payload) >= 10 and payload[:3] == b"ID3":
        sz = (
            (payload[6] << 21) | (payload[7] << 14)
            | (payload[8] << 7) | payload[9]
        )
        footer = 10 if payload[5] & 0x10 else 0
        return 10 + sz + footer
    return 0


def parse_frame_header(payload: bytes, pos: int) -> dict:
    """Parse the 4-byte header at ``pos`` → fields + total frame length."""
    if pos + 4 > len(payload):
        raise Mp3Error("truncated MPEG frame header")
    (word,) = struct.unpack_from(">I", payload, pos)
    if (word >> 21) & 0x7FF != 0x7FF:
        raise Mp3Error("lost MPEG frame sync")
    ver_bits = (word >> 19) & 3      # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_bits = (word >> 17) & 3    # 3=Layer I, 2=Layer II, 1=Layer III
    br_idx = (word >> 12) & 0xF
    sr_idx = (word >> 10) & 3
    padding = (word >> 9) & 1
    if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        raise Mp3Error("reserved/free MPEG header field")
    version = 1 if ver_bits == 3 else 2  # 2.5 shares MPEG-2 bitrate tables
    layer = 4 - layer_bits
    bitrate = _BITRATES[(version, layer)][br_idx] * 1000
    sample_rate = _SAMPLE_RATES[ver_bits][sr_idx]
    spf = _SAMPLES[(version, layer)]
    if layer == 1:
        length = (12 * bitrate // sample_rate + padding) * 4
    else:
        length = spf // 8 * bitrate // sample_rate + padding
    return {
        "version": "2.5" if ver_bits == 0 else str(version),
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "padding": padding,
        "samples": spf,
        "length": length,
    }


def mp3_frames(payload: bytes, strict: bool = True):
    """Yield (offset, header dict) per frame, walking exact frame lengths
    from after any ID3v2 tag. Spec-valid trailers — a 128-byte ID3v1
    'TAG' block or an appended ID3v2 tag — terminate the walk cleanly in
    both modes. ``strict=True`` (the validation posture) raises on a
    truncated final frame or garbage trailer; ``strict=False`` (the
    decode posture, what real players do with stream rips) stops at the
    last complete frame."""
    pos = skip_id3v2(payload)
    n = len(payload)
    got = False
    while pos + 4 <= n:
        if payload[pos : pos + 3] == b"TAG" and n - pos == 128:
            return  # ID3v1 trailer
        if payload[pos : pos + 3] == b"ID3":
            return  # appended ID3v2 tag
        try:
            hdr = parse_frame_header(payload, pos)
        except Mp3Error:
            if got and not strict:
                return
            raise
        if pos + hdr["length"] > n:
            if got and not strict:
                return
            raise Mp3Error("truncated final MPEG frame")
        yield pos, hdr
        got = True
        pos = pos + hdr["length"]
    if not got:
        raise Mp3Error("no MPEG frames found")


def mp3_info(payload: bytes) -> dict:
    """Real metadata: frame count, total samples, duration, bitrate mode —
    the no-decode validation pass."""
    n_frames = 0
    samples = 0
    bitrates = set()
    sr = None
    for _off, hdr in mp3_frames(payload):
        n_frames += 1
        samples += hdr["samples"]
        bitrates.add(hdr["bitrate"])
        sr = hdr["sample_rate"]
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "total_samples": samples,
        "duration_ms": int(samples * 1000 / sr) if sr else 0,
        "cbr": len(bitrates) == 1,
        "bitrate": max(bitrates),
    }


def frame_payload_bytes(payload: bytes) -> bytes:
    """Concatenated per-frame payload bytes (after each 4-byte header) —
    the codec seam input (declared fake: carries reference PCM here; a
    real build hands the frames to a real MP3 decoder)."""
    out = bytearray()
    for off, hdr in mp3_frames(payload, strict=False):
        out += payload[off + 4 : off + hdr["length"]]
    return bytes(out)


# (ver_bits, sr_idx) per standard MPEG sample rate — Layer III geometry
_SHELL_GEOM = {
    44100: (3, 0), 48000: (3, 1), 32000: (3, 2),
    22050: (2, 0), 24000: (2, 1), 16000: (2, 2),
    11025: (0, 0), 12000: (0, 1), 8000: (0, 2),
}


def encode_mp3_shell(pcm16_bytes: bytes, sample_rate: int = 44100) -> bytes:
    """Structurally valid CBR Layer III frame sequence whose payload bytes
    carry the given data (the DECLARED fake: real frame geometry, fake
    codec payload). The frame headers embed the ROW's sample rate — every
    standard MPEG-1/2/2.5 rate gets its native geometry; non-MPEG rates
    (e.g. the planted sr=12345 violation) fall back to 44100, leaving the
    violation visible in the sr_hz COLUMN the check actually targets.
    Frames are emitted until the data is exhausted, last frame
    zero-padded."""
    ver_bits, sr_idx = _SHELL_GEOM.get(sample_rate, (3, 0))
    if sample_rate not in _SHELL_GEOM:
        sample_rate = 44100
    version = 1 if ver_bits == 3 else 2
    spf = _SAMPLES[(version, 3)]
    # one valid Layer III bitrate across all version tables
    bitrate = 64000
    br_idx = _BITRATES[(version, 3)].index(bitrate // 1000)
    frames = bytearray()
    pos = 0
    i = 0
    while pos < len(pcm16_bytes):
        padding = i & 1  # exercise both frame lengths deterministically
        length = spf // 8 * bitrate // sample_rate + padding
        hdr = struct.pack(
            ">I",
            (0x7FF << 21) | (ver_bits << 19) | (1 << 17) | (1 << 16)
            | (br_idx << 12) | (sr_idx << 10) | (padding << 9),
        )
        body = pcm16_bytes[pos : pos + length - 4]
        pos += len(body)
        frames += hdr + body + b"\x00" * (length - 4 - len(body))
        i += 1
    return bytes(frames)
