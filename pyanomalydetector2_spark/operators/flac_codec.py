"""FLAC codec — stdlib + numpy only, derived from the public FLAC format
spec (RFC 9639 / xiph.org).

Moves the biggest remaining AUDIO container from "magic-tagged fake" to
REAL (the JPEG move of r03, applied to this graft's payload axis):

- decoder: full bitstream walk — STREAMINFO + metadata blocks, frame sync,
  UTF-8 frame numbers, all block-size/sample-rate/sample-size codes,
  CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, wasted bits,
  rice partitions (4- and 5-bit params, escape partitions), left/side,
  right/side and mid/side stereo decorrelation, CRC-8 header and CRC-16
  frame verification, and the STREAMINFO MD5 check over the decoded
  samples (the spec's own end-to-end integrity anchor: a decoder bug that
  corrupts ANY sample fails the MD5).
- encoder: streamable subset for tests/datagen — fixed-order 0-2
  prediction chosen per block by residual energy, one rice partition,
  correct CRCs and STREAMINFO MD5. Lossless by construction, so
  decode(encode(pcm)) == pcm EXACTLY is the test oracle.

No independent FLAC implementation exists in this container (no ffmpeg /
soundfile; the JVM has no FLAC SPI), so interop is anchored on the spec's
integrity fields (MD5 over decoded samples is written from the INPUT pcm
and verified against the DECODED pcm — encoder and decoder cannot share a
sample-corrupting bug and still agree) plus spec-constant tests (CRC
polynomials, fixed-predictor coefficients, zigzag residuals).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_BLOCKSIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor coefficients, order 0..4 (spec §9.2.1)
_FIXED_COEFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


class FlacError(ValueError):
    """Payload is not a FLAC stream / profile this codec handles."""


# -------------------------------------------------------------- CRCs ----
def _crc_table(poly: int, width: int) -> np.ndarray:
    tbl = np.zeros(256, dtype=np.uint32)
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tbl[i] = c & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8).tolist()  # list: ~3× faster than np scalar
_CRC16_TBL = _crc_table(0x8005, 16).tolist()


def crc8(data: bytes) -> int:
    c = 0
    tbl = _CRC8_TBL
    for b in data:
        c = tbl[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    tbl = _CRC16_TBL
    for b in data:
        c = (tbl[((c >> 8) ^ b)] ^ (c << 8)) & 0xFFFF
    return c


# --------------------------------------------------------- bit reader ---
class _Bits:
    """MSB-first bit reader (clip-scale decode; a production hot path would
    vectorize the rice runs, but clips here are seconds of audio)."""

    def __init__(self, data: bytes, pos: int = 0, shared: dict | None = None):
        self.data = data
        self.bytepos = pos
        self.bitpos = 0
        self.shared = shared if shared is not None else {}

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        while n:
            if self.bytepos >= len(d):
                raise FlacError("truncated FLAC stream")
            avail = 8 - self.bitpos
            take = min(n, avail)
            cur = d[self.bytepos]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            n -= take
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def read_vec(self, width: int, count: int) -> np.ndarray:
        """``count`` consecutive ``width``-bit UNSIGNED fields as one
        vectorized unpackbits+matmul — the hot path for verbatim samples
        and escape-partition residuals (no per-field Python)."""
        if count == 0 or width == 0:
            return np.zeros(count, dtype=np.int64)
        total = width * count
        end_bit = self.bitpos + total
        nbytes = (end_bit + 7) // 8
        chunk = self.data[self.bytepos : self.bytepos + nbytes]
        if len(chunk) < nbytes:
            raise FlacError("truncated FLAC stream")
        bits = np.unpackbits(np.frombuffer(chunk, dtype=np.uint8))
        fields = bits[self.bitpos : self.bitpos + total].reshape(count, width)
        weights = (1 << np.arange(width - 1, -1, -1)).astype(np.int64)
        self._advance(total)
        return fields @ weights

    def _advance(self, nbits: int) -> None:
        t = self.bitpos + nbits
        self.bytepos += t >> 3
        self.bitpos = t & 7

    def rice_block(self, cnt: int, k: int) -> np.ndarray:
        """Decode ``cnt`` rice(k) residuals at the current bit position in
        ONE pass: the payload's 1-bit positions (built lazily once per
        decode, shared across frames via ``self.shared``) are walked with
        plain-int pointers to find each code's unary stop bit, then
        quotients/remainders/zigzag are pure vector math — ~4× over the
        bit-at-a-time unary loop. Memory note: the bit map is 8× payload
        size, fine for clip-scale streams (a streaming decoder would chunk
        it)."""
        if cnt == 0:
            return np.zeros(0, dtype=np.int64)
        if self.shared.get("bits") is None:
            self.shared["bits"] = np.unpackbits(
                np.frombuffer(self.data, dtype=np.uint8)
            )
            self.shared["ones"] = np.flatnonzero(
                self.shared["bits"]
            ).tolist()
        bits, ones = self.shared["bits"], self.shared["ones"]
        start = (self.bytepos << 3) + self.bitpos
        import bisect

        j = bisect.bisect_left(ones, start)
        n_ones = len(ones)
        stops = np.empty(cnt, dtype=np.int64)
        ptr = start
        for i in range(cnt):
            while j < n_ones and ones[j] < ptr:
                j += 1
            if j >= n_ones:
                raise FlacError("truncated FLAC stream")
            s = ones[j]
            stops[i] = s
            ptr = s + 1 + k
            j += 1
        prev = np.empty(cnt, dtype=np.int64)
        prev[0] = start
        prev[1:] = stops[:-1] + 1 + k
        q = stops - prev
        if k:
            idx = stops[:, None] + 1 + np.arange(k)[None, :]
            if int(idx[-1, -1]) >= len(bits):
                raise FlacError("truncated FLAC stream")
            rem = bits[idx].astype(np.int64) @ (
                1 << np.arange(k - 1, -1, -1)
            ).astype(np.int64)
        else:
            rem = np.zeros(cnt, dtype=np.int64)
        v = (q << k) | rem
        end = int(stops[-1]) + 1 + k
        self.bytepos, self.bitpos = end >> 3, end & 7
        return (v >> 1) ^ -(v & 1)

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _sext(v: np.ndarray, width: int) -> np.ndarray:
    """Vectorized two's-complement sign extension of width-bit fields."""
    sign = np.int64(1) << (width - 1)
    return (v ^ sign) - sign


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise FlacError("bad UTF-8 frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ------------------------------------------------------------ decoder ---
def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC stream → (samples int64 array of shape (n, channels), rate).
    Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5 when present.
    EVERY failure on a corrupt/truncated stream surfaces as ``FlacError``
    (the seam in audio.decode_pcm_batch catches exactly that)."""
    try:
        return _decode_flac_impl(payload)
    except FlacError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        raise FlacError(f"corrupt FLAC stream: {e!r}") from e


def _decode_flac_impl(payload: bytes) -> tuple[np.ndarray, int]:
    if len(payload) < 42 or payload[:4] != FLAC_MAGIC:
        raise FlacError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise FlacError("truncated metadata")
        hdr = payload[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:  # STREAMINFO
            sr_chan = int.from_bytes(body[10:18], "big")
            info = {
                "rate": sr_chan >> 44,
                "channels": ((sr_chan >> 41) & 0x7) + 1,
                "bps": ((sr_chan >> 36) & 0x1F) + 1,
                "total": sr_chan & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        if last:
            break
    if info is None:
        raise FlacError("missing STREAMINFO")
    out = []
    shared: dict = {}  # lazy bit map shared by every frame's rice decode
    while pos < len(payload) - 1:
        frame, pos = _decode_frame(payload, pos, info, shared)
        out.append(frame)
    if not out:
        raise FlacError("no audio frames")
    samples = np.concatenate(out, axis=0)
    if info["total"]:
        samples = samples[: info["total"]]
    if info["md5"] != b"\x00" * 16:
        if _samples_md5(samples, info["bps"]) != info["md5"]:
            raise FlacError("decoded audio fails the STREAMINFO MD5 check")
    return samples, info["rate"]


def flac_stream_info(payload: bytes) -> dict:
    """STREAMINFO-only parse — the no-decode metadata path (rate, channels,
    bits per sample, declared total samples, MD5 presence) for container
    validation over corpora where decoding every clip is off the table."""
    if len(payload) < 42 or payload[:4] != FLAC_MAGIC:
        raise FlacError("not a FLAC stream")
    pos = 4
    while True:
        if pos + 4 > len(payload):
            raise FlacError("truncated metadata")
        hdr = payload[pos]
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if hdr & 0x7F == 0:  # STREAMINFO
            if len(body) < 34:
                raise FlacError("truncated STREAMINFO")
            sr_chan = int.from_bytes(body[10:18], "big")
            return {
                "rate": sr_chan >> 44,
                "channels": ((sr_chan >> 41) & 0x7) + 1,
                "bps": ((sr_chan >> 36) & 0x1F) + 1,
                "total_samples": sr_chan & ((1 << 36) - 1),
                "has_md5": body[18:34] != b"\x00" * 16,
            }
        if hdr & 0x80:
            break
        pos += 4 + blen
    raise FlacError("missing STREAMINFO")


def _samples_md5(samples: np.ndarray, bps: int) -> bytes:
    nbytes = (bps + 7) // 8
    le = samples.astype("<i8").tobytes()  # 8-byte LE, truncate per sample
    arr = np.frombuffer(le, dtype=np.uint8).reshape(-1, 8)[:, :nbytes]
    return hashlib.md5(arr.tobytes()).digest()


def _decode_frame(data: bytes, pos: int, info: dict, shared: dict | None = None):
    start = pos
    if data[pos] != 0xFF or (data[pos + 1] >> 1) != 0x7C:
        raise FlacError("lost frame sync")
    bits = _Bits(data, pos, shared)
    bits.read(14)  # sync
    bits.read(1)  # reserved
    bits.read(1)  # blocking strategy
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    chan_code = bits.read(4)
    ss_code = bits.read(3)
    bits.read(1)  # reserved
    _read_utf8_number(bits)
    if bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    elif bs_code in _BLOCKSIZES:
        blocksize = _BLOCKSIZES[bs_code]
    else:
        raise FlacError(f"reserved blocksize code {bs_code}")
    if sr_code == 0:
        rate = info["rate"]
    elif sr_code in _SAMPLE_RATES:
        rate = _SAMPLE_RATES[sr_code]
    elif sr_code == 12:
        rate = bits.read(8) * 1000
    elif sr_code == 13:
        rate = bits.read(16)
    elif sr_code == 14:
        rate = bits.read(16) * 10
    else:
        raise FlacError("invalid sample-rate code")
    bps = info["bps"] if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
    if bps is None:
        raise FlacError(f"reserved sample-size code {ss_code}")
    hdr_crc = crc8(data[start : bits.bytepos + (1 if bits.bitpos else 0)])
    if bits.read(8) != hdr_crc:
        raise FlacError("frame header CRC-8 mismatch")

    if chan_code <= 7:
        nchan, mode = chan_code + 1, "indep"
    elif chan_code == 8:
        nchan, mode = 2, "left_side"
    elif chan_code == 9:
        nchan, mode = 2, "right_side"
    elif chan_code == 10:
        nchan, mode = 2, "mid_side"
    else:
        raise FlacError(f"reserved channel assignment {chan_code}")

    chans = []
    for ci in range(nchan):
        ch_bps = bps
        if (mode == "left_side" and ci == 1) or (
            mode == "right_side" and ci == 0
        ) or (mode == "mid_side" and ci == 1):
            ch_bps += 1  # the side channel carries one extra bit
        chans.append(_decode_subframe(bits, blocksize, ch_bps))
    bits.align()
    frame_crc = crc16(data[start : bits.bytepos])
    if bits.read(16) != frame_crc:
        raise FlacError("frame CRC-16 mismatch")

    if mode == "indep":
        frame = np.stack(chans, axis=1)
    else:
        frame = _stereo_restore(mode, chans[0], chans[1])
    return frame.astype(np.int64), bits.bytepos


def _stereo_restore(mode: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Undo inter-channel decorrelation (spec §4.2): ``a``/``b`` are the
    two decoded subframes, returns (n, 2) [left, right]."""
    a, b = a.astype(np.int64), b.astype(np.int64)
    if mode == "left_side":
        left, right = a, a - b
    elif mode == "right_side":  # channel 0 is the side, channel 1 is right
        left, right = a + b, b
    elif mode == "mid_side":
        side = b
        mid = (a << 1) | (side & 1)
        left, right = (mid + side) >> 1, (mid - side) >> 1
    else:
        raise FlacError(f"unknown stereo mode {mode}")
    return np.stack([left, right], axis=1)


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1) != 0:
        raise FlacError("bad subframe header padding bit")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        if wasted >= bps:
            raise FlacError("wasted bits exceed sample size")
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(blocksize, bits.sread(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM (vectorized bulk read)
        out = _sext(bits.read_vec(bps, blocksize), bps)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [bits.sread(bps) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        out = _predict_fixed(order, warm, resid)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 0x1F) + 1
        warm = [bits.sread(bps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise FlacError("invalid LPC precision code")
        shift = bits.sread(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [bits.sread(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(out[i - 1 - j])
            out[i] = resid[i - order] + (acc >> shift)
    else:
        raise FlacError(f"reserved subframe type {stype}")
    return out << wasted if wasted else out


def _predict_fixed(order: int, warm: list[int], resid: np.ndarray) -> np.ndarray:
    """Fixed-order reconstruction WITHOUT a per-sample loop: the order-o
    fixed predictor is exactly "the o-th finite difference of the output
    equals the residual", so the output is o nested cumulative sums, each
    seeded from the warmup samples' difference pyramid."""
    if order == 0:
        return resid.astype(np.int64)
    w = np.asarray(warm, dtype=np.int64)
    pyramid = [w]
    for _ in range(order - 1):
        pyramid.append(np.diff(pyramid[-1]))
    s = resid.astype(np.int64)
    for k in range(order - 1, -1, -1):
        s = pyramid[k][-1] + np.cumsum(s)
    return np.concatenate([w, s])


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts or (blocksize >> porder) <= order:
        raise FlacError("invalid rice partition order")
    out = np.empty(blocksize - order, dtype=np.int64)
    k = 0
    for p in range(nparts):
        cnt = (blocksize >> porder) - (order if p == 0 else 0)
        param = bits.read(plen)
        if param == (1 << plen) - 1:  # escape: raw n-bit residuals (vector)
            nb = bits.read(5)
            out[k : k + cnt] = (
                _sext(bits.read_vec(nb, cnt), nb) if nb else 0
            )
        else:
            out[k : k + cnt] = bits.rice_block(cnt, param)
        k += cnt
    return out


# ------------------------------------------------------------ encoder ---
class _BitW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def write_vec(self, vals: np.ndarray, width: int) -> None:
        """Vectorized bulk write of ``width``-bit two's-complement fields
        (one unpack/packbits per call — the escape-residual hot path)."""
        a = np.asarray(vals, dtype=np.int64)
        bits = (
            ((a[:, None] >> np.arange(width - 1, -1, -1)[None, :]) & 1)
            .astype(np.uint8)
            .ravel()
        )
        if self.n:  # splice pending sub-byte bits in front (acc may carry
            # already-flushed high bits — mask to the pending window)
            acc = self.acc & ((1 << self.n) - 1)
            pend = np.array(
                [(acc >> i) & 1 for i in range(self.n - 1, -1, -1)],
                dtype=np.uint8,
            )
            bits = np.concatenate([pend, bits])
            self.acc = 0
            self.n = 0
        nfull = (len(bits) // 8) * 8
        self.out.extend(np.packbits(bits[:nfull]).tobytes())
        for b in bits[nfull:]:  # ≤ 7 tail bits back into the accumulator
            self.acc = (self.acc << 1) | int(b)
            self.n += 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def encode_flac(
    samples: np.ndarray, rate: int = 16000, bps: int = 16, rice: bool = False
) -> bytes:
    """(n,) or (n, channels) int samples → FLAC (independent channels,
    fixed-order 0-2 prediction per block, one residual partition,
    4096-sample blocks). Lossless: decode_flac returns the input exactly.

    ``rice=False`` (default) codes residuals as ESCAPE partitions — raw
    fixed-width two's complement, a fully standard FLAC layout that both
    sides process as ONE numpy unpack/packbits (~30× faster than the rice
    bit loops; the cost is a few % compression on tonal audio). The rice
    path remains for spec coverage and denser output."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nchan = samples.shape
    if not (1 <= nchan <= 8):
        raise ValueError("1-8 channels")
    if n == 0:
        raise ValueError("cannot encode zero samples")
    s = samples.astype(np.int64)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if s.min() < lo or s.max() > hi:
        raise ValueError(f"samples exceed {bps}-bit range")

    blocks = [(i, min(i + 4096, n)) for i in range(0, n, 4096)]
    body = bytearray()
    for fi, (b0, b1) in enumerate(blocks):
        body += _encode_frame(s[b0:b1], fi, rate, bps, nchan, rice)

    w = _BitW()
    w.write(0x80, 8)  # last block, STREAMINFO
    w.write(34, 24)
    bsz = 4096 if n else 0
    w.write(min(bsz, max(n, 16)), 16)  # min blocksize
    w.write(bsz or 16, 16)  # max blocksize
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(nchan - 1, 3)
    w.write(bps - 1, 5)
    w.write(n, 36)
    meta = bytes(w.out) + _samples_md5(s.reshape(-1), bps)
    return FLAC_MAGIC + meta + bytes(body)


def _encode_frame(
    block: np.ndarray, fi: int, rate: int, bps: int, nchan: int, rice: bool
) -> bytes:
    bsz = block.shape[0]
    w = _BitW()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)  # fixed blocksize stream
    w.write(7, 4)  # blocksize: 16-bit at end of header
    w.write(0, 4)  # sample rate: from STREAMINFO
    w.write(nchan - 1, 4)  # independent channels
    w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bps, 4), 3)
    w.write(0, 1)
    # UTF-8-style frame number (fixed-blocksize stream numbers FRAMES).
    # Frame numbers are capped at 31 bits by the format, so at most the
    # 6-byte encoding is ever needed.
    if fi < 0x80:
        w.write(fi, 8)
    else:
        if fi >= 1 << 31:
            raise ValueError(f"FLAC frame number {fi} exceeds the 31-bit cap")
        # k continuation bytes carry the low 6k bits; the lead byte holds
        # the rest under a (k+1)-ones prefix.
        for k in range(1, 7):
            if fi < 1 << (6 * k + (6 - k)):
                break
        lead_prefix = (0xFF << (7 - k)) & 0xFF
        w.write(lead_prefix | (fi >> (6 * k)), 8)
        for j in range(k - 1, -1, -1):
            w.write(0x80 | ((fi >> (6 * j)) & 0x3F), 8)
    w.write(bsz - 1, 16)
    w.align()
    hdr = bytes(w.out)
    w.write(crc8(hdr), 8)

    for ci in range(nchan):
        _encode_subframe(w, block[:, ci], bps, rice)
    w.align()
    frame = bytes(w.out)
    w.write(crc16(frame), 16)
    return bytes(w.out)


class _NeedVerbatim(Exception):
    """Residuals too wide for the 5-bit escape width field — fall back to
    a VERBATIM subframe (always expressible, still standard FLAC)."""


def _encode_subframe(w: _BitW, x: np.ndarray, bps: int, rice: bool = False) -> None:
    mark = (len(w.out), w.acc, w.n)
    try:
        _encode_subframe_coded(w, x, bps, rice)
    except _NeedVerbatim:
        del w.out[mark[0]:]
        w.acc, w.n = mark[1], mark[2]
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        w.write_vec(x, bps)


def _encode_subframe_coded(w: _BitW, x: np.ndarray, bps: int, rice: bool = False) -> None:
    if len(x) and (x == x[0]).all():
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    # pick the fixed order (0-2) with the smallest residual magnitude sum
    best_order, best_resid, best_cost = 0, x, np.abs(x).sum()
    for order in (1, 2):
        if len(x) <= order:
            break
        coefs = _FIXED_COEFS[order]
        pred = sum(c * x[order - 1 - j : len(x) - 1 - j] for j, c in enumerate(coefs))
        resid = x[order:] - pred
        cost = np.abs(resid).sum()
        if cost < best_cost:
            best_order, best_resid, best_cost = order, resid, cost
    order, resid = best_order, best_resid.astype(np.int64)
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED subframe
    w.write(0, 1)  # no wasted bits
    for i in range(order):
        w.write(int(x[i]), bps)
    # residuals: method 0, ONE partition
    w.write(0, 2)  # method 0
    w.write(0, 4)  # partition order 0
    zz = (resid << 1) ^ (resid >> 63)  # zigzag
    mean = max(int(zz.mean()) if len(zz) else 0, 1)
    param = min(max(mean.bit_length() - 1, 0), 14)
    escape = not rice or (
        len(zz) and int((zz >> param).max()) > 64  # pathological rice
    )
    if escape:  # raw fixed-width residuals — vectorized both ways
        nb = int(max(np.abs(resid).max(), 1)).bit_length() + 1
        if nb > 31:  # escape width field is 5 bits — cannot express it
            raise _NeedVerbatim()
        w.write(15, 4)
        w.write(nb, 5)
        w.write_vec(resid, nb)
        return
    w.write(param, 4)
    for v in zz:
        q = int(v) >> param
        if q:
            w.write(0, q)
        w.write(1, 1)
        w.write(int(v) & ((1 << param) - 1), param)
