"""Baseline JPEG (ITU-T T.81) codec — stdlib + numpy only.

VERDICT r02 stretch #8: move the biggest remaining image container from
"deterministic fake" to REAL. Decoder handles baseline, extended
sequential AND progressive Huffman JPEG (SOF0/SOF1/SOF2): 8-bit
precision, 1 or 3 components, arbitrary sampling factors (4:4:4 / 4:2:2
/ 4:2:0 / ...), restart markers, 8- and 16-bit quant tables; progressive
scans (spectral selection + successive approximation, EOB-run AC coding,
AC refinement with correction bits) accumulate into a per-component
coefficient store that is dequantized + IDCT'd once at EOI. Arithmetic
coding, hierarchical and lossless modes raise ``UnsupportedImageError``
— declared scope, not a silent wrong answer.

The encoder emits baseline 4:4:4 with the Annex K example tables; it
exists so tests and datagen can synthesize real containers, and so
interop can be proven BOTH ways against an independent implementation
(the JVM's javax.imageio, already in-process via Spark — see
tests/test_jpeg_codec.py).

Everything here derives from the public T.81 spec (zigzag, Annex K
tables, MINCODE/MAXCODE Huffman decoding, the DCT-II basis); chroma
upsampling is nearest-neighbor, the common choice for sequential
decoders.
"""

from __future__ import annotations

import struct

import numpy as np

from pyanomalydetector2_spark.operators.image_codec import UnsupportedImageError

# ------------------------------------------------------------ constants --
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 example quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 example Huffman tables: (bits[1..16], huffval)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis: F = A @ f @ A.T ; inverse f = A.T @ F @ A (orthonormal)
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.5) if _u == 0 else 1.0
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def idct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks → spatial blocks, one einsum."""
    return np.einsum("ua,nuv,vb->nab", _A, blocks, _A)


def dct2_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ua,nab,vb->nuv", _A, blocks, _A)


# ------------------------------------------------------- huffman decode --
class _HuffTable:
    """Canonical Huffman decode via the T.81 F.2.2.3 MINCODE/MAXCODE walk."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = np.zeros(17, dtype=np.int64)
        self.maxcode = np.full(17, -1, dtype=np.int64)
        self.valptr = np.zeros(17, dtype=np.int64)
        code, k = 0, 0
        for ln in range(1, 17):
            self.valptr[ln] = k
            self.mincode[ln] = code
            n = bits[ln - 1]
            code += n
            k += n
            self.maxcode[ln] = code - 1 if n else -1
            code <<= 1
        self.vals = vals


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF  # pad past marker/EOF
                self.nbits += 8
                continue
            b = d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = d[self.pos] if self.pos < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:  # a real marker terminates the entropy segment
                    self.marker = nxt
                    self.pos += 1
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def get_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode(self, tbl: _HuffTable) -> int:
        code = self.get_bits(1)
        ln = 1
        while code > tbl.maxcode[ln]:
            if ln >= 16:
                raise UnsupportedImageError("corrupt JPEG huffman stream")
            code = (code << 1) | self.get_bits(1)
            ln += 1
        return tbl.vals[tbl.valptr[ln] + code - tbl.mincode[ln]]

    def reset(self) -> None:
        """Byte-align and consume the expected RSTn marker — whether the
        fill-ahead already swallowed it (self.marker) or it is still ahead
        in the byte stream (buffered bits were interval padding)."""
        self.nbits = 0
        self.acc = 0
        if self.marker is not None:
            if 0xD0 <= self.marker <= 0xD7:
                self.marker = None
            return
        d = self.data
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


def _extend(v: int, size: int) -> int:
    """T.81 F.12 sign extension of a ``size``-bit magnitude."""
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


# --------------------------------------------------------------- decode --
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Huffman JPEG → (h, w, 3) uint8 RGB (grayscale replicated to 3
    channels). Baseline (SOF0), extended sequential (SOF1), AND
    progressive (SOF2) — every scan accumulates into a per-component
    zigzag coefficient store; dequant + IDCT happen once at the end.
    Arithmetic coding, hierarchical and lossless modes raise.

    EVERY failure on a corrupt/truncated/unsupported stream surfaces as
    ``UnsupportedImageError`` — the multimodal seam catches exactly that
    to degrade a bad row instead of crashing the Arrow batch."""
    try:
        return _decode_jpeg_impl(payload)
    except UnsupportedImageError:
        raise
    except (struct.error, IndexError, KeyError, StopIteration, ValueError) as e:
        raise UnsupportedImageError(f"corrupt JPEG stream: {e!r}") from e


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise UnsupportedImageError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None
    saw_scan = False
    pos = 2
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise UnsupportedImageError("marker expected")
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes before a marker are legal
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise UnsupportedImageError(f"{prec}-bit precision unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = _init_frame(h, w, comps, progressive=(marker == 0xC2))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                f"SOF{marker - 0xC0}: only baseline/extended-sequential/"
                "progressive Huffman JPEG is supported"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _HuffTable(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — one of possibly many scans
            if frame is None:
                raise UnsupportedImageError("SOS before SOF")
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tt >> 4, tt & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            pos = _decode_scan(
                payload, pos, frame, scan, huff_dc, huff_ac,
                restart_interval, ss, se, a >> 4, a & 0xF,
            )
            saw_scan = True
        # APPn/COM/others: skipped
    if frame is None or not saw_scan:
        raise UnsupportedImageError("no SOS marker found")
    return _finalize(frame, qt)


def _init_frame(h: int, w: int, comps: list[dict], progressive: bool) -> dict:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # MCU-padded blocks per row
        c["bh"] = mcuy * c["v"]
        # NON-interleaved scans cover only the component's natural grid
        c["bw_nat"] = -(-(-(-w * c["h"] // hmax) // 8))
        c["bh_nat"] = -(-(-(-h * c["v"] // vmax) // 8))
        c["coefz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
    return {
        "h": h, "w": w, "comps": comps, "hmax": hmax, "vmax": vmax,
        "mcux": mcux, "mcuy": mcuy, "progressive": progressive,
    }


def _decode_scan(data, pos, frame, scan, huff_dc, huff_ac, dri, ss, se, ah, al):
    """Decode ONE entropy-coded scan into the frame's coefficient stores;
    returns the byte offset of the marker that terminated the scan."""
    rd = _BitReader(data, pos)
    for comp, _td, _ta in scan:
        comp["pred"] = 0
    state = {"eobrun": 0}

    def on_restart() -> None:
        rd.reset()
        for comp, _td, _ta in scan:
            comp["pred"] = 0
        state["eobrun"] = 0

    if not frame["progressive"]:
        _scan_blocks_sequential(rd, frame, scan, huff_dc, huff_ac, dri, on_restart)
    elif ss == 0:
        if se != 0:
            raise UnsupportedImageError("progressive DC scan with Se != 0")
        _scan_dc_progressive(rd, frame, scan, huff_dc, dri, ah, al, on_restart)
    else:
        if len(scan) != 1:
            raise UnsupportedImageError("progressive AC scan must be single-component")
        _scan_ac_progressive(
            rd, frame, scan[0], huff_ac, dri, ss, se, ah, al, state, on_restart
        )
    # the terminating marker: either already swallowed by the fill-ahead
    # (rd.pos points just past it) or still ahead after padding bits
    if rd.marker is not None:
        return rd.pos - 2
    p = rd.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] not in (0x00,)
    ):
        p += 1
    return p


def _iter_mcu_blocks(frame, scan, rd, dri, on_restart):
    """Yield (comp, td, ta, block_index) in interleaved MCU order, firing
    restarts every ``dri`` MCUs."""
    mcu = 0
    for my in range(frame["mcuy"]):
        for mx in range(frame["mcux"]):
            if dri and mcu and mcu % dri == 0:
                on_restart()
            for comp, td, ta in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        bi = (my * comp["v"] + by) * comp["bw"] + (
                            mx * comp["h"] + bx
                        )
                        yield comp, td, ta, bi
            mcu += 1


def _iter_single_blocks(comp, dri, on_restart):
    """Yield block indices of a NON-interleaved scan: raster over the
    component's natural grid, mapped into the MCU-padded store; restarts
    count data units, not MCUs."""
    unit = 0
    for row in range(comp["bh_nat"]):
        for col in range(comp["bw_nat"]):
            if dri and unit and unit % dri == 0:
                on_restart()
            yield row * comp["bw"] + col
            unit += 1


def _scan_blocks_sequential(rd, frame, scan, huff_dc, huff_ac, dri, on_restart):
    if len(scan) == 1:
        comp, td, ta = scan[0]
        blocks = (
            (comp, td, ta, bi) for bi in _iter_single_blocks(comp, dri, on_restart)
        )
    else:
        blocks = _iter_mcu_blocks(frame, scan, rd, dri, on_restart)
    for comp, td, ta, bi in blocks:
        dct, act = huff_dc[td], huff_ac[ta]
        blk = comp["coefz"][bi]
        s = rd.decode(dct)
        comp["pred"] += _extend(rd.get_bits(s), s)
        blk[0] = comp["pred"]
        k = 1
        while k < 64:
            rs = rd.decode(act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise UnsupportedImageError("AC index overflow")
            blk[k] = _extend(rd.get_bits(s), s)
            k += 1


def _scan_dc_progressive(rd, frame, scan, huff_dc, dri, ah, al, on_restart):
    if len(scan) == 1:
        comp, td, _ta = scan[0]
        blocks = (
            (comp, td, 0, bi) for bi in _iter_single_blocks(comp, dri, on_restart)
        )
    else:
        blocks = _iter_mcu_blocks(frame, scan, rd, dri, on_restart)
    for comp, td, _ta, bi in blocks:
        blk = comp["coefz"][bi]
        if ah == 0:  # first DC scan: full diff, shifted by the point transform
            s = rd.decode(huff_dc[td])
            comp["pred"] += _extend(rd.get_bits(s), s)
            blk[0] = comp["pred"] << al
        else:  # refinement: one bit per block (libjpeg decode_mcu_DC_refine)
            if rd.get_bits(1):
                blk[0] |= 1 << al


def _scan_ac_progressive(rd, frame, sc, huff_ac, dri, ss, se, ah, al, state, on_restart):
    comp, _td, ta = sc
    act = huff_ac[ta]
    for bi in _iter_single_blocks(comp, dri, on_restart):
        blk = comp["coefz"][bi]
        if ah == 0:
            _ac_first_block(rd, act, blk, ss, se, al, state)
        else:
            _ac_refine_block(rd, act, blk, ss, se, al, state)


def _ac_first_block(rd, act, blk, ss, se, al, state):
    """T.81 G.1.2.2 / libjpeg decode_mcu_AC_first: EOB-run coding."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = rd.decode(act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += rd.get_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise UnsupportedImageError("AC index overflow")
        blk[k] = _extend(rd.get_bits(s), s) << al
        k += 1


def _ac_refine_block(rd, act, blk, ss, se, al, state):
    """T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine: correction bits for
    already-nonzero coefficients, new ±1<<al insertions elsewhere."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = rd.decode(act)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:  # EOB run starts at THIS block
                    state["eobrun"] = (1 << r)
                    if r:
                        state["eobrun"] += rd.get_bits(r)
                    break
                # r == 15: ZRL — advance past 16 zero-history coefficients
            else:
                if s != 1:
                    raise UnsupportedImageError("bad refinement magnitude")
                val = p1 if rd.get_bits(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if rd.get_bits(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if blk[k] != 0:
                if rd.get_bits(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _finalize(frame, qt) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in frame["comps"]:
        if c["tq"] not in qt:
            raise UnsupportedImageError(f"missing quant table {c['tq']}")
        deq = c["coefz"].astype(np.float64) * qt[c["tq"]][np.newaxis, :]
        raster = np.zeros_like(deq)
        raster[:, ZIGZAG] = deq
        spat = idct2_blocks(raster.reshape(-1, 8, 8)) + 128.0
        plane = (
            spat.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # nearest-neighbor chroma upsample to full resolution, then crop
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    if len(planes) != 3:
        raise UnsupportedImageError(f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encode --
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # 1-fill padding


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """huffval → (code, length), canonical order."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _mag(v: int) -> tuple[int, int]:
    """value → (size, magnitude bits) per T.81 F.1.2.1."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def encode_jpeg_baseline(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG, 4:4:4, Annex K tables."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_baseline expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
    cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    qts = [QT_LUMA, QT_CHROMA, QT_CHROMA]
    dc_codes = [_encode_codes(*HT_DC_LUMA)] + [_encode_codes(*HT_DC_CHROMA)] * 2
    ac_codes = [_encode_codes(*HT_AC_LUMA)] + [_encode_codes(*HT_AC_CHROMA)] * 2

    coefs = []
    for ci, plane in enumerate((y, cb, cr)):
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = (
            p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        qz = np.round(
            dct2_blocks(blocks) / qts[ci].reshape(8, 8)[np.newaxis]
        ).astype(np.int64)
        coefs.append(qz.reshape(-1, 64)[:, ZIGZAG_INV])

    bw = _BitWriter()
    preds = [0, 0, 0]
    nby, nbx = ph // 8, pw // 8
    for bi in range(nby * nbx):  # 4:4:4 → one block per component per MCU
        for ci in range(3):
            zz = coefs[ci][bi]
            size, mag = _mag(int(zz[0]) - preds[ci])
            preds[ci] = int(zz[0])
            code, ln = dc_codes[ci][size]
            bw.put(code, ln)
            bw.put(mag, size)
            run = 0
            last_nz = np.nonzero(zz[1:])[0]
            last = last_nz[-1] + 1 if len(last_nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[ci][0xF0]
                    bw.put(code, ln)
                    run -= 16
                size, mag = _mag(v)
                code, ln = ac_codes[ci][(run << 4) | size]
                bw.put(code, ln)
                bw.put(mag, size)
                run = 0
            if last < 63:
                code, ln = ac_codes[ci][0x00]
                bw.put(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(QT_LUMA.reshape(8, 8).ravel()[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(QT_CHROMA.reshape(8, 8).ravel()[ZIGZAG].astype(np.uint8)))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for tc, th, (bits, vals) in (
        (0, 0, HT_DC_LUMA), (1, 0, HT_AC_LUMA),
        (0, 1, HT_DC_CHROMA), (1, 1, HT_AC_CHROMA),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# encoder writes zigzag order: position k of the stream is coefficient
# ZIGZAG[k] of the raster block → gather with ZIGZAG itself
ZIGZAG_INV = ZIGZAG
