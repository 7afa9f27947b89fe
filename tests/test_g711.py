"""G.711 μ-law / A-law — a REAL codec pair (not just a container): pinned
byte-exact against CPython's audioop where available, plus library-free
invariants so the pin survives audioop's removal in later Pythons."""

from __future__ import annotations

import numpy as np
import pytest

from pyanomalydetector2_spark.operators.g711 import (
    decode_alaw,
    decode_mulaw,
    encode_alaw,
    encode_mulaw,
)

FULL = np.arange(-32768, 32768, dtype=np.int16)


def test_byte_exact_vs_audioop_full_range():
    audioop = pytest.importorskip("audioop")
    raw = FULL.tobytes()
    assert np.array_equal(
        encode_mulaw(FULL), np.frombuffer(audioop.lin2ulaw(raw, 2), dtype=np.uint8)
    )
    assert np.array_equal(
        encode_alaw(FULL), np.frombuffer(audioop.lin2alaw(raw, 2), dtype=np.uint8)
    )
    allb = bytes(range(256))
    assert np.array_equal(
        decode_mulaw(allb), np.frombuffer(audioop.ulaw2lin(allb, 2), dtype=np.int16)
    )
    assert np.array_equal(
        decode_alaw(allb), np.frombuffer(audioop.alaw2lin(allb, 2), dtype=np.int16)
    )


@pytest.mark.parametrize("enc,dec", [(encode_mulaw, decode_mulaw), (encode_alaw, decode_alaw)])
def test_roundtrip_error_bounded_and_monotone(enc, dec):
    """Companding invariants that need no oracle: reconstruction error is
    bounded by the local segment step, and decode∘encode is monotone
    non-decreasing in the input."""
    rec = dec(enc(FULL).tobytes()).astype(np.int64)
    x = FULL.astype(np.int64)
    # log companding: relative error bounded (~segment step ≤ |x|/8 + 1024·small)
    err = np.abs(rec - x)
    assert (err <= np.maximum(np.abs(x) // 8, 64)).all()
    # monotone in the linear domain
    assert (np.diff(rec) >= 0).all()


def test_sine_snr_exceeds_invariant_threshold():
    """G.711 of the clips' reference sine keeps SNR ≈ 38 dB — comfortably
    above the north-rule 30 dB gate, so G.711-coded clips PASS."""
    t = np.arange(16000)
    sine = (26000 * np.sin(2 * np.pi * 260 * t / 16000)).astype(np.int16)
    ref = sine.astype(np.float64)
    for enc, dec in [(encode_mulaw, decode_mulaw), (encode_alaw, decode_alaw)]:
        rec = dec(enc(sine).tobytes()).astype(np.float64)
        snr = 10 * np.log10((ref**2).sum() / ((rec - ref) ** 2).sum())
        assert snr > 35.0


def test_wav_g711_end_to_end():
    """WAV with format tag 7/6 decodes for real through parse_wav and
    decode_pcm_batch, passing the SNR gate vs the raw reference."""
    from pyanomalydetector2_spark.operators.audio import (
        decode_pcm_batch,
        encode_wav,
        parse_wav,
        snr_db,
    )

    pcm = (np.sin(np.arange(4000) / 7.0) * 12000).astype(np.int16)
    for tag in (7, 6):
        wav = encode_wav(pcm, 16000, fmt_tag=tag)
        back = parse_wav(wav)
        assert back is not None and len(back) == len(pcm)
        assert snr_db(back, pcm.astype(np.float64)) > 35.0
    # raw G.711 codec ids decode through the batch seam too
    mu = encode_mulaw(pcm).tobytes()
    dec = decode_pcm_batch(mu + b"\x00" * 16000, "pcm_mulaw")
    assert dec is not None
    # 16-bit PCM wav still round-trips bit-exactly (no regression)
    assert np.array_equal(parse_wav(encode_wav(pcm, 16000)), pcm.astype(np.float64))
