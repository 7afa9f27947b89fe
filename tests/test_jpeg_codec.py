"""Baseline JPEG codec tests: self round-trip, spec-table invariants, and
BOTH-WAY interop against an independent implementation — the JVM's
javax.imageio JPEG codec, already in-process via Spark's gateway (no PIL /
libjpeg in this container). Interop both directions rules out the class of
symmetric encoder/decoder bugs (e.g. a mirrored zigzag) that self
round-trips cannot see.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyanomalydetector2_spark.operators.image_codec import UnsupportedImageError
from pyanomalydetector2_spark.operators.jpeg_codec import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg_baseline,
)


def _test_image(h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256], axis=2
    ).astype(np.uint8)


def test_zigzag_is_a_permutation_with_spec_anchors():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # T.81 figure A.6 anchors: start 0,1,8,16,9,2; end ...,55,62,63
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-3:].tolist() == [55, 62, 63]


def test_uniform_gray_roundtrips_exactly():
    img = np.full((16, 24, 3), 128, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_baseline(img)), img)


def test_roundtrip_psnr_and_nonmultiple_of_8_dims():
    img = _test_image(21, 35)  # exercises edge-padding + crop
    out = decode_jpeg(encode_jpeg_baseline(img))
    assert out.shape == img.shape
    mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) > 28  # lossy, but clearly the image


def test_garbage_and_unsupported_modes_rejected():
    with pytest.raises(UnsupportedImageError):
        decode_jpeg(b"\x00\x01\x02\x03not a jpeg")
    # lossless-mode SOF3 stays out of scope and must raise, not garble
    img = bytearray(encode_jpeg_baseline(_test_image(8, 8)))
    sof = img.find(b"\xff\xc0")
    img[sof + 1] = 0xC3
    with pytest.raises(UnsupportedImageError, match="SOF3"):
        decode_jpeg(bytes(img))


def _jvm_decode(spark, payload: bytes):
    """Decode JPEG bytes with javax.imageio → (h, w, 3) uint8 RGB."""
    jvm = spark._jvm
    bimg = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(payload)
    )
    assert bimg is not None, "javax.imageio could not parse the payload"
    w, h = bimg.getWidth(), bimg.getHeight()
    gateway = spark._sc._gateway
    arr = gateway.new_array(jvm.int, w * h)
    bimg.getRGB(0, 0, w, h, arr, 0, w)
    packed = np.array(list(arr), dtype=np.int64).reshape(h, w)
    return np.stack(
        [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF], axis=2
    ).astype(np.uint8)


def _jvm_encode(spark, img: np.ndarray, progressive: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB with javax.imageio's JPEG writer —
    optionally as PROGRESSIVE (SOF2), the independent source of
    multi-scan streams our encoder never produces."""
    jvm = spark._jvm
    h, w = img.shape[:2]
    bimg = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    gateway = spark._sc._gateway
    arr = gateway.new_array(jvm.int, w * h)
    packed = (
        (img[..., 0].astype(np.int64) << 16)
        | (img[..., 1].astype(np.int64) << 8)
        | img[..., 2].astype(np.int64)
    ).ravel()
    for i, v in enumerate(packed.tolist()):
        arr[i] = int(v)
    bimg.setRGB(0, 0, w, h, arr, 0, w)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    param = writer.getDefaultWriteParam()
    if progressive:
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None), param)
    ios.flush()
    return bytes(baos.toByteArray())


def test_interop_jvm_decodes_our_files(spark):
    """Independent-decoder direction: javax.imageio must read our encoder's
    output and agree pixel-for-pixel within IDCT rounding (4:4:4, so no
    upsampling ambiguity)."""
    img = _test_image(24, 32)
    payload = encode_jpeg_baseline(img)
    theirs = _jvm_decode(spark, payload)
    ours = decode_jpeg(payload)
    diff = np.abs(theirs.astype(int) - ours.astype(int))
    assert diff.max() <= 3 and diff.mean() < 1.0, (
        f"decoders disagree: max={diff.max()} mean={diff.mean():.2f}"
    )


def test_interop_we_decode_jvm_files(spark):
    """Independent-encoder direction: our decoder must read javax.imageio's
    output (typically 4:2:0-subsampled, restart-free baseline). Chroma
    upsampling filters legitimately differ, so the tolerance is looser but
    still far below 'garbage'."""
    img = _test_image(24, 32)
    payload = _jvm_encode(spark, img)
    ours = decode_jpeg(payload)
    theirs = _jvm_decode(spark, payload)
    assert ours.shape == theirs.shape == img.shape
    diff = np.abs(theirs.astype(int) - ours.astype(int))
    assert diff.mean() < 6 and np.percentile(diff, 99) <= 40, (
        f"decoders disagree: mean={diff.mean():.2f} p99={np.percentile(diff, 99)}"
    )
    # and both are the SAME image the JVM encoded
    assert np.abs(ours.astype(int) - img.astype(int)).mean() < 12


def test_interop_we_decode_jvm_progressive(spark):
    """PROGRESSIVE (SOF2) interop: javax.imageio emits a genuine
    multi-scan stream (spectral selection + successive approximation,
    including AC refinement scans) that our encoder never produces — our
    multi-scan coefficient accumulator must reproduce the JVM's own
    decode. On a smooth upsampled image the two decoders differ only in
    chroma-upsampling filter (p99 ≤ a few counts)."""
    img = np.repeat(np.repeat(_test_image(24, 32), 4, axis=0), 4, axis=1)
    payload = _jvm_encode(spark, img, progressive=True)
    assert b"\xff\xc2" in payload  # really SOF2
    ours = decode_jpeg(payload)
    theirs = _jvm_decode(spark, payload)
    assert ours.shape == theirs.shape == img.shape
    diff = np.abs(theirs.astype(int) - ours.astype(int))
    assert diff.mean() < 2 and np.percentile(diff, 99) <= 8, (
        f"progressive decoders disagree: mean={diff.mean():.2f} "
        f"p99={np.percentile(diff, 99)}"
    )


@pytest.mark.parametrize("payload", [
    b"\xff\xd8\xff\xc0\x00\x11\x08",          # truncated SOF
    b"\xff\xd8\xff\xda\x00\x08\x01\x09\x00\x00\x3f\x00",  # SOS before SOF
    b"\xff\xd8\xff\xdb\x00\x43\x00" + b"\x01" * 8,  # truncated DQT
    b"\xff\xd8" + b"\xff\xc4\x00\x05\x00\x01",  # malformed DHT then EOF
], ids=["trunc-sof", "sos-no-sof", "trunc-dqt", "bad-dht"])
def test_corrupt_streams_raise_unsupported_only(payload):
    """The decode seam catches UnsupportedImageError ONLY — every corrupt
    or truncated stream must surface as that, never struct.error /
    IndexError / KeyError / StopIteration (code-review r03 finding)."""
    from pyanomalydetector2_spark.operators.image_codec import jpeg_header

    with pytest.raises(UnsupportedImageError):
        decode_jpeg(payload)
    with pytest.raises(UnsupportedImageError):
        jpeg_header(payload)


def test_scan_with_unknown_component_raises_unsupported():
    img = bytearray(encode_jpeg_baseline(_test_image(8, 8)))
    sos = img.find(b"\xff\xda")
    img[sos + 5] = 9  # scan names component id 9 — not in the frame
    with pytest.raises(UnsupportedImageError):
        decode_jpeg(bytes(img))
