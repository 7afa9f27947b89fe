"""Real AVI container codec (RIFF walker + uncompressed DIB frames) and its
wiring into the frame-sampling operator — the video analog of the WAV audio
and BMP/PNG image decode paths."""

from __future__ import annotations

import numpy as np
import pytest

from pyanomalydetector2_spark.operators.video_codec import (
    UnsupportedVideoError,
    avi_header,
    decode_video,
    encode_avi,
    parse_avi,
)


@pytest.mark.parametrize("shape", [(1, 4, 4), (7, 9, 13), (3, 1, 1), (5, 16, 10)])
def test_avi_roundtrip(shape):
    rng = np.random.default_rng(5)
    fr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    avi = encode_avi(fr, fps=10)
    assert avi_header(avi) == (shape[2], shape[1], shape[0])
    assert np.array_equal(parse_avi(avi), fr)


def test_unsupported_and_truncated_raise():
    with pytest.raises(UnsupportedVideoError):
        decode_video(b"\x00" * 64)
    with pytest.raises(UnsupportedVideoError):
        decode_video(None)
    fr = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    with pytest.raises(UnsupportedVideoError):
        parse_avi(encode_avi(fr)[:-20])


def test_truncation_at_every_byte_raises_cleanly():
    """Chopping the container at ANY byte must yield UnsupportedVideoError
    (or a successful shorter parse) — never struct.error (which would kill
    a Spark task instead of taking the declared fallback)."""
    fr = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    avi = encode_avi(fr)
    for cut in range(len(avi)):
        try:
            avi_header(avi[:cut])
            parse_avi(avi[:cut])
        except UnsupportedVideoError:
            pass


def test_spark_frame_sampling_takes_the_real_path(spark):
    """sample_frames decodes real AVI frames (every Nth RGB buffer); opaque
    payloads still flow through the declared byte-slice fake."""
    from pyanomalydetector2_spark.operators.multimodal import sample_frames

    rng = np.random.default_rng(6)
    fr = rng.integers(0, 256, (25, 8, 6, 3), dtype=np.uint8)
    vids = spark.createDataFrame(
        [("real", encode_avi(fr)), ("opaque", bytes(range(256)) * 25), ("none", None)],
        "vid_id string, bytes binary",
    )
    rows = sample_frames(vids, every_n=10).collect()
    got = {(r.vid_id, r.frame_idx): r.frame_bytes for r in rows}
    assert sorted(i for v, i in got if v == "real") == [0, 10, 20]
    for i in (0, 10, 20):
        assert got[("real", i)] == fr[i].tobytes()
    assert sorted(i for v, i in got if v == "opaque") == [0, 10, 20]
    assert all(len(got[("opaque", i)]) == 256 for i in (0, 10, 20))
    assert not any(v == "none" for v, _ in got)
