"""Ogg-Opus and MPEG(MP3) container-parser tests: page/frame geometry
round-trips, CRC verification actually fires, packet reassembly across
pages, OpusHead field parse, and the MPEG header tables against published
ISO values — the container walks are REAL even though the codec payloads
inside stay the declared fake.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyanomalydetector2_spark.operators.mp3_frames import (
    Mp3Error,
    encode_mp3_shell,
    frame_payload_bytes,
    mp3_frames,
    mp3_info,
    parse_frame_header,
    skip_id3v2,
)
from pyanomalydetector2_spark.operators.ogg_opus import (
    OggError,
    encode_ogg_opus,
    fake_opus_packets,
    ogg_crc,
    ogg_opus_info,
    opus_packet_bytes,
    parse_opus_head,
    read_pages,
    write_page,
)


# ------------------------------------------------------------------ Ogg --
def test_ogg_crc_spec_vector():
    # CRC-32/CKSUM family with init=0, no xorout (the Ogg variant):
    # published check value for '123456789' is 0x89A1897F
    assert ogg_crc(b"123456789") == 0x89A1897F


def test_ogg_page_roundtrip_and_crc_detects_corruption():
    page = write_page(7, 0, 1234, [b"hello", b"world!"], bos=True)
    [(hdr, packets)] = list(read_pages(page))
    assert hdr["granule"] == 1234 and hdr["bos"] and packets == [b"hello", b"world!"]
    bad = bytearray(page)
    bad[-3] ^= 1  # flip a body bit
    with pytest.raises(OggError, match="CRC"):
        list(read_pages(bytes(bad)))


def test_ogg_packet_spanning_255_boundaries():
    """A packet of exactly k*255 bytes needs a 0-length terminating lacing
    value; packets > 255 span multiple lacing entries."""
    big = bytes(range(256)) * 2  # 512 = 255 + 255 + 2
    exact = b"x" * 510  # 255 + 255 + 0-terminator
    page = write_page(1, 0, 0, [big, exact, b""])
    [(_, packets)] = list(read_pages(page))
    assert packets == [big, exact, b""]


def test_opus_head_fields_and_e2e_info():
    pcm = (1000 * np.sin(np.arange(512) * 0.1)).astype(np.int64)
    payload = encode_ogg_opus(
        fake_opus_packets(pcm), sample_rate=16000, channels=1, pre_skip=312
    )
    info = ogg_opus_info(payload)
    assert info["channels"] == 1
    assert info["input_sample_rate"] == 16000
    assert info["pre_skip"] == 312
    assert info["n_audio_packets"] == 1
    assert info["audio_bytes"] == 1024
    # packet bytes reassemble to the exact PCM
    assert np.array_equal(
        np.frombuffer(opus_packet_bytes(payload), dtype="<i2"),
        pcm.astype("<i2"),
    )
    with pytest.raises(OggError):
        parse_opus_head(b"NotOpus!" + b"\x00" * 16)
    with pytest.raises(OggError):
        ogg_opus_info(b"OggS" + b"\x00" * 50)


# ------------------------------------------------------------------ MP3 --
def test_mp3_header_tables_iso_anchors():
    """Published ISO frame sizes: MPEG-1 Layer III, 128 kbps @ 44100 →
    417 bytes (418 padded); 320 kbps @ 44100 → 1044."""
    def hdr_word(br_idx, padding):
        return (
            (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
            | (br_idx << 12) | (0 << 10) | (padding << 9)
        ).to_bytes(4, "big")

    h = parse_frame_header(hdr_word(9, 0), 0)
    assert (h["bitrate"], h["sample_rate"], h["length"]) == (128000, 44100, 417)
    assert parse_frame_header(hdr_word(9, 1), 0)["length"] == 418
    assert parse_frame_header(hdr_word(14, 0), 0)["length"] == 1044


def test_mp3_shell_roundtrip_and_id3_skip():
    pcm = np.arange(-512, 512, 2, dtype=np.int64).astype("<i2").tobytes()
    payload = encode_mp3_shell(pcm)
    info = mp3_info(payload)
    assert info["cbr"] and info["bitrate"] == 64000
    # 64 kbps @ 44100 MPEG-1 L3 -> 208/209-byte frames (204/205 payload)
    assert info["n_frames"] == -(-len(pcm) // 204)
    assert frame_payload_bytes(payload)[: len(pcm)] == pcm
    # an ID3v2 tag in front is skipped via its syncsafe size
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 5]) + b"\x00" * ((1 << 7) + 5)
    assert skip_id3v2(id3 + payload) == len(id3)
    assert mp3_info(id3 + payload)["n_frames"] == info["n_frames"]


def test_mp3_corruption_detected():
    payload = bytearray(encode_mp3_shell(b"\x01\x02" * 600))
    with pytest.raises(Mp3Error, match="sync"):
        list(mp3_frames(b"\x00" * 100))
    payload[1] = 0x00  # destroy the first sync
    with pytest.raises(Mp3Error):
        list(mp3_frames(bytes(payload)))
    # truncating mid-frame is caught, not silently accepted
    good = encode_mp3_shell(b"\x01\x02" * 600)
    with pytest.raises(Mp3Error, match="truncated"):
        list(mp3_frames(good[: len(good) - 7]))


def test_audio_container_meta_operator(spark):
    """The DataFrame-level no-decode metadata pass: real container walks
    per format, bad rows degrade to ok=false."""
    from pyanomalydetector2_spark.datagen.clips import _gen_batch, clips_table
    from pyanomalydetector2_spark.operators.multimodal import audio_container_meta

    clips = clips_table(spark, 400, planted=True, n_buckets=4)
    meta = {r["clip_id"]: r for r in audio_container_meta(clips).collect()}
    pdf = _gen_batch(np.arange(0, 400, dtype=np.int64), planted=True)
    by_codec = dict(zip(pdf["clip_id"], pdf["codec"]))
    len_by_cid = {c: len(b) for c, b in zip(pdf["clip_id"], pdf["bytes"])}
    row_sr = dict(zip(pdf["clip_id"], pdf["sr_hz"]))
    n_ok = 0
    for cid, r in meta.items():
        codec = by_codec[cid]
        if codec == "flac":
            assert r["container"] == "flac" and r["n_units"] == 512 and r["ok"]
        elif codec == "opus":
            assert r["container"] == "ogg-opus" and r["ok"]
            assert r["payload_bytes"] == len_by_cid[cid]  # one semantics
        elif codec == "mp3":
            assert r["container"] == "mpeg" and r["n_units"] >= 2 and r["ok"]
        elif codec == "wav":
            assert r["container"] == "wav" and r["n_units"] == 512 and r["ok"]
            assert r["sample_rate"] == row_sr[cid] and r["channels"] == 1
        elif codec == "amr_nb":  # planted unknown codec: raw PCM payload
            assert not r["ok"]
        n_ok += bool(r["ok"])
    assert n_ok > 300


def test_ogg_crc_fast_path_equals_reference():
    """The zlib-reflection fast CRC must equal the spec-table reference on
    arbitrary data (pins the rev8/rev32 identity)."""
    import os

    from pyanomalydetector2_spark.operators.ogg_opus import ogg_crc_reference

    for n in (0, 1, 3, 27, 255, 1156, 4097):
        d = os.urandom(n)
        assert ogg_crc(d) == ogg_crc_reference(d)


def test_container_check_tier_in_suite(spark):
    """RowCheck(requires_container=True): the cheap no-decode validation
    tier — planted unknown-codec rows (raw PCM under 'amr_nb') fail the
    container walk in closed form, every real-container row passes."""
    from pyanomalydetector2_spark.constraints import run_suite
    from pyanomalydetector2_spark.constraints.dsl import RowCheck, Suite
    from pyanomalydetector2_spark.datagen.clips import _gen_batch, clips_table, dim_codec, dim_sr

    n = 2000
    clips = clips_table(spark, n, planted=True, n_buckets=8)
    suite = Suite(
        row_checks=(
            RowCheck(
                "container_parses",
                "container_ok",
                "coalesce(container, 'unparseable')",
                "payload parses as a known real container",
                requires_container=True,
            ),
        ),
    )
    res = run_suite(
        clips, clips, {"dim_codec": dim_codec(spark), "dim_sr": dim_sr(spark)},
        suite, "container-test",
    )
    viol = res.violations.collect()
    pdf = _gen_batch(np.arange(0, n, dtype=np.int64), planted=True)
    expected_bad = int((pdf["codec"] == "amr_nb").sum())
    assert expected_bad > 0 and len(viol) == expected_bad
    assert all(v["constraint_id"] == "container_parses" for v in viol)


def test_opus_multipage_tags_classified_by_packet_index():
    """RFC 7845 allows OpusTags to span pages (embedded art): packets must
    be classified by PACKET index, not page index — the big tags packet
    must neither fail validation nor leak into the audio bytes."""
    import struct

    from pyanomalydetector2_spark.operators.ogg_opus import write_page

    head = (
        b"OpusHead" + bytes([1, 1]) + struct.pack("<HIhB", 0, 16000, 0, 0)
    )
    big_tags = b"OpusTags" + b"\x00" * 700  # > 1 page at our page sizing?
    audio = b"\x11\x22" * 400
    serial = 99
    # split the tags packet across two pages by hand: first page carries
    # 255*2 lacing (continued), second page completes it (lv < 255)
    part1, part2 = big_tags[:510], big_tags[510:]
    pages = bytearray()
    pages += write_page(serial, 0, 0, [head], bos=True)
    # page with an UNTERMINATED packet (all lacing values 255; granule -1
    # per spec for a page completing no packet) — write_page can't emit
    # unterminated packets, so build this page manually
    from pyanomalydetector2_spark.operators.ogg_opus import ogg_crc

    page = bytearray(
        struct.pack("<4sBBqIIIB", b"OggS", 0, 0, -1, serial, 1, 0, 2)
        + bytes([255, 255]) + part1
    )
    page[22:26] = struct.pack("<I", ogg_crc(bytes(page)))
    pages += bytes(page)
    # continuation page completes tags, then the audio packet
    page2 = bytearray(
        struct.pack(
            "<4sBBqIIIB", b"OggS", 0, 1, 960, serial, 2, 0,
            1 + 4,
        )
        + bytes([len(part2), 255, 255, 255, 35])
        + part2 + audio
    )
    page2[22:26] = struct.pack("<I", ogg_crc(bytes(page2)))
    pages += bytes(page2)

    info = ogg_opus_info(bytes(pages))
    assert info["n_audio_packets"] == 1 and info["audio_bytes"] == len(audio)
    assert opus_packet_bytes(bytes(pages)) == audio


def test_mp3_valid_trailers_and_lenient_decode():
    """Spec-valid trailers (ID3v1 'TAG' block, appended ID3v2, v2.4 footer
    flag) terminate the walk cleanly; a truncated final frame raises in
    strict mode but the decode posture stops at the last complete frame."""
    import struct

    data = b"\x03\x04" * 500
    payload = encode_mp3_shell(data, 44100)
    n = mp3_info(payload)["n_frames"]

    # ID3v1 trailer
    assert mp3_info(payload + b"TAG" + b"\x00" * 125)["n_frames"] == n
    # appended ID3v2 tag
    appended = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    assert mp3_info(payload + appended)["n_frames"] == n
    # leading ID3v2.4 WITH the footer flag set (0x10): footer skipped too
    sz = 20
    lead = (
        b"ID3\x04\x00\x10" + bytes([0, 0, 0, sz]) + b"\x00" * sz
        + b"3DI\x04\x00\x10" + bytes([0, 0, 0, sz])
    )
    assert mp3_info(lead + payload)["n_frames"] == n
    # truncation: strict raises, decode posture returns complete frames
    cut = payload[:-7]
    with pytest.raises(Mp3Error, match="truncated"):
        mp3_info(cut)
    assert len(frame_payload_bytes(cut)) > 0


def test_ogg_sequence_gap_detected():
    """A missing whole page must raise, not silently mis-assemble packets
    (ADVICE r03): per-serial sequence numbers are checked for continuity."""
    serial = 5
    pages = (
        write_page(serial, 0, 0, [b"a"], bos=True)
        + write_page(serial, 1, 10, [b"b"])
        + write_page(serial, 2, 20, [b"c"])
    )
    # drop the middle page: split on page boundaries via re-encode
    p0 = write_page(serial, 0, 0, [b"a"], bos=True)
    p2 = write_page(serial, 2, 20, [b"c"])
    with pytest.raises(OggError, match="sequence gap"):
        list(read_pages(p0 + p2))
    # intact stream still reads fine
    assert len(list(read_pages(pages))) == 3


def test_ogg_continued_flag_consistency():
    """continued flag must agree with the carry state on both sides:
    a page claiming continuation with nothing open raises, and a page
    following an open packet without the flag raises."""
    import struct

    serial = 8
    # page 0 leaves an open packet (single 255 lacing value, no terminator)
    open_page = bytearray(
        struct.pack("<4sBBqIIIB", b"OggS", 0, 2, -1, serial, 0, 0, 1)
        + bytes([255]) + b"x" * 255
    )
    open_page[22:26] = struct.pack("<I", ogg_crc(bytes(open_page)))

    # follow-up WITHOUT the continued flag → inconsistent
    closed_next = write_page(serial, 1, 0, [b"tail"])
    with pytest.raises(OggError, match="lacks the continued flag"):
        list(read_pages(bytes(open_page) + closed_next))

    # continued flag with NO open packet → inconsistent
    cont = bytearray(
        struct.pack("<4sBBqIIIB", b"OggS", 0, 1, 0, serial, 1, 0, 1)
        + bytes([4]) + b"tail"
    )
    cont[22:26] = struct.pack("<I", ogg_crc(bytes(cont)))
    first = write_page(serial, 0, 0, [b"whole"], bos=True)
    with pytest.raises(OggError, match="no packet was left open"):
        list(read_pages(first + bytes(cont)))

    # the consistent version (continued flag + open carry) reassembles
    good = bytearray(
        struct.pack("<4sBBqIIIB", b"OggS", 0, 1, 0, serial, 1, 0, 1)
        + bytes([4]) + b"tail"
    )
    good[22:26] = struct.pack("<I", ogg_crc(bytes(good)))
    out = list(read_pages(bytes(open_page) + bytes(good)))
    assert out[-1][1] == [b"x" * 255 + b"tail"]


def test_ogg_multiplexed_serials_independent_state():
    """Interleaved logical streams keep independent seq counters and
    carry state — a gap in one serial is caught even when another serial's
    pages sit in between."""
    a, b = 100, 200
    stream = (
        write_page(a, 0, 0, [b"a0"], bos=True)
        + write_page(b, 0, 0, [b"b0"], bos=True)
        + write_page(a, 1, 1, [b"a1"])
        + write_page(b, 1, 1, [b"b1"])
    )
    assert len(list(read_pages(stream))) == 4
    gap = (
        write_page(a, 0, 0, [b"a0"], bos=True)
        + write_page(b, 0, 0, [b"b0"], bos=True)
        + write_page(a, 2, 1, [b"a2"])  # serial a skipped seq 1
    )
    with pytest.raises(OggError, match="sequence gap for serial 100"):
        list(read_pages(gap))


def test_audio_container_consistency_operator(spark):
    """Declared-vs-container cross-field check: planted stale durations,
    wrong declared sample rates, truncated blobs, and raw streams (no
    container rate → duration falls back to the declared sr) must each
    produce the right verdict from REAL header walks."""
    import numpy as np

    from pyanomalydetector2_spark.operators.audio import encode_wav
    from pyanomalydetector2_spark.operators.flac_codec import encode_flac
    from pyanomalydetector2_spark.operators.multimodal import (
        audio_container_consistency,
    )

    rng = np.random.default_rng(7)
    pcm = (rng.integers(-2000, 2000, size=8000)).astype(np.int64)  # 1 s @ 8 kHz
    flac = encode_flac(pcm, rate=8000)
    wav = encode_wav(pcm.astype(np.int16), sr_hz=8000)
    g711 = bytes(rng.integers(0, 256, size=4000, dtype=np.uint8))  # 0.5 s

    rows = [
        # (id, payload, codec, declared_dur, declared_sr, want dur_ok/sr_ok)
        ("ok_flac", flac, "flac", 1000, 8000, 1, 1),
        ("stale_dur", flac, "flac", 1500, 8000, 0, 1),
        ("stale_sr", flac, "flac", 1000, 16000, 1, 0),
        ("ok_wav", wav, "wav", 1020, 8000, 1, 1),  # within 50 ms tolerance
        ("trunc_wav", wav[: len(wav) // 2], "wav", 1000, 8000, 0, 0),
        ("raw_half", g711, "pcm_mulaw", 500, 8000, 1, 1),
        ("raw_bad", g711, "pcm_mulaw", 1000, 8000, 0, 1),
        ("garbage", b"\x00\x01\x02\x03" * 10, "flac", 1000, 8000, 1, 1),
    ]
    df = spark.createDataFrame(
        [(r[0], bytearray(r[1]), r[2], r[3], r[4]) for r in rows],
        "clip_id string, bytes binary, codec string, dur_ms int, sr_hz int",
    )
    out = {r["clip_id"]: r for r in audio_container_consistency(df).collect()}

    r = out["ok_flac"]
    assert (r["container"], r["container_sr"], r["container_samples"]) == (
        "flac", 8000, 8000)
    assert r["container_dur_ms"] == 1000 and r["dur_ok"] and r["sr_ok"]
    assert not out["stale_dur"]["dur_ok"] and out["stale_dur"]["sr_ok"]
    # stale_sr: container says 8000, declared 16000 → sr_ok=0; the derived
    # duration uses the CONTAINER rate (1000 ms) so dur stays ok — the two
    # verdicts are independent by design
    assert out["stale_sr"]["sr_ok"] == 0 and out["stale_sr"]["dur_ok"] == 1
    assert out["ok_wav"]["dur_ok"] and out["ok_wav"]["container"] == "wav"
    # truncated wav: the RIFF size fields no longer match the blob →
    # wav_header_info returns None → unparseable → vacuous-True *_ok but a
    # NULL container; the suite pairs this with container_probe_ok
    tr = out["trunc_wav"]
    assert tr["container"] is None or tr["dur_ok"] == 0
    raw = out["raw_half"]
    assert raw["container"] == "raw-g711" and raw["container_sr"] is None
    assert raw["container_samples"] == 4000 and raw["container_dur_ms"] == 500
    assert raw["dur_ok"] == 1 and raw["sr_ok"] == 1
    assert out["raw_bad"]["dur_ok"] == 0 and out["raw_bad"]["sr_ok"] == 1
    g = out["garbage"]
    assert g["container"] is None and g["dur_ok"] == 1 and g["sr_ok"] == 1
