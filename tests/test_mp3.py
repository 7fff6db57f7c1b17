"""MP3 frame-header walk (functions/mp3.py).

The walker certifies an MPEG audio stream's structure without a decoder:
frame-length arithmetic is pinned to the public ISO 11172-3/13818-3
tables with well-known constants (128 kbps @ 44.1 kHz Layer III = 417
bytes unpadded / 418 padded), round-trips cover every MPEG version and
layer, the CRC-16 (0x8005, init 0xFFFF) catches a single flipped side-
info bit, ID3v2 syncsafe sizes and ID3v1 trailers are skipped, and the
Xing/Info/VBRI declared frame counts are cross-checked against the
walked count. The ledger corpus's truth is computed from the GENERATOR's
parameters (never by running the walker at synth time), so corpus
verification is a genuine independent check.
"""

import numpy as np
import pytest

from jsonschema_spark.functions.mp3 import (
    build_frame,
    crc16_mpeg,
    encode_mp3_stream,
    frame_length,
    parse_mp3_stream,
    samples_per_frame,
)


def test_frame_length_arithmetic_pins():
    # canonical public constants
    assert frame_length(3, 3, 128000, 44100, 0) == 417
    assert frame_length(3, 3, 128000, 44100, 1) == 418
    assert frame_length(3, 3, 320000, 44100, 0) == 1044
    assert frame_length(2, 3, 64000, 16000, 0) == 288  # MPEG2: 72*br/sr
    assert frame_length(0, 3, 40000, 8000, 0) == 360
    # Layer I pads a 4-byte SLOT, not a byte
    assert frame_length(3, 1, 256000, 32000, 0) == 384
    assert frame_length(3, 1, 256000, 32000, 1) == 388
    assert frame_length(3, 2, 192000, 48000, 0) == 576
    # samples per frame: L1 384, L2 1152, L3 1152 (MPEG1) / 576 (LSF)
    assert samples_per_frame(3, 1) == 384
    assert samples_per_frame(3, 2) == 1152
    assert samples_per_frame(3, 3) == 1152
    assert samples_per_frame(2, 3) == 576
    assert samples_per_frame(0, 3) == 576


def test_crc16_mpeg_known_vector():
    # CRC-16/BUYPASS-family check (poly 0x8005, init 0xFFFF, MSB-first,
    # no reflection, no final xor): "123456789" -> 0xAEE7 is the
    # published check value for this parameterization (CRC-16/CMS).
    assert crc16_mpeg(b"123456789") == 0xAEE7
    assert crc16_mpeg(b"") == 0xFFFF


def test_cbr_roundtrip_all_versions_layers():
    cases = [
        (3, 3, 44100, "stereo", 128, 1152),
        (3, 2, 48000, "stereo", 192, 1152),
        (3, 1, 32000, "stereo", 256, 384),
        (2, 3, 16000, "mono", 64, 576),
        (0, 3, 8000, "mono", 40, 576),
    ]
    for vid, layer, sr, mode, br, spf in cases:
        raw = encode_mp3_stream(17, vid, layer, sr, mode, (br,), seed=vid)
        r = parse_mp3_stream(raw)
        assert r["ok"], (vid, layer, r)
        assert r["layer"] == layer and r["sr_hz"] == sr
        assert r["mode"] == mode and not r["vbr"]
        assert r["n_frames"] == 17
        assert r["parsed_dur_ms"] == 17 * spf * 1000 // sr
        assert (r["br_min_kbps"], r["br_max_kbps"]) == (br, br)
        assert r["crc_frames"] == 0 and r["info_frames"] is None


def test_padding_pattern_changes_length_not_count():
    a = encode_mp3_stream(10, 3, 3, 44100, "stereo", (128,), seed=1)
    b = encode_mp3_stream(
        10, 3, 3, 44100, "stereo", (128,), seed=1, padding_pattern=(0, 1)
    )
    assert len(b) == len(a) + 5
    ra, rb = parse_mp3_stream(a), parse_mp3_stream(b)
    assert ra["n_frames"] == rb["n_frames"] == 10
    assert ra["parsed_dur_ms"] == rb["parsed_dur_ms"]


def test_vbr_with_xing_header():
    raw = encode_mp3_stream(
        30, 3, 3, 44100, "joint", (96, 128, 160), seed=9, xing="xing"
    )
    r = parse_mp3_stream(raw)
    assert r["ok"] and r["vbr"]
    assert r["n_frames"] == 31  # Xing frame counts in the stream total
    assert (r["br_min_kbps"], r["br_max_kbps"]) == (96, 160)
    assert r["info_frames"] == 31 and r["info_ok"] is True


def test_info_header_mismatch_is_flagged_not_fatal():
    raw = encode_mp3_stream(
        20, 3, 3, 44100, "stereo", (128,), seed=6, xing="info",
        xing_frames=99,
    )
    r = parse_mp3_stream(raw)
    assert r["ok"] and r["info_frames"] == 99 and r["info_ok"] is False


def test_vbri_header():
    raw = encode_mp3_stream(
        20, 3, 3, 32000, "stereo", (128,), seed=6, vbri_frames=21
    )
    r = parse_mp3_stream(raw)
    assert r["ok"] and r["n_frames"] == 21
    assert r["info_frames"] == 21 and r["info_ok"] is True


def test_crc_protection_verifies_and_catches_flips():
    raw = encode_mp3_stream(
        25, 2, 3, 22050, "mono", (64,), seed=3, protected=True
    )
    r = parse_mp3_stream(raw)
    assert r["ok"] and r["crc_frames"] == 25
    # flip one side-info bit (byte 8 = third side-info byte of frame 0:
    # header 4B + CRC 2B + side info starts at 6)
    b = bytearray(raw)
    b[8] ^= 0x40
    assert parse_mp3_stream(bytes(b))["error"] == "crc_mismatch"
    # flipping an UNPROTECTED payload byte is invisible to a walker
    b = bytearray(raw)
    b[100] ^= 0x01
    assert parse_mp3_stream(bytes(b))["ok"]


def test_id3v2_and_id3v1_wrappers_skip():
    raw = encode_mp3_stream(
        10, 3, 3, 48000, "stereo", (192,), seed=4, id3v2_size=300,
        id3v1=True,
    )
    r = parse_mp3_stream(raw)
    assert r["ok"] and r["has_id3v2"] and r["n_frames"] == 10
    # syncsafe size crossing a 7-bit boundary
    raw = encode_mp3_stream(
        5, 3, 3, 44100, "mono", (128,), seed=4, id3v2_size=130
    )
    assert parse_mp3_stream(raw)["ok"]


def test_malformed_streams_fail_loudly():
    raw = encode_mp3_stream(10, 3, 3, 44100, "stereo", (128,), seed=5)
    assert parse_mp3_stream(raw[:-9])["error"] == "truncated"
    b = bytearray(raw)
    b[417] = 0x00  # second frame's sync byte (417B CBR frames)
    assert parse_mp3_stream(bytes(b))["error"] == "sync_lost"
    assert parse_mp3_stream(raw + b"\x12\x13")["error"] == "trailing_garbage"
    assert parse_mp3_stream(raw + b"\x12\x13\x14\x15\x16")["error"] == (
        "sync_lost"
    )
    assert parse_mp3_stream(b"")["error"] == "no_sync"
    assert parse_mp3_stream(b"\x00" * 64)["error"] == "no_sync"
    # reserved version bits (01)
    b = bytearray(raw)
    b[1] = 0xE8 | 1
    assert parse_mp3_stream(bytes(b))["error"] == "bad_header"
    # free-format bitrate: rejected, never guessed
    b = bytearray(raw)
    b[2] = b[2] & 0x0F
    assert parse_mp3_stream(bytes(b))["error"] == "free_bitrate"
    # bitrate index 15
    b = bytearray(raw)
    b[2] = b[2] | 0xF0
    assert parse_mp3_stream(bytes(b))["error"] == "bad_header"
    # a version change mid-stream is inconsistent
    f1 = encode_mp3_stream(1, 3, 3, 44100, "stereo", (128,), seed=1)
    f2 = encode_mp3_stream(1, 2, 3, 16000, "mono", (64,), seed=1)
    assert parse_mp3_stream(f1 + f2)["error"] == "inconsistent_stream"


def test_build_frame_rejects_info_outside_layer3():
    with pytest.raises(ValueError):
        build_frame(3, 2, 192, 48000, "stereo", info_magic=b"Xing",
                    info_frames=1)


def test_mp3_ledger_corpus_verifies(spark):
    """Ledger truth (generator arithmetic) vs the walker, every class."""
    from jsonschema_spark.sources.clips import (
        MP3_CLASS_MOD,
        synth_mp3_clips,
    )

    rows = synth_mp3_clips(spark, 2 * MP3_CLASS_MOD).collect()
    assert len(rows) == 2 * MP3_CLASS_MOD
    errs = {}
    for r in rows:
        got = parse_mp3_stream(bytes(r["bytes"]))
        assert got["ok"] == r["_ok"], r["_row_idx"]
        assert got["error"] == r["_err"], r["_row_idx"]
        assert got["n_frames"] == r["_n_frames"], r["_row_idx"]
        assert got["parsed_dur_ms"] == r["_parsed_dur_ms"], r["_row_idx"]
        assert got["br_min_kbps"] == r["_br_min"], r["_row_idx"]
        assert got["br_max_kbps"] == r["_br_max"], r["_row_idx"]
        assert got["vbr"] == r["_vbr"], r["_row_idx"]
        assert got["info_frames"] == r["_info_frames"], r["_row_idx"]
        assert got["info_ok"] == r["_info_ok"], r["_row_idx"]
        assert got["crc_frames"] == r["_crc_frames"], r["_row_idx"]
        if not r["_ok"]:
            errs[r["_row_idx"] % MP3_CLASS_MOD] = r["_err"]
    assert errs == {9: "truncated", 10: "crc_mismatch", 11: "sync_lost"}


def test_audio_mp3_profile_spark_surface(spark):
    from jsonschema_spark.functions.mp3 import audio_mp3_profile
    from jsonschema_spark.sources.clips import synth_mp3_clips

    clips = synth_mp3_clips(spark, 24)
    out = (
        clips.select(
            "_ok", "_n_frames",
            audio_mp3_profile("bytes").alias("p"),
        )
        .select("_ok", "_n_frames", "p.ok", "p.n_frames")
        .collect()
    )
    for r in out:
        assert r["ok"] == r["_ok"]
        assert r["n_frames"] == r["_n_frames"]
