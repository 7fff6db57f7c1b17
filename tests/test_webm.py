"""WebM / Matroska EBML structural walk (functions/webm.py) — RFC 8794
+ the public Matroska/WebM element specs."""

import pytest

from jsonschema_spark.functions.webm import (
    elem,
    encode_webm,
    parse_webm,
    read_vint,
    walk_ebml,
    SEGMENT,
    SIMPLE_BLOCK,
)


def test_vint_forms():
    # 1-byte id keeps its marker; data sizes strip it
    assert read_vint(b"\x81", 0, False) == (1, 1)
    assert read_vint(b"\x81", 0, True) == (0x81, 1)
    assert read_vint(b"\x40\x7f", 0, False) == (0x7F, 2)
    assert read_vint(b"\x1a\x45\xdf\xa3", 0, True) == (0x1A45DFA3, 4)
    with pytest.raises(ValueError, match="bad_vint"):
        read_vint(b"\x00\x01", 0, False)


def test_round_trip_av():
    p = parse_webm(encode_webm(12, 24, seed=1))
    assert p["ok"] and p["n_tracks"] == 2
    assert (p["video_blocks"], p["audio_blocks"]) == (12, 24)
    assert p["video_codec"] == "V_VP9" and p["audio_codec"] == "A_OPUS"
    assert p["sample_rate"] == 48000 and p["duration_ms"] == 2000
    assert p["blocks_consistent"]


def test_unknown_size_segment_tolerated():
    """The all-ones size marker is legal on Segment (live-muxed files);
    anywhere else it is a structural error."""
    raw = encode_webm(4, seed=2)
    top = list(walk_ebml(raw, 0, len(raw)))
    s = next(t for t in top if t[0] == SEGMENT)
    hdr_end = top[0][2]
    # rewrite Segment with the unknown-size marker
    body = raw[s[1] : s[2]]
    import struct

    unk = (0x18538067).to_bytes(4, "big") + b"\x01" + b"\xff" * 7
    p = parse_webm(raw[:hdr_end] + unk + body)
    assert p["ok"] and p["video_blocks"] == 4, p


def test_failure_taxonomy():
    raw = encode_webm(8, 8, seed=3)
    assert parse_webm(raw[:-5])["error"] == "truncated"
    assert parse_webm(b"RIFF" + raw[4:])["error"] == "missing_ebml_header"
    assert parse_webm(encode_webm(3, doctype="webp"))["error"] == (
        "bad_doctype"
    )


def test_ledger_corpus_independent_pin():
    from jsonschema_spark.functions.webm import WEBM_PROFILE_FIELDS
    from jsonschema_spark.sources.videos import WEBM_CLASS_MOD, _webm_row

    for i in range(2 * WEBM_CLASS_MOD):
        row = _webm_row(i)
        p = parse_webm(bytes(row[1]))
        assert tuple(p[f] for f in WEBM_PROFILE_FIELDS) == row[3:], i


def test_walker_never_crashes_on_random_tears():
    import random

    rng = random.Random(17)
    raw = encode_webm(6, 10, seed=4)
    for _ in range(150):
        if rng.random() < 0.5:
            cand = raw[: rng.randrange(len(raw) + 1)]
        else:
            b = bytearray(raw)
            for _k in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            cand = bytes(b)
        p = parse_webm(cand)
        assert isinstance(p["ok"], bool)


def test_container_sniff_routes_webm():
    from jsonschema_spark.functions.containers import (
        _profile_one,
        container_sniff,
    )

    av = encode_webm(5, 10, seed=21)
    assert container_sniff(av) == "webm"
    p = _profile_one(av)
    assert p["ok"] and p["sample_rate"] == 48000 and p["channels"] == 1
    video_only = encode_webm(5, seed=22)
    p = _profile_one(video_only)
    assert not p["ok"] and p["error"] == "not_audio_container"


def test_lacing_modes_frame_counts():
    """Matroska lacing (Xiph / fixed / EBML-delta): frame counts per
    track come from the lacing tables, and a size table overrunning
    the block body is a structural error."""
    p = parse_webm(encode_webm(4, 6, audio_lacing=1,
                               audio_frames_per_block=4, seed=2))
    assert p["audio_blocks"] == 24 and p["video_blocks"] == 4
    p = parse_webm(encode_webm(4, 5, audio_lacing=2,
                               audio_frames_per_block=3, seed=3))
    assert p["audio_blocks"] == 15
    p = parse_webm(encode_webm(4, 5, audio_lacing=3,
                               audio_frames_per_block=4, seed=4))
    assert p["audio_blocks"] == 20
    # corrupt Xiph table: declared sizes exceed the body
    from jsonschema_spark.functions.webm import (
        CLUSTER,
        SEGMENT,
        SIMPLE_BLOCK,
        TIMESTAMP,
        _uint_body,
    )

    raw = encode_webm(3, seed=5)
    bad = elem(SIMPLE_BLOCK, b"\x81\x00\x00\x82\x02\xf0\xf0" + b"\x11" * 6)
    extra = elem(CLUSTER, elem(TIMESTAMP, _uint_body(50)) + bad)
    top = list(walk_ebml(raw, 0, len(raw)))
    seg = next(t for t in top if t[0] == SEGMENT)
    patched = raw[: top[0][2]] + elem(SEGMENT, raw[seg[1]:seg[2]] + extra)
    assert parse_webm(patched)["error"] == "bad_lacing"
