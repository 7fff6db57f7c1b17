"""Audio metadata extraction (functions/tags.py): ID3v2 frames, Vorbis
comments, OpusTags."""

import pytest

from jsonschema_spark.functions.mp3 import encode_mp3_stream
from jsonschema_spark.functions.tags import (
    build_comment_fields,
    build_id3v2,
    parse_audio_tags,
    parse_id3v2,
    syncsafe,
)


def _mp3(seed=0):
    return encode_mp3_stream(4, 2, 3, 16000, "mono", (64,), seed=seed)


def test_syncsafe():
    assert syncsafe(bytes((0, 0, 0x02, 0x01))) == 257
    with pytest.raises(ValueError):
        syncsafe(b"\x80\x00\x00\x00")


@pytest.mark.parametrize("version,encoding", [(3, 0), (3, 1), (3, 3),
                                              (4, 1), (4, 3)])
def test_id3v2_encodings_round_trip(version, encoding):
    title = "Take 9" if encoding == 0 else "Prise n° 9 ♪"
    raw = build_id3v2(title, "Band", "LP", version, encoding) + _mp3()
    t = parse_audio_tags(raw)
    assert t["ok"] and t["tag_format"] == f"id3v2.{version}"
    assert t["title"] == title and t["artist"] == "Band"
    assert t["album"] == "LP" and t["n_tags"] == 3


def test_vorbis_and_opus_comments():
    from jsonschema_spark.functions.ogg import (
        build_opus_packet,
        build_page,
        encode_ogg_vorbis_framed,
        opus_head_packet,
        vorbis_header_packets,
    )

    hdrs = list(vorbis_header_packets())
    hdrs[1] = (b"\x03vorbis"
               + build_comment_fields("v", ["TITLE=A", "ARTIST=B"])
               + b"\x01")
    t = parse_audio_tags(
        encode_ogg_vorbis_framed([b"\x00" * 30] * 3, header_packets=hdrs)
    )
    assert t["tag_format"] == "vorbis_comment" and t["title"] == "A"
    tags_pkt = b"OpusTags" + build_comment_fields("o", ["TITLE=C"])
    pages = [
        build_page(9, 0, 0, [opus_head_packet()], bos=True),
        build_page(9, 1, 0, [tags_pkt]),
        build_page(9, 2, 960, [build_opus_packet(9, 0, [40])], eos=True),
    ]
    t = parse_audio_tags(b"".join(pages))
    assert t["tag_format"] == "opus_tags" and t["title"] == "C"
    assert t["vendor"] == "o"


def test_failure_taxonomy():
    assert parse_audio_tags(_mp3())["error"] == "no_tags"
    tag = build_id3v2("T", "A", None, 3, 3)
    assert parse_audio_tags(tag[: len(tag) // 2])["error"] == (
        "truncated_tag"
    )
    b = bytearray(tag)
    b[14:18] = (1 << 20).to_bytes(4, "big")
    assert parse_audio_tags(bytes(b) + _mp3())["error"] == "frame_overrun"
    # duplicate frames: first one wins, both counted
    two = build_id3v2("First", "X", None, 3, 3)
    dup = build_id3v2("Second", "Y", None, 3, 3)
    merged = (two[:10] + two[10:-16] + dup[10:-16]
              + b"\x00" * 16)
    import struct

    body_len = len(merged) - 10
    merged = (b"ID3\x03\x00\x00"
              + bytes(((body_len >> 21) & 0x7F, (body_len >> 14) & 0x7F,
                       (body_len >> 7) & 0x7F, body_len & 0x7F))
              + merged[10:])
    t = parse_id3v2(merged)
    assert t["title"] == "First" and t["n_frames"] == 4


def test_parser_never_crashes_on_random_tears():
    import random

    rng = random.Random(23)
    raw = build_id3v2("T ♪", "A", "L", 4, 3) + _mp3(5)
    for _ in range(150):
        if rng.random() < 0.5:
            cand = raw[: rng.randrange(len(raw) + 1)]
        else:
            b = bytearray(raw)
            for _k in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            cand = bytes(b)
        t = parse_audio_tags(cand)
        assert isinstance(t["ok"], bool)
