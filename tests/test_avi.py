"""Motion-JPEG AVI (functions/avi.py) — REAL compressed video with the
engine's own JPEG codec inside a RIFF/AVI container.

Anchors: container round trip (parse agrees with synthesis params);
frame random access decodes bit-identical to a direct JPEG round trip;
torn tails keep the complete leading frames reachable and fail loudly
past them; planted violations (over-declared count, corrupted idx1,
dimension mismatch) land on their exact verdicts; the ledger corpus
matches the walker row-for-row.
"""

import struct

import numpy as np
import pytest

from jsonschema_spark.functions.avi import (
    avi_frame_chunks,
    decode_avi_frame,
    encode_avi_mjpeg,
    parse_avi_mjpeg,
)
from jsonschema_spark.functions.jpeg import decode_jpeg_gray, encode_jpeg_gray


def _frames(n=5, h=16, w=16, seed=2):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w)).astype(np.uint8)


def test_container_round_trip():
    fr = _frames(7, 24, 32)
    raw = encode_avi_mjpeg(fr, fps=30)
    p = parse_avi_mjpeg(raw)
    assert p["ok"] and p["error"] is None
    assert (p["width"], p["height"]) == (32, 24)
    assert p["fps"] == 30
    assert p["declared_frames"] == p["actual_frames"] == 7
    assert p["index_ok"] is True


def test_frame_random_access_matches_direct_jpeg():
    fr = _frames(4)
    raw = encode_avi_mjpeg(fr, quality=70)
    for k in range(4):
        direct = decode_jpeg_gray(encode_jpeg_gray(fr[k], 70))[2]
        assert np.array_equal(decode_avi_frame(raw, k), direct), k
    with pytest.raises(ValueError, match="not present"):
        decode_avi_frame(raw, 4)


def test_torn_tail_keeps_leading_frames():
    fr = _frames(6)
    raw = encode_avi_mjpeg(fr)
    chunks = avi_frame_chunks(raw)
    off, ln = chunks[3]
    torn = raw[: off + ln // 2]  # cut mid-frame-3
    assert parse_avi_mjpeg(torn)["error"] == "truncated"
    left = avi_frame_chunks(torn)
    assert len(left) == 3
    assert np.array_equal(decode_avi_frame(torn, 2), decode_avi_frame(raw, 2))


def test_planted_violations_exact_verdicts():
    fr = _frames(5)
    over = parse_avi_mjpeg(encode_avi_mjpeg(fr, declared_frames=7))
    assert over["error"] == "count_mismatch"
    idx = parse_avi_mjpeg(encode_avi_mjpeg(fr, corrupt_index=True))
    assert idx["ok"] is True and idx["index_ok"] is False
    assert parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")["error"] == "not_avi"
    # dimension mismatch: patch BITMAPINFOHEADER width
    raw = bytearray(encode_avi_mjpeg(fr))
    i = raw.find(b"strf")
    # strf body starts at i+8; biWidth at +4
    (bw,) = struct.unpack("<i", raw[i + 12 : i + 16])
    struct.pack_into("<i", raw, i + 12, bw + 8)
    assert parse_avi_mjpeg(bytes(raw))["error"] == "dims_mismatch"


def test_ledger_corpus_matches_walker(spark):
    from jsonschema_spark.sources.videos import (
        MJPEG_CLS_MOD,
        synth_mjpeg_videos,
    )

    rows = synth_mjpeg_videos(spark, 2 * MJPEG_CLS_MOD).collect()
    assert len(rows) == 2 * MJPEG_CLS_MOD
    for r in rows:
        # synth already asserts walker verdicts; here pin the ysums
        # ledger against a fresh decode of every complete frame
        data = bytes(r["bytes"])
        chunks = avi_frame_chunks(data)
        assert len(chunks) == len(r["_ysums"])
        for k, want in enumerate(r["_ysums"]):
            got = int(decode_avi_frame(data, k).astype(np.int64).sum())
            assert got == want, (r["_row_idx"], k)


def test_sample_frames_dispatch_handles_mjpeg(spark):
    """The generic sample_frames path (multimodal.decode_video_frame)
    now routes RIFF/AVI payloads through the MJPEG decoder."""
    from jsonschema_spark.functions.multimodal import decode_video_frame

    fr = _frames(3)
    raw = encode_avi_mjpeg(fr)
    for k in range(3):
        want = float(
            int(decode_avi_frame(raw, k).astype(np.int64).sum()) / (16 * 16)
        )
        assert decode_video_frame(raw, k) == want


# ---------------------------------------------------------------------------
# Interleaved audio stream (A/V demux)
# ---------------------------------------------------------------------------


def test_av_container_round_trip_and_demux():
    """A/V mux: the video walk still certifies the MJPEG stream (the
    audio strl must not shadow the vids headers), the audio demux is
    SAMPLE-EXACT, and the demuxed PCM feeds the engine's audio decode
    chain directly."""
    rng = np.random.default_rng(4)
    frames = _frames(5)
    pcm = rng.integers(-20000, 20000, 16000).astype(np.int16)
    from jsonschema_spark.functions.avi import (
        avi_audio_meta,
        avi_audio_pcm,
        encode_avi_mjpeg_av,
    )

    raw = encode_avi_mjpeg_av(frames, pcm, 16000)
    p = parse_avi_mjpeg(raw)
    assert p["ok"] and p["actual_frames"] == 5 and p["index_ok"]
    meta = avi_audio_meta(raw)
    assert meta == {"sample_rate": 16000, "channels": 1, "bits": 16,
                    "pcm": True}
    back = np.frombuffer(avi_audio_pcm(raw), dtype="<i2")
    assert np.array_equal(back, pcm)
    # demuxed payload decodes through the audio chain (raw s16le)
    from jsonschema_spark.functions.audio import decode_payload

    dec = decode_payload(avi_audio_pcm(raw))
    assert np.array_equal(dec, pcm.astype(np.int64))
    # video-only files report no audio stream
    assert avi_audio_meta(encode_avi_mjpeg(frames)) is None
    # torn tails keep the complete leading audio chunks
    torn = raw[: len(raw) // 2]
    part = np.frombuffer(avi_audio_pcm(torn), dtype="<i2")
    assert 0 < len(part) < len(pcm)
    assert np.array_equal(part, pcm[: len(part)])


def test_av_ledger_corpus_independent_pin(spark):
    """The AV corpus ledger md5 must equal an INDEPENDENT rebuild from
    the generator arithmetic (av_pcm) — proving the container stored
    the true signal, not merely that demux(x) == demux(x)."""
    import hashlib

    from jsonschema_spark.sources.videos import (
        AV_CLS_MOD,
        AV_SILENT_CLS,
        AV_TORN_CLS,
        _AV_RATES,
        av_pcm,
        mjpeg_frames,
        synth_av_videos,
    )

    rows = synth_av_videos(spark, 2 * AV_CLS_MOD).collect()
    for r in rows:
        i = r["_row_idx"]
        cls = i % AV_CLS_MOD
        if cls == AV_SILENT_CLS:
            assert r["_has_audio"] is False and r["_n_audio_bytes"] == 0
            continue
        n = mjpeg_frames(i).shape[0]
        sr = _AV_RATES[i % len(_AV_RATES)]
        full = av_pcm(i, sr * n // 25).astype("<i2").tobytes()
        assert r["_sr"] == sr
        if cls == AV_TORN_CLS:
            # demuxed stream is a PREFIX of the true signal
            assert 0 < r["_n_audio_bytes"] < len(full)
            want = hashlib.md5(full[: r["_n_audio_bytes"]]).hexdigest()
        else:
            assert r["_n_audio_bytes"] == len(full)
            want = hashlib.md5(full).hexdigest()
        assert r["_audio_md5"] == want, i


def test_audio_sniffer_rejects_avi_payloads():
    """An AVI payload in an AUDIO column must never silently 'decode'
    as bare PCM16 — the sniffer classifies RIFF-non-WAVE forms and the
    profile fails loudly."""
    from jsonschema_spark.functions.containers import (
        _profile_one,
        container_sniff,
    )

    raw = encode_avi_mjpeg(_frames(3))
    assert container_sniff(raw) == "avi"
    p = _profile_one(raw)
    assert p["ok"] is False and p["error"] == "not_audio_container"
    webp_ish = b"RIFF" + b"\x10\x00\x00\x00" + b"WEBPVP8 " + b"\x00" * 8
    assert container_sniff(webp_ish) == "riff_other"


def test_avi_walkers_never_crash_on_random_tears():
    """Any prefix/mutation of a valid stream gets a VERDICT (ok=False
    or a reduced chunk list), never an exception — the crawl-corpus
    robustness contract every walker in this engine holds."""
    import random

    from jsonschema_spark.functions.avi import (
        avi_audio_meta,
        avi_audio_pcm,
        encode_avi_mjpeg_av,
    )

    rng = random.Random(9)
    rng_np = np.random.default_rng(9)
    frames = _frames(4)
    pcm = rng_np.integers(-100, 100, 4000).astype(np.int16)
    raw = encode_avi_mjpeg_av(frames, pcm, 16000)
    for _ in range(120):
        mode = rng.random()
        if mode < 0.5:
            cand = raw[: rng.randrange(len(raw) + 1)]
        else:
            b = bytearray(raw)
            for _k in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            cand = bytes(b)
        p = parse_avi_mjpeg(cand)
        assert isinstance(p["ok"], bool)
        avi_frame_chunks(cand)
        avi_audio_pcm(cand)
        avi_audio_meta(cand)


def _shrink_chunk(raw: bytes, fourcc: bytes, keep: int) -> bytes:
    """Rewrite the first `fourcc` chunk to a `keep`-byte body with valid
    framing (length field updated, remainder of the file intact) — the
    foreign-AVI shape: correct chunk discipline, short header body."""
    i = raw.index(fourcc)
    (ln,) = struct.unpack("<I", raw[i + 4 : i + 8])
    body = raw[i + 8 : i + 8 + ln]
    pad = b"\x00" if keep & 1 else b""
    return (
        raw[:i]
        + fourcc
        + struct.pack("<I", keep)
        + body[:keep]
        + pad
        + raw[i + 8 + ln + (ln & 1):]
    )


def test_short_header_bodies_classified_not_crash():
    """ADVICE r3: avih/strf chunk bodies SHORTER than their fixed struct
    (valid framing) must produce an error verdict, not a struct.error
    that escapes the per-row walker and kills the Spark task."""
    from jsonschema_spark.functions.avi import avi_audio_meta

    raw = encode_avi_mjpeg(_frames(3))
    short_avih = _shrink_chunk(raw, b"avih", 40)
    p = parse_avi_mjpeg(short_avih)
    assert p["ok"] is False and p["error"] == "truncated"
    short_strf = _shrink_chunk(raw, b"strf", 10)
    p = parse_avi_mjpeg(short_strf)
    assert p["ok"] is False and p["error"] == "truncated"
    # short auds WAVEFORMATEX → no usable audio stream, not a crash
    from jsonschema_spark.functions.avi import encode_avi_mjpeg_av

    pcm = np.zeros(1600, dtype=np.int16)
    av = encode_avi_mjpeg_av(_frames(2), pcm, 16000)
    # the audio strf is the second strf chunk; shrink the LAST one
    j = av.rindex(b"strf")
    (ln,) = struct.unpack("<I", av[j + 4 : j + 8])
    short = (
        av[:j] + b"strf" + struct.pack("<I", 8) + av[j + 8 : j + 16]
        + av[j + 8 + ln + (ln & 1):]
    )
    assert avi_audio_meta(short) is None
