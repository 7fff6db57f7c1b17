"""Multi-bit-depth / multi-channel RIFF/WAVE ingestion
(functions/audio.encode_wav_pcm + the generalized _decode_wav_pcm16).

All conversions are pure integer arithmetic, pinned here sample-for-
sample: (u-128)<<8 for unsigned 8-bit, arithmetic >>8 (floor, keeps the
top 16 bits) for 24-bit, (l+r)>>1 for the stereo downmix — the same
conventions the DuckDB cross-engine oracle re-implements in SQL."""

import hashlib

import numpy as np
import pytest

from jsonschema_spark.functions.audio import (
    decode_payload,
    encode_wav_pcm,
    encode_wav_pcm16,
    pcm16_from_float,
    reference_signal,
)


def _sig(n: int = 4000, tag: str = "wavdepth") -> np.ndarray:
    return pcm16_from_float(reference_signal(tag, n)).astype(np.int64)


def test_pcm16_mono_matches_legacy_encoder():
    pcm = _sig()
    assert encode_wav_pcm(pcm, 16000) == encode_wav_pcm16(
        pcm.astype(np.int16), 16000
    )


def test_pcm8_recenter_and_scale():
    q8 = _sig() >> 8  # [-128, 127]
    out = decode_payload(encode_wav_pcm(q8, 16000, bits=8))
    assert np.array_equal(np.asarray(out, dtype=np.int64), q8 << 8)


def test_pcm24_top16_extraction_with_noisy_low_byte():
    pcm = _sig()
    rng = np.random.RandomState(1)
    v24 = (pcm << 8) | rng.randint(0, 256, len(pcm))
    out = decode_payload(encode_wav_pcm(v24, 16000, bits=24))
    assert np.array_equal(np.asarray(out, dtype=np.int64), pcm)


def test_pcm24_sign_extension_hand_values():
    v = np.array([-(1 << 23), -1, -256, 255, (1 << 23) - 1], dtype=np.int64)
    out = decode_payload(encode_wav_pcm(v, 8000, bits=24))
    # arithmetic >>8: floor division by 256 on the SIGNED int24 value
    assert list(out) == [-(1 << 15), -1, -1, 0, (1 << 15) - 1]


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_stereo_downmix_all_depths(bits):
    l16, r16 = _sig(tag="wd#L"), _sig(tag="wd#R")
    if bits == 8:
        st = np.stack([l16 >> 8, r16 >> 8], axis=1)
        want = ((st[:, 0] << 8) + (st[:, 1] << 8)) >> 1
    elif bits == 16:
        st = np.stack([l16, r16], axis=1)
        want = (l16 + r16) >> 1
    else:
        st = np.stack([l16 << 8, (r16 << 8) | 0xA5], axis=1)
        want = (l16 + r16) >> 1
    out = decode_payload(encode_wav_pcm(st, 16000, bits=bits))
    assert np.array_equal(np.asarray(out, dtype=np.int64), want)


def test_truncated_pcm_decodes_short_not_loud():
    # raw PCM has no integrity chain: a torn upload DECODES, just short
    # (whole frames below the cut) — the catch is length reconciliation
    pcm = _sig()
    raw = encode_wav_pcm(np.stack([pcm, pcm], axis=1) << 8, 16000, bits=24)
    cut = 44 + (len(raw) - 44) // 2 + 1
    out = decode_payload(raw[:cut])
    k = (cut - 44) // 6  # whole stereo-24 frames
    assert len(out) == k
    assert np.array_equal(np.asarray(out, dtype=np.int64), pcm[:k])


def test_rejections():
    pcm = _sig(100)
    with pytest.raises(ValueError):
        encode_wav_pcm(np.zeros((4, 3), dtype=np.int64), 8000)
    with pytest.raises(ValueError):
        encode_wav_pcm(pcm, 8000, bits=12)
    with pytest.raises(ValueError):
        encode_wav_pcm(np.array([200]), 8000, bits=8)  # out of range
    import struct

    bad = bytearray(encode_wav_pcm(pcm, 8000))
    struct.pack_into("<H", bad, 34, 32)  # bits=32: unsupported layout
    with pytest.raises(ValueError):
        decode_payload(bytes(bad))
    bad3 = bytearray(encode_wav_pcm(np.stack([pcm, pcm], axis=1), 8000))
    struct.pack_into("<H", bad3, 22, 3)  # 3 channels: unsupported
    with pytest.raises(ValueError):
        decode_payload(bytes(bad3))


def test_synth_wav_depth_ledger(spark):
    from jsonschema_spark.sources.clips import (
        WAVD_CLASS_MOD,
        WAVD_CLS_TRUNC,
        WAVD_LAYOUTS,
        synth_wav_depth_clips,
    )

    rows = synth_wav_depth_clips(spark, 5 * len(WAVD_LAYOUTS) + 3).collect()
    n_trunc = 0
    seen_layouts = set()
    for r in rows:
        seen_layouts.add(r["_row_idx"] % len(WAVD_LAYOUTS))
        dec = decode_payload(bytes(r["bytes"]))
        assert len(dec) == r["_n_dec"]
        got = hashlib.md5(
            np.asarray(dec, dtype="<i2").tobytes().hex().upper().encode()
        ).hexdigest()
        assert got == r["_dec_md5"]
        expect = r["sr_hz"] * r["dur_ms"] // 1000
        if r["_row_idx"] % WAVD_CLASS_MOD == WAVD_CLS_TRUNC:
            n_trunc += 1
            assert r["_n_dec"] < expect  # torn: short but certified
        else:
            assert r["_n_dec"] == expect
    assert n_trunc > 0
    assert seen_layouts == set(range(len(WAVD_LAYOUTS)))
