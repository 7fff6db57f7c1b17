"""LPC subframes (functions/flac.py — RFC 9639 §9.2.4): quantized
Levinson-Durbin predictors, the subframe type that dominates real-world
FLAC. Encode emits LPC only when it beats the fixed predictors; decode
accepts any conforming stream and must stay bit-exact and LOUD."""

import numpy as np
import pytest

from jsonschema_spark.functions.flac import (
    _BitReader,
    _BitWriter,
    _crc16,
    _crc8,
    _lpc_analyze,
    _lpc_residual,
    _lpc_restore,
    _write_residual,
    decode_flac,
    encode_flac,
)


def _tone(n: int, w1: float = 0.15, w2: float = 0.23) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    x = 9000 * np.sin(w1 * t) + 4000 * np.sin(w2 * t + 1.0)
    return np.clip(np.floor(x + 0.5), -32768, 32767).astype(np.int64)


def test_lpc_restore_hand_computed():
    # s[i] = res[i] + ((c0*s[i-1] + c1*s[i-2]) >> shift), shift 1
    # warmup [10, 20]; coefs [3, -1] (c0 applies to the most recent)
    # s2 = 5 + ((3*20 - 1*10) >> 1) = 5 + 25 = 30
    # s3 = -2 + ((3*30 - 1*20) >> 1) = -2 + 35 = 33
    out = _lpc_restore(
        np.array([5, -2], dtype=np.int64), [10, 20], [3, -1], 1
    )
    assert out.tolist() == [10, 20, 30, 33]


def test_lpc_restore_negative_accumulator_floors():
    # acc = -3, shift 1 -> arithmetic shift gives -2 (floor), not -1
    out = _lpc_restore(np.array([0], dtype=np.int64), [-3], [1], 1)
    assert out.tolist() == [-3, -2]


def test_lpc_residual_inverts_restore():
    x = _tone(3000)
    lpc = _lpc_analyze(x, 8)
    assert lpc is not None
    order, coefs, shift, prec = lpc
    res = _lpc_residual(x, coefs, shift)
    back = _lpc_restore(res, [int(v) for v in x[:order]], coefs, shift)
    assert np.array_equal(back, x)


def test_lpc_beats_fixed_on_tonal_blocks():
    x = _tone(20000)
    lpc_bytes = encode_flac(x, 16000, lpc_max_order=8)
    fixed_bytes = encode_flac(x, 16000)
    assert len(lpc_bytes) < 0.8 * len(fixed_bytes)
    sr, dec = decode_flac(lpc_bytes)
    assert sr == 16000
    assert np.array_equal(np.asarray(dec, dtype=np.int64), x)


def test_lpc_stereo_all_assignments_roundtrip():
    l = _tone(9000, 0.11, 0.19)
    r = np.clip((l * 3) // 4 + _tone(9000, 0.07)[:9000] // 8,
                -32768, 32767)
    st = np.stack([l, r], axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        raw = encode_flac(st, 16000, stereo_mode=mode, lpc_max_order=8)
        _sr, dec = decode_flac(raw)
        assert np.array_equal(np.asarray(dec, dtype=np.int64), st), mode


def test_legacy_bitstreams_bit_identical():
    x = _tone(10000)
    assert encode_flac(x, 16000) == encode_flac(x, 16000, lpc_max_order=0)


def _lpc_frame_bytes(
    warmup, coefs, shift, res, prec=12, blocksize=None, depth=16
):
    """Hand-assemble one mono LPC frame (frame 0) + minimal stream."""
    n = blocksize or (len(warmup) + len(res))
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(0b0111, 4)
    w.write(0, 4)
    w.write(0, 4)
    w.write(0b100, 3)
    w.write(0, 1)
    w.write(0, 8)          # utf8 frame 0
    w.write(n - 1, 16)
    header = bytes(w.buf)
    w.write(_crc8(header), 8)
    order = len(coefs)
    w.write(0, 1)
    w.write(0b100000 | (order - 1), 6)
    w.write(0, 1)
    mask = (1 << depth) - 1
    for s in warmup:
        w.write(int(s) & mask, depth)
    w.write(prec - 1, 4)
    w.write(shift & 0x1F, 5)
    pmask = (1 << prec) - 1
    for c in coefs:
        w.write(int(c) & pmask, prec)
    _write_residual(w, np.asarray(res, dtype=np.int64))
    w.align()
    body = bytes(w.buf)
    import struct as _struct

    frame = body + _struct.pack(">H", _crc16(body))
    try:
        if shift < 0 or prec >= 16:
            raise ValueError("malformed fixture")
        pcm = _lpc_restore(np.asarray(res, dtype=np.int64),
                           [int(v) for v in warmup], list(coefs), shift)
    except ValueError:
        # malformed-stream fixtures (bad shift/precision, unstable
        # coefficients): the decoder raises before the MD5 check, so any
        # placeholder digest input will do
        pcm = np.zeros(n, dtype=np.int64)
    import hashlib as _hashlib

    md5 = _hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC")
    streaminfo = _struct.pack(">HH", n, n) + b"\x00\x00\x00" * 2
    packed = (16000 << 44) | (0 << 41) | (15 << 36) | n
    streaminfo += packed.to_bytes(8, "big") + md5
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    out += frame
    return bytes(out), pcm


def test_handassembled_lpc_stream_decodes():
    raw, pcm = _lpc_frame_bytes(
        [100, -50], [1500, -700], 10, list(range(-5, 59))
    )
    sr, dec = decode_flac(raw)
    assert sr == 16000
    assert np.array_equal(np.asarray(dec, dtype=np.int64), pcm)


def test_negative_lpc_shift_rejected():
    raw, _ = _lpc_frame_bytes([100, -50], [1500, -700], -1,
                              list(range(64)))
    with pytest.raises(ValueError, match="negative LPC shift"):
        decode_flac(raw)


def test_invalid_precision_rejected():
    raw, _ = _lpc_frame_bytes([100, -50], [-1, -1], 3, list(range(64)),
                              prec=16)
    # prec-1 = 15 = 0b1111 is the spec's invalid escape
    with pytest.raises(ValueError, match="LPC coefficient precision"):
        decode_flac(raw)


def test_unstable_corrupt_stream_fails_loudly():
    # garbage near-max coefficients with shift 0: the IIR explodes; the
    # decoder must raise (sample overflow or CRC/MD5), never hang or
    # crash the task with an uncatchable OverflowError
    raw, _ = _lpc_frame_bytes([30000, 30000], [2047, 2047], 0,
                              [1000] * 200)
    with pytest.raises(ValueError):
        decode_flac(raw)


def test_truncation_and_bitflip_fail_loudly():
    x = _tone(12000)
    raw = encode_flac(x, 16000, lpc_max_order=8)
    with pytest.raises(ValueError):
        decode_flac(raw[:-9])
    cand = bytearray(raw)
    cand[len(raw) // 2] ^= 0x10
    try:
        sr, dec = decode_flac(bytes(cand))
        # astronomically unlikely, but if CRCs collide the MD5 must catch
        assert np.array_equal(np.asarray(dec, dtype=np.int64), x)
    except ValueError:
        pass


def test_lpc_ledger_corpus_verifies(spark):
    from jsonschema_spark.functions.audio import decode_payload
    from jsonschema_spark.sources.clips import synth_flac_lpc_clips

    rows = synth_flac_lpc_clips(spark, 24).collect()
    import hashlib as _hashlib

    for r in rows:
        if r["_n_dec"] is None:
            with pytest.raises(Exception):
                decode_payload(bytes(r["bytes"]))
        else:
            dec = decode_payload(bytes(r["bytes"]))
            assert len(dec) == r["_n_dec"]
            got = _hashlib.md5(
                np.asarray(dec).astype("<i2").tobytes().hex().upper()
                .encode()
            ).hexdigest()
            assert got == r["_dec_md5"]


def test_seek_range_into_lpc_stream():
    from jsonschema_spark.functions.flac import decode_flac_range

    x = _tone(30000)
    raw = encode_flac(x, 16000, lpc_max_order=8, seek_every=2)
    # extract a window starting mid-stream: the seek skips leading
    # frames, and LPC frames inside the window must decode bit-exact
    _sr, w = decode_flac_range(raw, 17000, 3000)
    assert np.array_equal(np.asarray(w, dtype=np.int64), x[17000:20000])


def test_transcode_lpc_stays_lossless(spark):
    from pyspark.sql import Row

    from jsonschema_spark.functions.audio import (
        decode_payload,
        encode_wav_pcm,
    )
    from jsonschema_spark.operators.trim import transcode_to_flac

    x = _tone(8000)
    df = spark.createDataFrame(
        [Row(clip_id="a", bytes=bytearray(encode_wav_pcm(x, 16000)),
             sr_hz=16000, codec="wav")]
    )
    out = transcode_to_flac(df, lpc_max_order=8).collect()[0]
    assert out.transcoded and out.n_out == len(x)
    dec = decode_payload(bytes(out.bytes))
    assert np.array_equal(np.asarray(dec, dtype=np.int64), x)
    assert bytes(out.bytes)[:4] == b"fLaC"


def test_wasted_bits_roundtrip_and_smaller():
    # 8-bit source stored as 16-bit: every sample has 8 trailing zeros
    x = (_tone(12000) >> 8) << 8
    raw = encode_flac(x, 16000, detect_wasted=True)
    plain = encode_flac(x, 16000)
    assert len(raw) < 0.8 * len(plain)
    _sr, dec = decode_flac(raw)
    assert np.array_equal(np.asarray(dec, dtype=np.int64), x)
    # with LPC on top
    raw2 = encode_flac(x, 16000, detect_wasted=True, lpc_max_order=8)
    _sr, dec2 = decode_flac(raw2)
    assert np.array_equal(np.asarray(dec2, dtype=np.int64), x)


def test_wasted_bits_stereo_and_legacy_identity():
    x = (_tone(6000) >> 4) << 4
    st = np.stack([x, -x], axis=1)
    raw = encode_flac(st, 16000, detect_wasted=True)
    _sr, dec = decode_flac(raw)
    assert np.array_equal(np.asarray(dec, dtype=np.int64), st)
    # no shared trailing zeros -> detect_wasted is a no-op, bit-identical
    y = _tone(5000)
    y[0] |= 1
    assert encode_flac(y, 16000, detect_wasted=True) == encode_flac(
        y, 16000
    )


def test_wasted_bits_exceeding_depth_rejected():
    raw, _ = _lpc_frame_bytes([100, -50], [1500, -700], 10,
                              list(range(64)))
    # hand-corrupting the wasted field is fiddly; instead assert the
    # decoder guard directly on a depth-16 subframe claiming 16+ wasted
    from jsonschema_spark.functions.flac import _BitReader, _read_subframe

    w = _BitWriter()
    w.write(0, 1)
    w.write(0b000000, 6)
    w.write(1, 1)            # wasted flag
    w.write(0, 15)
    w.write(1, 1)            # unary 15 -> wasted = 16 == depth
    w.write(0, 16)
    w.align()
    with pytest.raises(ValueError, match="wasted bits exceed depth"):
        _read_subframe(_BitReader(bytes(w.buf)), 4, 16)


def _encode_variable(pcm, sr_hz, block_sizes, blocking_bits=None):
    """Test-side VARIABLE-blocksize encoder (the production encoder is
    fixed-bs by design): blocking bit 1, UTF-8 field = first SAMPLE
    number, per-frame 16-bit blocksize at end of header."""
    import hashlib as _hashlib
    import struct as _struct

    from jsonschema_spark.functions.flac import _write_subframe

    x = np.asarray(pcm, dtype=np.int64)
    assert sum(block_sizes) == len(x)
    frames = bytearray()
    sample = 0
    from jsonschema_spark.functions.flac import _utf8_encode

    for k, bs in enumerate(block_sizes):
        blk = x[sample : sample + bs]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(1 if blocking_bits is None else blocking_bits[k], 1)
        w.write(0b0111, 4)
        w.write(0, 4)
        w.write(0, 4)
        w.write(0b100, 3)
        w.write(0, 1)
        for b in _utf8_encode(sample):
            w.write(b, 8)
        w.write(bs - 1, 16)
        header = bytes(w.buf)
        w.write(_crc8(header), 8)
        _write_subframe(w, blk, 16)
        w.align()
        body = bytes(w.buf)
        frames += body + _struct.pack(">H", _crc16(body))
        sample += bs
    out = bytearray(b"fLaC")
    md5 = _hashlib.md5(x.astype("<i2").tobytes()).digest()
    streaminfo = _struct.pack(">HH", min(block_sizes), max(block_sizes))
    streaminfo += b"\x00\x00\x00" * 2
    packed = (sr_hz << 44) | (0 << 41) | (15 << 36) | len(x)
    streaminfo += packed.to_bytes(8, "big") + md5
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    out += frames
    return bytes(out)


def test_variable_blocksize_stream_decodes():
    x = _tone(3000)
    raw = _encode_variable(x, 16000, [1000, 700, 1300])
    sr, dec = decode_flac(raw)
    assert sr == 16000
    assert np.array_equal(np.asarray(dec, dtype=np.int64), x)


def test_variable_blocksize_range_decode_sample_addressing():
    from jsonschema_spark.functions.flac import decode_flac_range

    x = _tone(5000)
    raw = _encode_variable(x, 16000, [900, 1100, 1500, 1500])
    # no seek table: walks from frame 0, addresses by SAMPLE number
    _sr, w = decode_flac_range(raw, 2300, 1000)
    assert np.array_equal(np.asarray(w, dtype=np.int64), x[2300:3300])


def test_mixed_blocking_strategy_rejected():
    x = _tone(2000)
    raw = _encode_variable(x, 16000, [1000, 1000], blocking_bits=[1, 0])
    with pytest.raises(ValueError, match="mixed blocking strategy"):
        decode_flac(raw)


def test_depth_matrix_roundtrips():
    base = _tone(9000)
    for bits, x in (
        (8, base >> 8),
        (16, base),
        (24, np.clip(base << 8 | (base & 0xFF), -(1 << 23), (1 << 23) - 1)),
    ):
        for lmo in (0, 8):
            raw = encode_flac(x, 16000, bits=bits, lpc_max_order=lmo)
            _sr, dec = decode_flac(raw)
            assert np.array_equal(np.asarray(dec, dtype=np.int64), x), (
                bits, lmo,
            )
        st = np.stack([x, -x - 1], axis=1)
        raw = encode_flac(st, 16000, bits=bits, lpc_max_order=8)
        _sr, dec = decode_flac(raw)
        assert np.array_equal(np.asarray(dec, dtype=np.int64), st), bits


def test_depth_range_enforced_and_md5_width():
    x = _tone(2000)
    with pytest.raises(ValueError, match="8-bit range"):
        encode_flac(x, 16000, bits=8)
    with pytest.raises(ValueError, match="bits must be"):
        encode_flac(x, 16000, bits=48)
    # 24-bit MD5 covers 3-byte samples: a torn stream still fails loudly
    x24 = x << 8
    raw = encode_flac(x24, 16000, bits=24)
    with pytest.raises(ValueError):
        decode_flac(raw[:-5])


def test_decode_payload_depth_conventions():
    from jsonschema_spark.functions.audio import decode_payload

    base = _tone(4000)
    # 24-bit with a noisy low byte: decode_payload keeps the top 16
    # (arithmetic >>8), the same convention as 24-bit WAV ingestion
    x24 = (base << 8) | 0x5A
    out = decode_payload(encode_flac(x24, 16000, bits=24))
    assert np.array_equal(np.asarray(out, dtype=np.int64), x24 >> 8)
    # 8-bit FLAC samples are SIGNED: plain << 8
    x8 = base >> 8
    out = decode_payload(encode_flac(x8, 16000, bits=8))
    assert np.array_equal(np.asarray(out, dtype=np.int64), x8 << 8)


def test_flac_depth_ledger_corpus_verifies(spark):
    from jsonschema_spark.functions.audio import decode_payload
    from jsonschema_spark.sources.clips import synth_flac_depth_clips

    rows = synth_flac_depth_clips(spark, 18).collect()
    import hashlib as _hashlib

    torn = 0
    for r in rows:
        if r["_n_dec"] is None:
            torn += 1
            with pytest.raises(Exception):
                decode_payload(bytes(r["bytes"]))
        else:
            dec = decode_payload(bytes(r["bytes"]))
            got = _hashlib.md5(
                np.asarray(dec).astype("<i2").tobytes().hex().upper()
                .encode()
            ).hexdigest()
            assert got == r["_dec_md5"], r["_row_idx"]
    assert torn == 2  # class 5 of 9 (rows 5 and 14)


def test_multichannel_roundtrip_and_downmix():
    from jsonschema_spark.functions.audio import decode_payload

    base = _tone(6000)
    chans = [base, -base, base // 2, np.clip(base * 2, -32768, 32767)]
    mc = np.stack(chans, axis=1)
    raw = encode_flac(mc, 16000, lpc_max_order=8)
    _sr, dec = decode_flac(raw)
    assert np.array_equal(np.asarray(dec, dtype=np.int64), mc)
    # engine downmix: floor(sum / n) — stereo's (l+r)>>1 generalized
    want = np.floor_divide(mc.sum(axis=1), 4)
    out = decode_payload(raw)
    assert np.array_equal(np.asarray(out, dtype=np.int64), want)
    # torn multichannel still fails loudly
    with pytest.raises(ValueError):
        decode_flac(raw[:-7])


def test_multichannel_rejects_stereo_mode_and_9ch():
    base = _tone(600)
    mc = np.stack([base, base, base], axis=1)
    with pytest.raises(ValueError, match="stereo_mode"):
        encode_flac(mc, 16000, stereo_mode="mid_side")
    nine = np.stack([base] * 9, axis=1)
    with pytest.raises(ValueError, match="2..8"):
        encode_flac(nine, 16000)


def test_window_pcm_depth_and_multichannel_conventions():
    from jsonschema_spark.functions.audio import window_pcm_batch
    import pandas as pd

    base = _tone(8000)
    x24 = (base << 8) | 0x11
    raw24 = encode_flac(x24, 16000, bits=24)
    mc = np.stack([base, -base, base // 3], axis=1)
    rawmc = encode_flac(mc, 16000)
    out = window_pcm_batch(
        pd.Series([raw24, rawmc]),
        pd.Series([16000, 16000]),
        pd.Series([100, 100]),
        pd.Series([250, 250]),
    )
    w24 = np.frombuffer(out["out_bytes"][0], dtype="<i2").astype(np.int64)
    assert np.array_equal(w24, (x24 >> 8)[1600:5600])
    wmc = np.frombuffer(out["out_bytes"][1], dtype="<i2").astype(np.int64)
    assert np.array_equal(wmc, np.floor_divide(mc.sum(axis=1), 3)[1600:5600])


def test_flac_multichannel_ledger_corpus_verifies(spark):
    from jsonschema_spark.functions.audio import decode_payload
    from jsonschema_spark.sources.clips import (
        synth_flac_multichannel_clips,
    )

    rows = synth_flac_multichannel_clips(spark, 15).collect()
    import hashlib as _hashlib

    torn = 0
    for r in rows:
        if r["_n_dec"] is None:
            torn += 1
            with pytest.raises(Exception):
                decode_payload(bytes(r["bytes"]))
        else:
            dec = decode_payload(bytes(r["bytes"]))
            got = _hashlib.md5(
                np.asarray(dec).astype("<i2").tobytes().hex().upper()
                .encode()
            ).hexdigest()
            assert got == r["_dec_md5"], r["_row_idx"]
    assert torn == 3  # class 4 of 5


def test_depths_12_and_20_roundtrip_and_conventions():
    from jsonschema_spark.functions.audio import decode_payload

    base = _tone(6000)
    for bits, x in ((12, base >> 4), (20, base << 4 | 0x7)):
        for lmo in (0, 8):
            raw = encode_flac(x, 16000, bits=bits, lpc_max_order=lmo)
            _sr, dec = decode_flac(raw)
            assert np.array_equal(np.asarray(dec, dtype=np.int64), x), (
                bits, lmo,
            )
        st = np.stack([x, -x - 1], axis=1)
        raw = encode_flac(st, 16000, bits=bits, lpc_max_order=8)
        _sr, dec = decode_flac(raw)
        assert np.array_equal(np.asarray(dec, dtype=np.int64), st), bits
    # engine conventions: 12-bit scales up by 4 bits, 20-bit keeps top 16
    x12 = base >> 4
    out = decode_payload(encode_flac(x12, 16000, bits=12))
    assert np.array_equal(np.asarray(out, dtype=np.int64), x12 << 4)
    x20 = (base << 4) | 0x9
    out = decode_payload(encode_flac(x20, 16000, bits=20))
    assert np.array_equal(np.asarray(out, dtype=np.int64), x20 >> 4)


def test_depth_32_roundtrip_and_conventions():
    """32-bit closes the RFC 9639 sample-size table: full-scale samples
    (|v| up to 2^31), a 33-bit side channel under stereo decorrelation,
    the MD5 at 4-byte little-endian width, and the rice2 (5-bit
    parameter) residual method deep subframes require."""
    from jsonschema_spark.functions.audio import decode_payload

    base = _tone(6000)
    # full-scale 32-bit: the tone scaled near the int32 rails, noisy lows
    rng = np.random.RandomState(11)
    x = (base << 17) | rng.randint(0, 1 << 17, len(base)).astype(np.int64)
    assert int(np.abs(x).max()) > (1 << 30)  # genuinely beyond 24-bit
    for lmo in (0, 8):
        raw = encode_flac(x, 16000, bits=32, lpc_max_order=lmo)
        _sr, dec = decode_flac(raw)
        assert np.array_equal(np.asarray(dec, dtype=np.int64), x), lmo
    # int32 boundary values survive the round-trip exactly
    edge = np.array(
        [-(1 << 31), (1 << 31) - 1, 0, -1, 12345678], dtype=np.int64
    )
    _sr, dec = decode_flac(encode_flac(edge, 16000, bits=32))
    assert np.array_equal(np.asarray(dec, dtype=np.int64), edge)
    # stereo: every channel assignment's 33-bit side channel reconstructs
    st = np.stack([x, -x - 1], axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side", None):
        raw = encode_flac(st, 16000, bits=32, stereo_mode=mode,
                          lpc_max_order=8)
        _sr, dec = decode_flac(raw)
        assert np.array_equal(np.asarray(dec, dtype=np.int64), st), mode
    # MD5 covers 4-byte samples: a torn stream fails loudly
    raw = encode_flac(x, 16000, bits=32)
    with pytest.raises(ValueError):
        decode_flac(raw[:-5])
    # engine convention: 32-bit keeps the top 16 via arithmetic >> 16
    out = decode_payload(encode_flac(x, 16000, bits=32))
    assert np.array_equal(np.asarray(out, dtype=np.int64), x >> 16)
    # 33-bit range check still applies (samples exceeding 32-bit reject)
    with pytest.raises(ValueError, match="32-bit range"):
        encode_flac(np.array([1 << 31], dtype=np.int64), 16000, bits=32)
