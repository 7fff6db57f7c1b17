"""REAL FLAC codec (functions/flac.py) — RFC 9639 subset: fixed
predictors + partitioned Rice, CRC-8/CRC-16/STREAMINFO-MD5 integrity.

FLAC is lossless, so decode(encode(pcm)) == pcm bit-for-bit IS the
complete correctness oracle; the corruption tests pin that the stream's
own integrity chain fails loudly (never silent partial audio)."""

import hashlib

import numpy as np
import pytest

from jsonschema_spark.functions.audio import (
    decode_payload,
    pcm16_from_float,
    reference_signal,
)
from jsonschema_spark.functions.flac import _crc8, _crc16, decode_flac, encode_flac


def test_crc_check_values():
    # published check values: CRC-8 poly 0x07 init 0 -> 0xF4;
    # CRC-16/BUYPASS poly 0x8005 init 0 no-reflect -> 0xFEE8
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("n", [1, 2, 5, 100, 4095, 4096, 4097, 14400])
def test_roundtrip_bit_exact(n):
    rng = np.random.RandomState(n)
    pcm = rng.randint(-32768, 32768, size=n).astype(np.int16)
    sr, out = decode_flac(encode_flac(pcm, 16000))
    assert sr == 16000
    assert np.array_equal(out.astype(np.int16), pcm)


def test_roundtrip_reference_signal_and_ratio():
    pcm = pcm16_from_float(reference_signal("clip-flac", 14400))
    raw = encode_flac(pcm, 16000)
    sr, out = decode_flac(raw)
    assert np.array_equal(out.astype(np.int16), pcm)
    # tonal reference signal must actually compress (fixed predictors work)
    assert len(raw) < 2 * len(pcm)


def test_constant_and_extreme_blocks():
    # all-constant block -> CONSTANT subframe; int16 extremes stay exact
    for v in (0, 1, -1, 32767, -32768):
        pcm = np.full(5000, v, dtype=np.int16)
        raw = encode_flac(pcm, 8000)
        sr, out = decode_flac(raw)
        assert np.array_equal(out.astype(np.int16), pcm), v
    # constant signal is tiny (header + per-frame constant subframes)
    assert len(encode_flac(np.zeros(8192, dtype=np.int16), 8000)) < 200


def test_multibyte_utf8_frame_numbers():
    # >=128 frames forces multi-byte UTF-8 coded frame numbers
    rng = np.random.RandomState(3)
    pcm = rng.randint(-2000, 2000, size=200 * 64).astype(np.int16)
    sr, out = decode_flac(encode_flac(pcm, 16000, blocksize=64))
    assert np.array_equal(out.astype(np.int16), pcm)


def test_decode_payload_dispatch():
    # the "fLaC" magic routes decode_payload to the real codec, while the
    # legacy synthetic container ("fLaC0") still takes the delta path
    pcm = pcm16_from_float(reference_signal("clip-dispatch", 3000))
    out = decode_payload(encode_flac(pcm, 16000))
    assert np.array_equal(np.asarray(out, dtype=np.int64),
                          pcm.astype(np.int64))


def test_streaminfo_md5_matches_source():
    pcm = pcm16_from_float(reference_signal("clip-md5", 2500))
    raw = encode_flac(pcm, 16000)
    # bytes 8..42 = STREAMINFO (34 bytes); last 16 are the PCM MD5
    assert raw[26:42] == hashlib.md5(pcm.astype("<i2").tobytes()).digest()


def test_corruption_raises_loudly():
    pcm = pcm16_from_float(reference_signal("clip-corrupt", 9000))
    raw = encode_flac(pcm, 16000)
    with pytest.raises(ValueError):
        decode_flac(raw[:-30])  # torn upload
    with pytest.raises(ValueError):
        decode_flac(raw[: len(raw) // 2])  # mid-frame cut
    flipped = bytearray(raw)
    flipped[len(raw) // 2] ^= 0x10  # mid-stream bit flip
    with pytest.raises(ValueError):
        decode_flac(bytes(flipped))
    with pytest.raises(ValueError):
        decode_flac(b"OggS" + raw[4:])  # wrong marker


def test_subset_bounds_rejected():
    with pytest.raises(ValueError):
        encode_flac(np.array([], dtype=np.int16), 16000)
    with pytest.raises(ValueError):
        encode_flac(np.array([40000], dtype=np.int64), 16000)


# ---------------------------------------------------------------- stereo --
def _stereo_signal(n: int, seed: int = 7) -> np.ndarray:
    """Correlated stereo test signal (decorrelation must actually win)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    l = (6000 * np.sin(t / 23.0) + rng.randint(-300, 300, n)).astype(np.int64)
    r = (l * 0.8).astype(np.int64) + rng.randint(-500, 500, n)
    return np.clip(np.stack([l, r], axis=1), -32768, 32767).astype(np.int16)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side", None]
)
def test_stereo_roundtrip_all_assignments(mode):
    st = _stereo_signal(9000)
    raw = encode_flac(st, 16000, stereo_mode=mode)
    sr, out = decode_flac(raw)
    assert sr == 16000 and out.shape == (9000, 2)
    assert np.array_equal(out, st.astype(np.int32))


def test_stereo_17bit_side_extremes():
    # l=32767, r=-32768 -> side = 65535 needs the full 17-bit channel
    alt = np.tile(
        np.array([[32767, -32768], [-32768, 32767]], dtype=np.int16),
        (3000, 1),
    )
    for mode in ("left_side", "right_side", "mid_side"):
        sr, out = decode_flac(encode_flac(alt, 8000, stereo_mode=mode))
        assert np.array_equal(out, alt.astype(np.int32)), mode


def test_stereo_midside_parity_reconstruction():
    # odd l+r exercises the (mid<<1)|(side&1) parity-restore path
    st = np.array([[3, 2], [2, 3], [-5, 2], [1, -2]] * 700, dtype=np.int16)
    sr, out = decode_flac(encode_flac(st, 8000, stereo_mode="mid_side"))
    assert np.array_equal(out, st.astype(np.int32))


def test_stereo_decorrelation_beats_independent():
    # highly correlated channels: a side-coded stream must be smaller
    st = _stereo_signal(16000)
    indep = len(encode_flac(st, 16000, stereo_mode="independent"))
    auto = len(encode_flac(st, 16000))
    assert auto < indep


def test_stereo_md5_is_interleaved_and_checked():
    st = _stereo_signal(2500)
    raw = encode_flac(st, 16000)
    # spec: MD5 over the channel-interleaved little-endian sample stream
    assert raw[26:42] == hashlib.md5(st.astype("<i2").tobytes()).digest()
    flipped = bytearray(raw)
    flipped[len(raw) // 2] ^= 0x04
    with pytest.raises(ValueError):
        decode_flac(bytes(flipped))


def test_stereo_decode_payload_downmixes():
    # engine convention: stereo -> mono via exact (l+r)>>1 (downmix_batch)
    st = _stereo_signal(3000)
    out = decode_payload(encode_flac(st, 16000))
    want = (st[:, 0].astype(np.int64) + st[:, 1].astype(np.int64)) >> 1
    assert out.ndim == 1
    assert np.array_equal(np.asarray(out, dtype=np.int64), want)


def test_stereo_rejects_bad_shapes():
    # (n, 3) became VALID with multichannel support; 9 channels is the
    # spec bound
    with pytest.raises(ValueError):
        encode_flac(np.zeros((10, 9), dtype=np.int16), 16000)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((0, 2), dtype=np.int16), 16000)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((10, 2), dtype=np.int16), 16000,
                    stereo_mode="joint")


def test_synth_flac_stereo_ledger(spark):
    from jsonschema_spark.sources.clips import (
        FLAC_CLASS_MOD,
        FLAC_FLIP_CLS,
        FLAC_TRUNC_CLS,
        synth_flac_stereo_clips,
    )

    rows = synth_flac_stereo_clips(spark, 29).collect()
    assert len(rows) == 29
    n_bad = 0
    for r in rows:
        cls = r["_row_idx"] % FLAC_CLASS_MOD
        if cls in (FLAC_TRUNC_CLS, FLAC_FLIP_CLS):
            n_bad += 1
            assert r["_dec_md5"] is None
            with pytest.raises(ValueError):
                decode_payload(bytes(r["bytes"]))
        else:
            dec = decode_payload(bytes(r["bytes"]))  # decodes + downmixes
            assert len(dec) == r["_n_dec"]
            got = hashlib.md5(
                np.asarray(dec, dtype="<i2").tobytes().hex().upper().encode()
            ).hexdigest()
            assert got == r["_dec_md5"]
    assert n_bad > 0


def test_synth_flac_ledger(spark):
    from jsonschema_spark.sources.clips import (
        FLAC_CLASS_MOD,
        FLAC_FLIP_CLS,
        FLAC_TRUNC_CLS,
        synth_flac_clips,
    )

    rows = synth_flac_clips(spark, 29).collect()
    assert len(rows) == 29
    n_bad = 0
    for r in rows:
        cls = r["_row_idx"] % FLAC_CLASS_MOD
        if cls in (FLAC_TRUNC_CLS, FLAC_FLIP_CLS):
            n_bad += 1
            assert r["_dec_md5"] is None
            with pytest.raises(ValueError):
                decode_payload(bytes(r["bytes"]))
        else:
            dec = decode_payload(bytes(r["bytes"]))
            assert len(dec) == r["_n_dec"]
            # lossless: decoded PCM fingerprint == SOURCE-sample ledger md5
            got = hashlib.md5(
                np.asarray(dec, dtype="<i2").tobytes().hex().upper().encode()
            ).hexdigest()
            assert got == r["_dec_md5"]
    assert n_bad > 0


# ------------------------------------------------- vectorized kernels --
def test_vectorized_residual_writer_bit_identical():
    """The numpy Rice writer must produce the EXACT bytes of the per-
    sample reference loop, from any bit alignment."""
    from jsonschema_spark.functions.flac import (
        _BitWriter,
        _write_residual,
        _write_residual_scalar,
    )

    rng = np.random.RandomState(5)
    for trial in range(25):
        n = rng.randint(1, 5000)
        scale = int(rng.choice([1, 10, 1000, 30000]))
        res = rng.randint(-scale, scale + 1, n).astype(np.int64)
        pre = rng.randint(0, 17)
        w1, w2 = _BitWriter(), _BitWriter()
        for w in (w1, w2):
            w.write(0x2B, 6)
            w.write(0, pre)
        _write_residual(w1, res)
        _write_residual_scalar(w2, res)
        w1.align(), w2.align()
        assert w1.bytes() == w2.bytes(), trial


def test_vectorized_residual_reader_bit_identical():
    """The windowed numpy Rice reader must decode the same values AND
    leave the reader at the same bit position as the per-bit loop."""
    from jsonschema_spark.functions.flac import (
        _BitReader,
        _BitWriter,
        _read_residual,
        _read_residual_scalar,
        _write_residual,
    )

    rng = np.random.RandomState(9)
    for trial in range(25):
        n = rng.randint(1, 5000)
        scale = int(rng.choice([1, 10, 1000, 30000]))
        res = rng.randint(-scale, scale + 1, n).astype(np.int64)
        order = rng.randint(0, min(5, n))
        w = _BitWriter()
        pre = rng.randint(0, 17)
        w.write(0, pre)
        sb, sbit = len(w.buf), w.nbits
        _write_residual(w, res[order:] if order else res)
        w.align()
        data = w.bytes()
        r1, r2 = _BitReader(data), _BitReader(data)
        r1.byte, r1.bit = sb, sbit
        r2.byte, r2.bit = sb, sbit
        a = _read_residual(r1, n, order)
        b = _read_residual_scalar(r2, n, order)
        assert np.array_equal(a, b), trial
        assert (r1.byte, r1.bit) == (r2.byte, r2.bit), trial


def test_vectorized_fixed_restore_matches_recurrence():
    from jsonschema_spark.functions.flac import (
        _fixed_restore,
        _fixed_restore_scalar,
    )

    rng = np.random.RandomState(3)
    for trial in range(40):
        order = rng.randint(0, 5)
        n = rng.randint(0, 800)
        res = rng.randint(-100000, 100000, n).astype(np.int64)
        warm = [int(v) for v in rng.randint(-32768, 32768, order)]
        assert np.array_equal(
            _fixed_restore(res, warm, order),
            _fixed_restore_scalar(res, warm, order),
        ), (trial, order)
