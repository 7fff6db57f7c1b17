"""AIFF / AIFF-C and Sun AU container codecs (functions/audio.py).

Both are REAL interchange formats; the stdlib still ships independent
implementations on this interpreter (``aifc`` / ``sunau``, Python 3.11),
so every round-trip here is cross-validated against a reference codec
we did not write — our encoder's output must parse in the stdlib reader
with identical samples, and stdlib-written files must decode through
``decode_payload`` to the engine's exact integer conventions (24-bit
keeps the top 16 via arithmetic >>8, signed 8-bit scales <<8, stereo
downmixes (l+r)>>1).
"""

import io
import warnings

import numpy as np
import pytest

from jsonschema_spark.functions.audio import (
    alaw_decode,
    alaw_encode,
    decode_payload,
    encode_aiff,
    encode_au,
    ulaw_decode,
    ulaw_encode,
)

warnings.filterwarnings("ignore", category=DeprecationWarning)


def _tone(n, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=np.float64)
    x = 9000 * np.sin(2 * np.pi * 440 * t / 16000) + rng.randint(
        -2000, 2000, n
    )
    return np.clip(np.round(x), -32768, 32767).astype(np.int64)


def test_aiff_roundtrips_all_depths_and_channels():
    x = _tone(5000)
    st = np.stack([x, -x - 1], axis=1)
    assert np.array_equal(decode_payload(encode_aiff(x, 16000)), x)
    assert np.array_equal(
        decode_payload(encode_aiff(st, 16000)), (st[:, 0] + st[:, 1]) >> 1
    )
    x8 = x >> 8  # AIFF 8-bit is SIGNED (unlike WAV offset-binary)
    assert np.array_equal(
        decode_payload(encode_aiff(x8, 16000, bits=8)), x8 << 8
    )
    x24 = (x << 8) | np.random.RandomState(3).randint(0, 256, len(x))
    assert np.array_equal(
        decode_payload(encode_aiff(x24, 16000, bits=24)), x24 >> 8
    )
    st24 = np.stack([x24, (-x) << 8], axis=1)
    assert np.array_equal(
        decode_payload(encode_aiff(st24, 16000, bits=24)),
        ((st24[:, 0] + st24[:, 1]) >> 1) >> 8,
    )


def test_aifc_none_and_sowt():
    x = _tone(4000, seed=1)
    st = np.stack([x, x >> 1], axis=1)
    assert np.array_equal(
        decode_payload(encode_aiff(x, 16000, compression="NONE")), x
    )
    assert np.array_equal(
        decode_payload(encode_aiff(st, 16000, compression="sowt")),
        (st[:, 0] + st[:, 1]) >> 1,
    )
    with pytest.raises(ValueError, match="sowt is 16-bit"):
        encode_aiff(x >> 8, 16000, bits=8, compression="sowt")


def test_aiff_cross_validates_against_stdlib_aifc():
    aifc = pytest.importorskip("aifc")
    x = _tone(3000, seed=2)
    st = np.stack([x, -x - 1], axis=1)
    # ours -> stdlib: frames parse identically (incl. sowt byte-swap,
    # which aifc un-swaps back to big-endian frames)
    for comp, arr in ((None, x), (None, st), ("NONE", x), ("sowt", st)):
        f = aifc.open(io.BytesIO(encode_aiff(arr, 16000, compression=comp)))
        assert f.getframerate() == 16000
        assert f.getnchannels() == (1 if arr.ndim == 1 else 2)
        got = np.frombuffer(
            f.readframes(f.getnframes()), dtype=">i2"
        ).astype(np.int64)
        assert np.array_equal(got, arr.reshape(-1)), comp
    # stdlib -> ours (aifc writes the header on close; keep the buffer)
    buf = io.BytesIO()
    buf.close = lambda: None  # type: ignore[method-assign]
    w = aifc.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.writeframes(st.reshape(-1).astype(">i2").tobytes())
    w.close()
    assert np.array_equal(
        decode_payload(buf.getvalue()), (st[:, 0] + st[:, 1]) >> 1
    )


def test_au_roundtrips_and_g711():
    x = _tone(5000, seed=4)
    st = np.stack([x, -x - 1], axis=1)
    assert np.array_equal(decode_payload(encode_au(x, 16000)), x)
    assert np.array_equal(
        decode_payload(encode_au(st, 16000)), (st[:, 0] + st[:, 1]) >> 1
    )
    x24 = (x << 8) | 0x5A
    assert np.array_equal(
        decode_payload(encode_au(x24, 16000, encoding="pcm24")), x24 >> 8
    )
    x8 = x >> 8  # AU 8-bit PCM is SIGNED
    assert np.array_equal(
        decode_payload(encode_au(x8, 16000, encoding="pcm8")), x8 << 8
    )
    # G.711 payloads route through the bit-exact engine kernels
    assert np.array_equal(
        decode_payload(encode_au(x, 16000, encoding="ulaw")),
        ulaw_decode(ulaw_encode(x.astype(np.int16))),
    )
    assert np.array_equal(
        decode_payload(encode_au(x, 16000, encoding="alaw")),
        alaw_decode(alaw_encode(x.astype(np.int16))),
    )


def test_au_cross_validates_against_stdlib_sunau():
    sunau = pytest.importorskip("sunau")
    x = _tone(2500, seed=5)
    # ours -> stdlib
    f = sunau.open(io.BytesIO(encode_au(x, 16000)))
    assert f.getframerate() == 16000 and f.getnchannels() == 1
    got = np.frombuffer(f.readframes(f.getnframes()), dtype=">i2")
    assert np.array_equal(got.astype(np.int64), x)
    # stdlib -> ours (sunau DEFAULTS to ULAW — pin the PCM comptype)
    buf = io.BytesIO()
    buf.close = lambda: None  # type: ignore[method-assign]
    w = sunau.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.setcomptype("NONE", "")
    w.writeframes(x.astype(">i2").tobytes())
    w.close()
    assert np.array_equal(decode_payload(buf.getvalue()), x)


def test_container_ledger_corpus_verifies(spark):
    import hashlib as _hashlib

    from jsonschema_spark.sources.clips import synth_container_clips

    rows = synth_container_clips(spark, 18).collect()
    torn = 0
    codecs = set()
    for r in rows:
        codecs.add(r["codec"])
        if r["_n_dec"] is None:
            torn += 1
            with pytest.raises(Exception):
                decode_payload(bytes(r["bytes"]))
        else:
            dec = decode_payload(bytes(r["bytes"]))
            assert len(dec) == r["_n_dec"], r["_row_idx"]
            got = _hashlib.md5(
                np.asarray(dec).astype("<i2").tobytes().hex().upper()
                .encode()
            ).hexdigest()
            assert got == r["_dec_md5"], r["_row_idx"]
    assert torn == 2  # class 8 of 9 (rows 8 and 17)
    assert codecs == {"aiff", "aifc", "au"}


def test_malformed_containers_fail_loudly():
    x = _tone(1000, seed=6)
    raw = encode_aiff(x, 16000)
    with pytest.raises(ValueError):
        decode_payload(raw[:40])  # COMM torn
    with pytest.raises(ValueError):
        decode_payload(raw[:-200])  # SSND shorter than COMM frames
    au = encode_au(x, 16000)
    with pytest.raises(ValueError):
        decode_payload(au[:-100])  # data shorter than header size
    with pytest.raises(ValueError, match="unsupported AU"):
        decode_payload(au[:12] + (99).to_bytes(4, "big") + au[16:])
    with pytest.raises(ValueError, match="range"):
        encode_aiff(x, 16000, bits=8)
    with pytest.raises(ValueError, match="range"):
        encode_au(x, 16000, encoding="pcm8")
