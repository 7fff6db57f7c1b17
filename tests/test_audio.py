"""Audio codec round-trip + SNR invariant + clips-source determinism."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import (
    SNR_THRESHOLD_DB,
    audio_snr,
    audio_snr_ok,
    decode_payload,
    decode_pcm_batch,
    encode_payload,
    pcm16_from_float,
    reference_signal,
    snr_db,
)
from jsonschema_spark.operators.validate import validate
from jsonschema_spark.plans.compile import CompileOptions
from jsonschema_spark.schema import Schema
from jsonschema_spark.sources.clips import clips_schema, synth_clips, transcript_for


def test_codec_round_trip_lossless():
    sig = pcm16_from_float(reference_signal("clip-000000000001", 4000))
    for codec in ("pcm_s16le", "flac"):
        dec = decode_payload(encode_payload(sig, codec))
        assert np.array_equal(dec, sig.astype(np.int32)), codec


def test_opus_lossy_but_above_threshold():
    sig = pcm16_from_float(reference_signal("clip-000000000002", 4000))
    dec = decode_payload(encode_payload(sig, "opus"))
    s = snr_db(sig.astype(np.int32), dec)
    assert SNR_THRESHOLD_DB < s < 80.0


def test_snr_batch_kernel():
    cid = "clip-000000000003"
    n = 8000
    sig16 = pcm16_from_float(reference_signal(cid, n))
    good = encode_payload(sig16, "flac")
    noisy = pcm16_from_float(
        reference_signal(cid, n) + 0.5 * np.sin(np.arange(n) * 0.3)
    ).tobytes()
    out = decode_pcm_batch(
        pd.Series([good, noisy, None]),
        pd.Series([cid, cid, cid]),
        pd.Series([16000, 16000, 16000]),
        pd.Series([500, 500, 500]),
    )
    assert out[0] > SNR_THRESHOLD_DB
    assert out[1] < SNR_THRESHOLD_DB
    assert np.isnan(out[2])


def test_reference_signal_deterministic():
    a = reference_signal("clip-000000000042", 1000)
    b = reference_signal("clip-000000000042", 1000)
    c = reference_signal("clip-000000000043", 1000)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


@pytest.fixture(scope="module")
def clips(spark):
    return synth_clips(spark, 1500, partitions=4).cache()


def test_clips_deterministic(spark, clips):
    again = synth_clips(spark, 1500, partitions=2)  # different partitioning
    a = sorted(clips.select("clip_id", "sr_hz", "dur_ms", "codec").collect())
    b = sorted(again.select("clip_id", "sr_hz", "dur_ms", "codec").collect())
    assert a == b


def test_planted_violation_rates(clips):
    n = clips.count()
    assert n == 1500
    dup = clips.groupBy("clip_id").count().filter("count > 1").count()
    assert dup == len([i for i in range(1500) if i % 199 == 198 and i > 0])
    bad_sr = clips.filter(~F.col("sr_hz").isin(8000, 16000, 22050, 44100, 48000)).count()
    assert bad_sr == len([i for i in range(1500) if i % 97 == 96])
    bad_codec = clips.filter(~F.col("codec").isin("pcm_s16le", "flac", "opus")).count()
    assert bad_codec == len([i for i in range(1500) if i % 103 == 102])


def test_audio_snr_column(clips):
    flagged = clips.withColumn("snr", audio_snr()).withColumn(
        "ok", audio_snr_ok()
    )
    bad = flagged.filter(~F.col("ok")).select("clip_id").collect()
    expected = {f"clip-{i:012d}" for i in range(1500) if i % 109 == 108}
    # duplicates replace the id of i%199==198 rows but never land on i%109==108
    assert {r.clip_id for r in bad} == expected


def test_transcript_invariant(clips):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def ref_transcript(cid: pd.Series) -> pd.Series:
        return cid.map(transcript_for)

    mismatch = clips.filter(
        (F.length("transcript") > 0) & (F.col("transcript") != ref_transcript("clip_id"))
    ).count()
    expected = len([i for i in range(1500) if i % 211 == 210 and i % 107 != 106])
    assert mismatch == expected


def test_full_clips_validation_with_content_check(clips):
    opts = CompileOptions(content_checks={"audio/*": lambda col: audio_snr_ok()})
    res = validate(clips, Schema.from_value(clips_schema()), options=opts)
    v = res.violations(["clip_id"])
    by_kw = {r["keyword"]: r["count"] for r in v.groupBy("keyword").count().collect()}
    assert by_kw.get("enum", 0) > 0  # sr_hz + codec
    assert by_kw.get("minLength", 0) > 0  # empty transcripts
    assert by_kw.get("contentMediaType", 0) > 0  # corrupted payloads
    assert (by_kw.get("minimum", 0) + by_kw.get("maximum", 0)) > 0  # dur_ms
    totals = res.totals().collect()[0]
    assert totals.rows == 1500
    assert totals.failed == v.select("clip_id").distinct().count()


def test_transcript_ok_invariant(clips):
    from jsonschema_spark.functions.audio import transcript_ok

    bad = clips.filter(~transcript_ok()).select("clip_id", "transcript").collect()
    # planted: i%211==210 appended noise; i%107==106 emptied the transcript
    # (empty -> minLength's job, but "" != reference so it fails here too)
    expected = {
        f"clip-{i:012d}" for i in range(1500) if i % 211 == 210 or i % 107 == 106
    }
    assert {r.clip_id for r in bad} == expected


def test_wav_riff_real_decode_round_trip():
    """RIFF/WAVE PCM16 mono is decoded for REAL (chunk walk, fmt checks) —
    a user with actual .wav payloads gets correct PCM, not a stub."""
    import numpy as np
    import pytest as _pytest

    from jsonschema_spark.functions.audio import (
        decode_payload,
        encode_wav_pcm16,
        pcm16_from_float,
        reference_signal,
        snr_db,
    )

    pcm = pcm16_from_float(reference_signal("clip-000000000042", 1600))
    wav = encode_wav_pcm16(pcm, 16000)
    dec = decode_payload(wav)
    np.testing.assert_array_equal(dec, pcm.astype(np.int32))
    assert snr_db(pcm.astype(np.int32), dec) == float("inf")

    # stereo PCM16 now DOWNMIXES ((l+r)>>1 — the multi-depth WAV family);
    # genuinely unsupported layouts (3 channels, unknown format) still
    # fail loudly (ValueError -> decode-failure row)
    import struct

    st = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(st)) + st
    body += b"data" + struct.pack("<I", 8) + struct.pack("<hhhh", 10, 20, -7, 3)
    mixed = decode_payload(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert list(mixed) == [(10 + 20) >> 1, (-7 + 3) >> 1]
    for fmt_ch in ((1, 3), (99, 1)):
        bad_fmt = struct.pack("<HHIIHH", fmt_ch[0], fmt_ch[1], 16000,
                              64000, 4, 16)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
        body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
        with _pytest.raises(ValueError):
            decode_payload(b"RIFF" + struct.pack("<I", len(body)) + body)

    # truncated fmt chunk (declared 16 bytes, fewer present) must surface
    # as a decode failure (ValueError), NOT struct.error crashing the task
    trunc = (b"RIFF" + struct.pack("<I", 30) + b"WAVE"
             + b"fmt " + struct.pack("<I", 16) + b"\x01\x00" * 5)
    with _pytest.raises(ValueError):
        decode_payload(trunc)
    # and through the batch kernel it becomes SNR = -inf, not an exception
    import pandas as pd

    from jsonschema_spark.functions.audio import decode_pcm_batch

    snr = decode_pcm_batch(
        pd.Series([trunc]), pd.Series(["clip-000000000001"]),
        pd.Series([16000]), pd.Series([400]),
    )
    assert snr[0] == float("-inf")


# ---------------------------------------------------------------------------
# G.711 mu-law (real lossy codec)
# ---------------------------------------------------------------------------


def _ulaw_encode_scalar(s):
    """Independent scalar reference (straight from the G.711 spec)."""
    BIAS, CLIP = 0x84, 32635
    sign = 0x80 if s < 0 else 0
    mag = min(abs(s), CLIP) + BIAS
    seg = 0
    for bound in (0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF):
        if mag > bound:
            seg += 1
    seg = min(seg, 7)
    man = (mag >> (seg + 3)) & 0x0F
    return ~(sign | (seg << 4) | man) & 0xFF


def _ulaw_decode_scalar(b):
    u = (~b) & 0xFF
    sign, seg, man = u & 0x80, (u >> 4) & 0x07, u & 0x0F
    mag = (((man << 3) + 0x84) << seg) - 0x84
    return -mag if sign else mag


def test_ulaw_matches_scalar_reference_everywhere():
    import numpy as np

    from jsonschema_spark.functions.audio import ulaw_decode, ulaw_encode

    # every 16-bit input value vs the scalar spec implementation
    xs = np.arange(-32768, 32768, dtype=np.int16)
    enc = ulaw_encode(xs)
    ref = np.array([_ulaw_encode_scalar(int(s)) for s in
                    range(-32768, 32768, 257)], dtype=np.uint8)
    assert (enc[::257] == ref).all()
    # every byte decodes to the spec value
    bs = np.arange(256, dtype=np.uint8)
    dec = ulaw_decode(bs)
    assert all(int(dec[b]) == _ulaw_decode_scalar(b) for b in range(256))
    # VALUE-level idempotence at the quantization points (byte-level
    # idempotence fails only for the spec's negative-zero alias 0x7F/0xFF)
    again = ulaw_decode(ulaw_encode(dec.astype(np.int16)))
    assert (again == dec).all()


def test_ulaw_wav_roundtrip_passes_snr_gate():
    import numpy as np

    from jsonschema_spark.functions.audio import (
        decode_payload,
        encode_wav_ulaw,
        pcm16_from_float,
        reference_signal,
        snr_db,
    )

    pcm = pcm16_from_float(reference_signal("clip-ulaw", 16000))
    raw = encode_wav_ulaw(pcm, 16000)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    dec = decode_payload(raw)
    assert len(dec) == len(pcm)
    s = snr_db(pcm.astype(np.int32), dec)
    # mu-law companding: ~38 dB on program material — above the 30 dB gate
    assert 30.0 < s < 45.0


def test_ulaw_ledger_margins_and_decode_profile():
    """Differential replay of the mu-law ledger corpus at small n: the
    clean/corrupt SNR populations must straddle the 15 dB query gate with
    >10 dB margin on both sides, and dec_md5 must equal an independently
    computed md5 over the scalar-lookup decode."""
    import hashlib

    import numpy as np
    import pandas as pd

    from jsonschema_spark.functions.audio import (
        decode_profile_batch,
        encode_wav_ulaw,
        pcm16_from_float,
        reference_signal,
    )
    from jsonschema_spark.sources.clips import (
        ULAW_CLASS_MOD,
        ULAW_CLS_CORRUPT,
        ULAW_SR_HZ,
        _hash,
    )

    log_lo, log_hi = np.log(200), np.log(2000)
    payloads, cids, srs, durs, is_corrupt = [], [], [], [], []
    for i in range(90):
        h = _hash(i)
        u = ((h >> 16) % 1_000_000) / 1_000_000.0
        dur = int(np.exp(log_lo + u * (log_hi - log_lo)))
        cid = f"clip-{i:012d}"
        ns = ULAW_SR_HZ * dur // 1000
        pcm = pcm16_from_float(reference_signal(cid, ns))
        payload = encode_wav_ulaw(pcm, ULAW_SR_HZ)
        corrupt = i % ULAW_CLASS_MOD == ULAW_CLS_CORRUPT
        if corrupt:
            ba = bytearray(payload)
            ba[44 : 44 + ns // 2] = b"\x00" * (ns // 2)
            payload = bytes(ba)
        payloads.append(payload)
        cids.append(cid)
        srs.append(ULAW_SR_HZ)
        durs.append(dur)
        is_corrupt.append(corrupt)

    prof = decode_profile_batch(
        pd.Series(payloads), pd.Series(cids), pd.Series(srs), pd.Series(durs)
    )
    clean = prof["snr"][~pd.Series(is_corrupt)]
    corrupt = prof["snr"][pd.Series(is_corrupt)]
    assert clean.min() > 25.0  # gate 15 + >10 dB margin
    assert corrupt.max() < 5.0

    # independent decode: scalar lookup table over the data bytes
    lut = np.array([_ulaw_decode_scalar(b) for b in range(256)], dtype=np.int16)
    for k in (0, 4, 7):  # one clean, the corrupt class, one more clean
        dec = lut[np.frombuffer(payloads[k][44:], dtype=np.uint8)]
        want = hashlib.md5(
            dec.astype("<i2").tobytes().hex().upper().encode()
        ).hexdigest()
        assert prof["dec_md5"][k] == want
        assert int(prof["n_samples"][k]) == len(payloads[k]) - 44

# ---------------------------------------------------------------------------
# G.711 A-law (second real lossy codec)
# ---------------------------------------------------------------------------


_ALAW_SEG_SCALAR = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def _alaw_encode_scalar(s):
    """Independent scalar reference (Sun public-domain linear2alaw)."""
    p = s >> 3
    if p >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        p = -p - 1
    seg = 8
    for i, bound in enumerate(_ALAW_SEG_SCALAR):
        if p <= bound:
            seg = i
            break
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (p >> 1) & 0x0F if seg < 2 else (p >> seg) & 0x0F
    return aval ^ mask


def _alaw_decode_scalar(b):
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_alaw_matches_scalar_reference_everywhere():
    import numpy as np

    from jsonschema_spark.functions.audio import alaw_decode, alaw_encode

    # every 16-bit input value vs the scalar spec implementation
    xs = np.arange(-32768, 32768, dtype=np.int16)
    enc = alaw_encode(xs)
    ref = np.array(
        [_alaw_encode_scalar(int(s)) for s in range(-32768, 32768)],
        dtype=np.uint8,
    )
    assert (enc == ref).all()
    # every byte decodes to the spec value
    bs = np.arange(256, dtype=np.uint8)
    dec = alaw_decode(bs)
    assert all(int(dec[b]) == _alaw_decode_scalar(b) for b in range(256))
    # byte-level idempotence at the quantization points (A-law has no
    # negative-zero alias, unlike mu-law: decode is injective per byte)
    again = alaw_decode(alaw_encode(dec.astype(np.int16)))
    assert (again == dec).all()


def test_alaw_wav_roundtrip_passes_default_snr_gate():
    import numpy as np

    from jsonschema_spark.functions.audio import (
        SNR_THRESHOLD_DB,
        decode_payload,
        encode_wav_alaw,
        pcm16_from_float,
        reference_signal,
        snr_db,
    )

    pcm = pcm16_from_float(reference_signal("clip-alaw", 16000))
    raw = encode_wav_alaw(pcm, 16000)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    dec = decode_payload(raw)
    assert len(dec) == len(pcm)
    s = snr_db(pcm.astype(np.int32), dec)
    # A-law companding: ~38 dB on program material — above the DEFAULT gate
    assert SNR_THRESHOLD_DB < s < 45.0


def test_alaw_ledger_margins_and_decode_profile():
    """Differential replay of the A-law ledger corpus at small n: the
    clean/corrupt SNR populations must straddle the default 30 dB gate
    (clean min 35.9 dB / corrupt max 2.6 dB over the full 600-row corpus),
    and dec_md5 must equal an independently computed md5 over the
    scalar-lookup decode."""
    import hashlib

    import numpy as np
    import pandas as pd

    from jsonschema_spark.functions.audio import (
        decode_profile_batch,
        encode_wav_alaw,
        pcm16_from_float,
        reference_signal,
    )
    from jsonschema_spark.sources.clips import (
        ALAW_CLASS_MOD,
        ALAW_CLS_CORRUPT,
        ALAW_SR_HZ,
        _hash,
    )

    log_lo, log_hi = np.log(200), np.log(2000)
    payloads, cids, srs, durs, is_corrupt = [], [], [], [], []
    for i in range(90):
        h = _hash(i)
        u = ((h >> 16) % 1_000_000) / 1_000_000.0
        dur = int(np.exp(log_lo + u * (log_hi - log_lo)))
        cid = f"clip-{i:012d}"
        ns = ALAW_SR_HZ * dur // 1000
        pcm = pcm16_from_float(reference_signal(cid, ns))
        payload = encode_wav_alaw(pcm, ALAW_SR_HZ)
        corrupt = i % ALAW_CLASS_MOD == ALAW_CLS_CORRUPT
        if corrupt:
            ba = bytearray(payload)
            ba[44 : 44 + ns // 2] = b"\x00" * (ns // 2)
            payload = bytes(ba)
        payloads.append(payload)
        cids.append(cid)
        srs.append(ALAW_SR_HZ)
        durs.append(dur)
        is_corrupt.append(corrupt)

    prof = decode_profile_batch(
        pd.Series(payloads), pd.Series(cids), pd.Series(srs), pd.Series(durs)
    )
    clean = prof["snr"][~pd.Series(is_corrupt)]
    corrupt = prof["snr"][pd.Series(is_corrupt)]
    assert clean.min() > 30.0  # the DEFAULT engine gate holds for A-law
    assert corrupt.max() < 5.0

    # independent decode: scalar lookup table over the data bytes
    lut = np.array([_alaw_decode_scalar(b) for b in range(256)], dtype=np.int16)
    for k in (0, 4, 7):  # one clean, the corrupt class, one more clean
        dec = lut[np.frombuffer(payloads[k][44:], dtype=np.uint8)]
        want = hashlib.md5(
            dec.astype("<i2").tobytes().hex().upper().encode()
        ).hexdigest()
        assert prof["dec_md5"][k] == want
        assert int(prof["n_samples"][k]) == len(payloads[k]) - 44

# ---------------------------------------------------------------------------
# Stereo WAV + channel downmix
# ---------------------------------------------------------------------------


def test_stereo_wav_downmix_kernel():
    import numpy as np
    import pandas as pd

    from jsonschema_spark.functions.audio import (
        decode_payload,
        downmix_batch,
        encode_wav_pcm16,
        encode_wav_pcm16_stereo,
    )

    rng = np.random.RandomState(3)
    left = rng.randint(-32768, 32768, 500).astype("<i2")
    right = rng.randint(-32768, 32768, 500).astype("<i2")
    wav = encode_wav_pcm16_stereo(left, right, 16000)
    mono_wav = encode_wav_pcm16(left, 16000)
    out = downmix_batch(pd.Series([wav, mono_wav, None, left.tobytes()]))
    # stereo: exact floor((l+r)/2) per sample
    got = np.frombuffer(out["out_bytes"][0], dtype="<i2")
    exp = ((left.astype(np.int32) + right.astype(np.int32)) >> 1).astype("<i2")
    assert int(out["n_out"][0]) == 500 and (got == exp).all()
    # mono WAV / NULL / raw PCM pass through
    assert out["n_out"].tolist()[1:] == [-1, -1, -1]
    assert all(out["out_bytes"][k] is None for k in (1, 2, 3))
    # decode_payload now downmixes stereo DIRECTLY with the same exact
    # arithmetic (the multi-depth WAV family), so both paths agree
    assert np.array_equal(
        np.asarray(decode_payload(wav), dtype=np.int64),
        (left.astype(np.int64) + right.astype(np.int64)) >> 1,
    )


def test_downmix_mono_operator(spark):
    import numpy as np

    from jsonschema_spark.functions.audio import (
        encode_wav_pcm16,
        encode_wav_pcm16_stereo,
        pcm16_from_float,
        reference_signal,
    )
    from jsonschema_spark.operators.trim import downmix_mono
    from jsonschema_spark.sources.clips import CLIPS_SCHEMA

    rows = []
    for i in range(10):
        cid = f"clip-{i:012d}"
        left = pcm16_from_float(reference_signal(cid, 1600))
        if i % 3 == 2:
            payload = encode_wav_pcm16(left, 16000)
        else:
            right = pcm16_from_float(reference_signal(cid + ":R", 1600))
            payload = encode_wav_pcm16_stereo(left, right, 16000)
        rows.append((cid, payload, 16000, 100, "wav", "x"))
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    got = {r["clip_id"]: r for r in downmix_mono(df).collect()}
    for i, (cid, payload, *_rest) in enumerate(rows):
        r = got[cid]
        if i % 3 == 2:
            assert not r["downmixed"] and r["n_out"] is None
            assert bytes(r["bytes"]) == payload and r["codec"] == "wav"
        else:
            left = pcm16_from_float(reference_signal(cid, 1600)).astype(np.int32)
            right = pcm16_from_float(
                reference_signal(cid + ":R", 1600)
            ).astype(np.int32)
            exp = ((left + right) >> 1).astype("<i2")
            assert r["downmixed"] and r["n_out"] == 1600
            assert r["codec"] == "pcm_s16le"
            assert (np.frombuffer(bytes(r["bytes"]), dtype="<i2") == exp).all()
