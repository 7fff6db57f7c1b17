"""MS ADPCM (WAVE_FORMAT_ADPCM = 0x0002) — functions/audio.py.

The second real compressed-WAV codec next to IMA/DVI: 7 canonical
predictor pairs (encoder picks per block by squared error), 16-entry
delta adaptation, 7-byte mono block headers, HIGH nibble first,
chronological output starting with iSamp2 then iSamp1."""

import struct

import numpy as np
import pytest

from jsonschema_spark.functions.audio import (
    decode_payload,
    encode_wav_msadpcm,
    msadpcm_decode,
    msadpcm_encode,
    pcm16_from_float,
    reference_signal,
    snr_db,
)


def test_hand_decoded_block():
    # predictor 0 => coef (256, 0) => pred == s1 exactly
    blk = struct.pack("<Bhhh", 0, 16, 100, 50) + bytes([0x1F])
    out = msadpcm_decode(blk, block_align=8)
    # header order: iSamp1=100 (newer), iSamp2=50 (older) -> output 50,100
    # code +1: pred=100, smp=116; delta=max(16,(230*16)>>8)=16
    # code -1 (0xF): pred=116, smp=100
    assert out.tolist() == [50, 100, 116, 100]


def test_hand_decoded_predictor_1():
    # predictor 1 => coef (512, -256) => pred = 2*s1 - s2 (linear slope)
    blk = struct.pack("<Bhhh", 1, 16, 200, 100) + bytes([0x00])
    out = msadpcm_decode(blk, block_align=8)
    # codes 0,0: pred = 2*200-100 = 300; then pred = 2*300-200 = 400
    assert out.tolist() == [100, 200, 300, 400]


def test_delta_floor_and_negative_shift():
    # arithmetic >>8 on negative products must floor, and delta never
    # drops below 16
    blk = struct.pack("<Bhhh", 1, 16, -100, 50) + bytes([0x80])
    out = msadpcm_decode(blk, block_align=8)
    # HIGH nibble first: code 8 = -8.
    # pred = (-100*512 + 50*-256) >> 8 = floor(-64000/256) = -250
    # smp = -250 - 8*16 = -378; delta -> max(16, (768*16)>>8) = 48
    # low nibble 0: pred = (-378*512 + -100*-256) >> 8 = -656; smp = -656
    assert out.tolist() == [50, -100, -378, -656]


def test_roundtrip_snr_and_sizes():
    pcm = pcm16_from_float(reference_signal("ms-rt", 24000))
    wav = encode_wav_msadpcm(pcm, 16000)
    dec = decode_payload(wav)
    assert len(dec) == len(pcm)
    assert snr_db(pcm.astype(np.int32), dec) >= 30.0  # content gate passes
    assert len(wav) < 0.3 * 2 * len(pcm)  # ~4:1 over PCM16


def test_predictor_switching_happens():
    # tonal + noisy halves should make different blocks pick different
    # predictors (the corpus must exercise more than one)
    rng = np.random.RandomState(4)
    tone = pcm16_from_float(reference_signal("ms-sw", 4000)).astype(np.int16)
    noise = rng.randint(-20000, 20000, 4000).astype(np.int16)
    raw = msadpcm_encode(np.concatenate([tone, noise]), block_align=256)
    preds = {raw[p] for p in range(0, len(raw), 256)}
    assert len(preds) > 1, preds


def test_block_align_invariance():
    pcm = pcm16_from_float(reference_signal("ms-ba", 5000))
    for ba in (64, 128, 256, 512):
        dec = decode_payload(encode_wav_msadpcm(pcm, 16000, ba))
        assert len(dec) == len(pcm), ba
        assert snr_db(pcm.astype(np.int32), dec) >= 25.0, ba


def test_truncation_and_malformed_raise_loudly():
    pcm = pcm16_from_float(reference_signal("ms-trunc", 5000))
    wav = encode_wav_msadpcm(pcm, 16000)
    with pytest.raises(ValueError):
        decode_payload(wav[:-250])  # torn mid-block
    with pytest.raises(ValueError):
        msadpcm_decode(struct.pack("<Bhhh", 7, 16, 0, 0) + b"\x00", 8)
    with pytest.raises(ValueError):
        msadpcm_decode(msadpcm_encode(pcm[:100]), 256, n_samples=10**6)
    with pytest.raises(ValueError):
        msadpcm_decode(b"\x00" * 16, block_align=4)


def test_synth_msadpcm_ledger(spark):
    import hashlib

    from jsonschema_spark.sources.clips import (
        MSADPCM_TRUNC_CLS,
        MSADPCM_TRUNC_MOD,
        synth_msadpcm_clips,
    )

    rows = synth_msadpcm_clips(spark, 23).collect()
    assert len(rows) == 23
    n_bad = 0
    for r in rows:
        if r["_row_idx"] % MSADPCM_TRUNC_MOD == MSADPCM_TRUNC_CLS:
            n_bad += 1
            assert r["_dec_md5"] is None
            with pytest.raises(ValueError):
                decode_payload(bytes(r["bytes"]))
        else:
            dec = decode_payload(bytes(r["bytes"]))
            assert len(dec) == r["_n_dec"]
            got = hashlib.md5(
                np.clip(dec, -32768, 32767).astype("<i2")
                .tobytes().hex().upper().encode()
            ).hexdigest()
            assert got == r["_dec_md5"]
    assert n_bad > 0
