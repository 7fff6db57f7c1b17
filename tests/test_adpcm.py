"""IMA/DVI ADPCM codec (functions/audio.py) — a REAL 4-bit compressed
audio format in a standard WAV container (WAVE_FORMAT_IMA_ADPCM = 0x11)."""

import numpy as np
import pytest

from jsonschema_spark.functions.audio import (
    adpcm_decode,
    adpcm_encode,
    decode_payload,
    encode_wav_adpcm,
    pcm16_from_float,
    reference_signal,
    snr_db,
)


def test_known_nibble_decodes():
    import struct

    # block: predictor=100, index=0; one body byte 0x70 = nibbles (0, 7)
    # code 0: diffq = step>>3 = 0 -> 100, index 0-1 clamped to 0
    # code 7: diffq = 7 + 3 + 1 + 0 = 11 -> 111, index 0+8=8
    # byte 0x70 = nibbles (0, 7), LOW nibble first
    # sample 1: code 0 at step_table[0]=7 -> diffq = 7>>3 = 0 -> 100,
    #           index 0-1 clamped to 0
    # sample 2: code 7 -> diffq = 7 + 3 + 1 + 0 = 11 -> 111, index 0+8=8
    blk = struct.pack("<hBB", 100, 0, 0) + bytes([0x70])
    assert adpcm_decode(blk, block_align=5).tolist() == [100, 100, 111]


def test_known_sign_nibble():
    import struct

    blk = struct.pack("<hBB", 100, 0, 0) + bytes([0x0F])
    out = adpcm_decode(blk, block_align=5)
    # nibble 1: code 0xF (sign|7) -> diffq = 11, NEGATIVE -> 89, index 0+8=8
    # nibble 2: code 0x0 at step_table[8]=16 -> diffq = 16>>3 = 2 -> 91
    assert out.tolist() == [100, 89, 91]


def test_roundtrip_snr_and_exactness():
    pcm = pcm16_from_float(reference_signal("clip-adpcm", 5000)).astype(np.int32)
    raw = encode_wav_adpcm(pcm.astype(np.int16), 16000)
    dec = decode_payload(raw)
    assert len(dec) == len(pcm)  # fact chunk trims final-block padding
    assert snr_db(pcm, dec) > 15.0
    # silence is exact; compression is ~4:1 over PCM16
    z = np.zeros(1234, dtype=np.int16)
    assert np.array_equal(decode_payload(encode_wav_adpcm(z, 8000)),
                          np.zeros(1234, dtype=np.int32))
    assert len(raw) < 2 * len(pcm) * 0.30


def test_block_align_invariance():
    pcm = pcm16_from_float(reference_signal("clip-ba", 3000)).astype(np.int16)
    for ba in (32, 64, 256, 512):
        dec = decode_payload(encode_wav_adpcm(pcm, 16000, block_align=ba))
        assert len(dec) == len(pcm), ba
        assert snr_db(pcm.astype(np.int32), dec) > 15.0, ba


def test_truncation_raises_loudly():
    pcm = pcm16_from_float(reference_signal("clip-tr", 3000)).astype(np.int16)
    data = adpcm_encode(pcm, 256)
    with pytest.raises(ValueError):
        adpcm_decode(data[: 256 + 2], 256)  # stranded partial header
    with pytest.raises(ValueError):
        # cut past the final block's padding: decoded < fact count
        adpcm_decode(data[:-40], 256, n_samples=len(pcm))


def test_index_carry_across_blocks():
    # a loud signal drives the step index high; the next block header must
    # carry it (decode of block 2 alone must match decode of the stream)
    rng = np.random.RandomState(7)
    pcm = (rng.randint(-30000, 30000, size=1200)).astype(np.int16)
    data = adpcm_encode(pcm, 64)
    full = adpcm_decode(data, 64)
    blk2 = adpcm_decode(data[64:128], 64)
    spb = (64 - 4) * 2 + 1
    assert full[spb : 2 * spb].tolist() == blk2.tolist()


def test_synth_adpcm_ledger(spark):
    from jsonschema_spark.sources.clips import (
        ADPCM_TRUNC_CLS,
        ADPCM_TRUNC_MOD,
        synth_adpcm_clips,
    )

    df = synth_adpcm_clips(spark, 33).collect()
    assert len(df) == 33
    for r in df:
        truncated = r["_row_idx"] % ADPCM_TRUNC_MOD == ADPCM_TRUNC_CLS
        if truncated:
            assert r["_dec_md5"] is None
            with pytest.raises(ValueError):
                decode_payload(bytes(r["bytes"]))
        else:
            dec = decode_payload(bytes(r["bytes"]))
            assert len(dec) == r["_n_dec"]
