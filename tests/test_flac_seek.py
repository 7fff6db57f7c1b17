"""FLAC SEEKTABLE + range decode + window extraction.

The scale feature: pulling a 250 ms training window out of a long
compressed clip must decode only the frames covering the window, not
the whole stream. The proof is structural, not a timing assertion: a
byte corrupted in an EARLY frame makes the full decode raise while a
range decode past it still succeeds bit-exactly — skipping genuinely
skips.
"""

import numpy as np
import pytest

from jsonschema_spark.functions.audio import pcm16_from_float, reference_signal
from jsonschema_spark.functions.flac import (
    decode_flac,
    decode_flac_range,
    encode_flac,
    flac_seek_points,
)


def _sig(n, tag="seek"):
    return pcm16_from_float(reference_signal(tag, n))


def test_seektable_emitted_and_parsed():
    pcm = _sig(50000)
    raw = encode_flac(pcm, 16000, seek_every=4)
    pts, frames_start = flac_seek_points(raw)
    # frames 0, 4, 8 at blocksize 4096 over 50000 samples (13 frames)
    assert [p[0] for p in pts] == [0, 4 * 4096, 8 * 4096, 12 * 4096]
    assert pts[0][1] == 0  # first frame at offset 0
    assert all(b == 4096 for _, _, b in pts[:-1])
    # offsets strictly increase and stay inside the stream
    offs = [p[1] for p in pts]
    assert offs == sorted(offs) and offs[-1] < len(raw) - frames_start
    # a stream without a seektable parses to an empty table
    assert flac_seek_points(encode_flac(pcm, 16000))[0] == []
    # full decode is unaffected by the extra metadata block
    sr, out = decode_flac(raw)
    assert np.array_equal(out.astype(np.int16), pcm)


@pytest.mark.parametrize("stereo", [False, True])
@pytest.mark.parametrize("seek_every", [None, 3])
def test_range_decode_equals_full_slice(stereo, seek_every):
    n = 61000
    if stereo:
        pcm = np.stack([_sig(n, "sk#L"), _sig(n, "sk#R")], axis=1)
    else:
        pcm = _sig(n)
    raw = encode_flac(pcm, 16000, seek_every=seek_every)
    full = pcm.astype(np.int64)
    rng = np.random.RandomState(11)
    for _ in range(8):
        start = int(rng.randint(0, n))
        cnt = int(rng.randint(1, 9000))
        sr, win = decode_flac_range(raw, start, cnt)
        assert sr == 16000
        want = full[start : start + cnt]
        assert np.array_equal(win.astype(np.int64), want), (start, cnt)
    # degenerate ranges
    assert decode_flac_range(raw, n + 50, 100)[1].shape[0] == 0
    assert decode_flac_range(raw, 0, 0)[1].shape[0] == 0


def test_range_decode_skips_corrupt_leading_frames():
    pcm = _sig(80000)
    raw = bytearray(encode_flac(pcm, 16000, seek_every=4))
    pts, frames_start = flac_seek_points(bytes(raw))
    # corrupt a byte INSIDE frame 0's body (past its ~6-byte header)
    raw[frames_start + 40] ^= 0x20
    with pytest.raises(ValueError):
        decode_flac(bytes(raw))  # full decode hits the corruption
    # a window past the first seekpoint never touches frame 0
    start = pts[1][0] + 1000
    sr, win = decode_flac_range(bytes(raw), start, 5000)
    assert np.array_equal(
        win.astype(np.int64), pcm[start : start + 5000].astype(np.int64)
    )
    # but a window INSIDE the corrupt frame still fails loudly
    with pytest.raises(ValueError):
        decode_flac_range(bytes(raw), 100, 1000)


def test_window_pcm_kernel_all_containers():
    import pandas as pd

    from jsonschema_spark.functions.audio import (
        encode_wav_pcm,
        window_pcm_batch,
    )

    n = 48000
    mono = _sig(n, "wk")
    st = np.stack([_sig(n, "wk#L"), _sig(n, "wk#R")], axis=1)
    payloads = [
        encode_flac(mono, 16000, seek_every=4),            # mono FLAC
        encode_flac(st, 16000, seek_every=4),              # stereo FLAC
        encode_wav_pcm(mono, 16000),                       # WAV PCM16
        mono.astype("<i2").tobytes(),                      # raw PCM
        None,
    ]
    off, cnt = 19200, 4000  # whole ms at 16 kHz (1200 ms / 250 ms)
    d = window_pcm_batch(
        pd.Series(payloads),
        pd.Series([16000] * 5),
        pd.Series([off * 1000 // 16000] * 5),
        pd.Series([cnt * 1000 // 16000] * 5),
    )
    want_mono = mono.astype(np.int64)[off : off + cnt]
    want_st = ((st[:, 0].astype(np.int64) + st[:, 1]) >> 1)[off : off + cnt]
    for i, want in ((0, want_mono), (2, want_mono), (3, want_mono)):
        got = np.frombuffer(bytes(d.iloc[i]["out_bytes"]), dtype="<i2")
        assert np.array_equal(got.astype(np.int64), want), i
        assert d.iloc[i]["n_out"] == cnt
    got = np.frombuffer(bytes(d.iloc[1]["out_bytes"]), dtype="<i2")
    assert np.array_equal(got.astype(np.int64), want_st)
    assert d.iloc[4]["out_bytes"] is None and d.iloc[4]["n_out"] == -1
    # window clamped at the clip end
    d2 = window_pcm_batch(
        pd.Series([payloads[2]]), pd.Series([16000]),
        pd.Series([(n - 800) * 1000 // 16000]), pd.Series([250]),
    )
    assert 0 < d2.iloc[0]["n_out"] <= 800 + 16  # ms rounding slack


def test_synth_flac_seek_ledger(spark):
    from jsonschema_spark.functions.audio import decode_payload
    from jsonschema_spark.sources.clips import (
        SEEK_CLASS_MOD,
        SEEK_CLS_EARLY_CORRUPT,
        synth_flac_seek_clips,
        window_spec,
    )

    rows = synth_flac_seek_clips(spark, 17).collect()
    assert len(rows) == 17
    n_corrupt = 0
    for r in rows:
        off_ms, win_ms = window_spec(r["dur_ms"])
        if r["_row_idx"] % SEEK_CLASS_MOD == SEEK_CLS_EARLY_CORRUPT:
            n_corrupt += 1
            # full decode fails loudly...
            with pytest.raises(ValueError):
                decode_payload(bytes(r["bytes"]))
        # ...but the seek-window fingerprint is certified for EVERY row
        assert r["_win_md5"] is not None and r["_win_n"] > 0
    assert n_corrupt > 0
