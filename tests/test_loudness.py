"""BS.1770-4 / EBU R128 loudness (functions/loudness.py +
functions/audio.audio_loudness + the `audio_loudness` suite check).

Correctness anchors, strongest first:
  1. The fs-parameterized K-weighting design reproduces the spec's
     TABULATED 48 kHz coefficients to machine precision.
  2. EBU Tech 3341 stimulus behavior: a 997 Hz sine at -23 dBFS RMS
     reads -23.0 LUFS (+/- 0.1 at any supported rate), and the relative
     gate drops a quiet lead-in so a quiet+loud program reads near the
     loud segment's loudness, not the ungated mean.
  3. True peak: an fs/4 sine with pi/4 phase has all samples at
     amplitude/sqrt(2) (sample peak ~-3 dBFS below the true crest) —
     the 4x interpolator must recover most of the inter-sample over.
  4. The batch kernel is bit-identical to single-clip evaluation
     (padding/column independence) — the property the ledger contract
     query (clips_loudness_r128) relies on.
"""

import numpy as np
import pytest

from jsonschema_spark.functions.loudness import (
    k_weighting_coeffs,
    loudness_batch,
    loudness_single,
)


def _sine(level_dbfs: float, freq: float, dur_s: float, fs: int) -> np.ndarray:
    t = np.arange(int(fs * dur_s), dtype=np.float64)
    amp = 10.0 ** (level_dbfs / 20.0) * np.sqrt(2.0) * 32768.0
    return np.round(amp * np.sin(2.0 * np.pi * freq * t / fs)).astype(
        np.int64
    )


def test_k_weighting_reproduces_spec_table_at_48k():
    b, a = k_weighting_coeffs(48000)
    # ITU-R BS.1770-4 Table 1 (shelf) and Table 2 (RLB high-pass)
    assert np.allclose(
        b[0], [1.53512485958697, -2.69169618940638, 1.19839281085285],
        atol=1e-12,
    )
    assert np.allclose(
        a[0], [1.0, -1.69065929318241, 0.73248077421585], atol=1e-12
    )
    assert np.allclose(b[1], [1.0, -2.0, 1.0], atol=0)
    assert np.allclose(
        a[1], [1.0, -1.99004745483398, 0.99007225036621], atol=1e-12
    )


@pytest.mark.parametrize("fs", [48000, 44100, 16000, 8000])
def test_ebu_3341_sine_minus23(fs):
    r = loudness_single(_sine(-23.0, 997.0, 2.0, fs), fs)
    assert abs(r["lufs_integrated"] + 23.0) < 0.1, (fs, r)
    assert abs(r["lufs_momentary_max"] + 23.0) < 0.15
    assert abs(r["true_peak_dbtp"] + 20.0) < 0.1  # sine crest 3.01 dB


def test_relative_gate_drops_quiet_leadin():
    fs = 16000
    quiet = _sine(-50.0, 997.0, 1.5, fs)
    loud = _sine(-20.0, 997.0, 1.5, fs)
    x = np.concatenate([quiet, loud])
    r = loudness_single(x, fs)
    # ungated mean power would read ~ -23; the -10 LU relative gate
    # keeps only the loud half's blocks (boundary blocks shift it a hair)
    assert abs(r["lufs_integrated"] + 20.0) < 0.5, r
    # absolute gate: blocks below -70 LUFS never enter the mean
    deep = np.concatenate([_sine(-80.0, 997.0, 1.0, fs), loud])
    r2 = loudness_single(deep, fs)
    assert abs(r2["lufs_integrated"] + 20.0) < 0.5, r2


def test_true_peak_catches_intersample_over():
    fs = 16000
    t = np.arange(fs)
    x = np.round(32000 * np.sin(2 * np.pi * t / 4 + np.pi / 4)).astype(
        np.int64
    )
    sample_peak_db = 20 * np.log10(np.abs(x).max() / 32768.0)
    r = loudness_single(x, fs)
    assert sample_peak_db < -3.0  # every sample sits at crest/sqrt(2)
    assert r["true_peak_dbtp"] > -1.0  # interpolator recovers the over
    # and on a plain low-frequency tone the true peak ~ sample peak
    y = _sine(-23.0, 200.0, 1.0, fs)
    ry = loudness_single(y, fs)
    ysp = 20 * np.log10(np.abs(y).max() / 32768.0)
    assert abs(ry["true_peak_dbtp"] - ysp) < 0.05


def test_batch_bitwise_equals_single_and_edge_cases():
    rng = np.random.RandomState(7)
    sigs = [
        np.round(rng.randn(rng.randint(2000, 30000)) * 6000).astype(np.int64)
        for _ in range(9)
    ]
    sigs[3] = sigs[3][:3000]  # < 400 ms at 16 kHz -> no gating block
    rb = loudness_batch(sigs, 16000)
    for i, s in enumerate(sigs):
        rs = loudness_single(s, 16000)
        for k in rb:
            a, b = rb[k][i], rs[k]
            assert (a == b) or (np.isnan(a) and np.isnan(b)), (i, k, a, b)
    assert np.isnan(rb["lufs_integrated"][3])
    assert rb["n_blocks"][3] == 0
    assert not np.isnan(rb["true_peak_dbtp"][3])
    # None (undecodable upstream) -> NaN / -1
    r = loudness_batch([None, sigs[0]], 16000)
    assert np.isnan(r["lufs_integrated"][0]) and r["n_blocks"][0] == -1
    assert r["n_blocks"][1] == rb["n_blocks"][0]


def test_loudness_udf_and_ledger_corpus(spark):
    from jsonschema_spark.functions.audio import audio_loudness
    from jsonschema_spark.sources.clips import (
        LOUD_CLASS_MOD,
        LOUD_CLS_SHORT,
        LOUD_CLS_TORN,
        synth_loudness_clips,
    )

    clips = synth_loudness_clips(spark, 12)
    got = (
        clips.select(
            "_row_idx", "_lufs_i", "_lufs_mm", "_tp", "_n_blocks",
            audio_loudness("bytes", "sr_hz").alias("l"),
        )
        .collect()
    )
    assert len(got) == 12

    def undef(v):
        return v is None or (isinstance(v, float) and np.isnan(v))

    for r in got:
        cls = r["_row_idx"] % LOUD_CLASS_MOD
        if cls == LOUD_CLS_TORN:
            assert r["l"]["n_blocks"] == -1
            assert undef(r["l"]["lufs_integrated"])
        elif cls == LOUD_CLS_SHORT:
            assert r["l"]["n_blocks"] == 0 == r["_n_blocks"]
            assert undef(r["l"]["lufs_integrated"])
            assert r["l"]["true_peak_dbtp"] == r["_tp"]
        else:
            # decode->kernel output lands bit-for-bit on the ledger
            assert r["l"]["lufs_integrated"] == r["_lufs_i"], r["_row_idx"]
            assert r["l"]["lufs_momentary_max"] == r["_lufs_mm"]
            assert r["l"]["true_peak_dbtp"] == r["_tp"]
            assert r["l"]["n_blocks"] == r["_n_blocks"]
        if cls == 1:  # the EBU 3341 -23 dBFS stimulus class
            assert abs(r["_lufs_i"] + 23.0) < 0.1


def test_normalize_to_lufs(spark):
    """The -23 LUFS rewrite: re-measuring the normalized payload lands
    on the target (within the quantization floor of int16 rounding),
    the gain cap holds, and unmeasurable clips pass through unchanged."""
    from jsonschema_spark.operators.trim import normalize_to_lufs
    from jsonschema_spark.sources.clips import (
        LOUD_CLASS_MOD,
        LOUD_CLS_SHORT,
        LOUD_CLS_TORN,
        synth_loudness_clips,
    )
    from jsonschema_spark.functions.audio import audio_loudness
    from jsonschema_spark.operators.trim import PCM_CODEC

    clips = synth_loudness_clips(spark, 12)
    norm = normalize_to_lufs(
        clips.select("clip_id", "bytes", "sr_hz", "codec", "_row_idx"),
        target_lufs=-23.0, max_gain=8.0,
    ).persist()
    rows = norm.select(
        "_row_idx", "normalized", "gain", "codec",
        audio_loudness("bytes", "sr_hz").alias("l"),
    ).collect()
    norm.unpersist()
    for r in rows:
        cls = r["_row_idx"] % LOUD_CLASS_MOD
        if cls in (LOUD_CLS_SHORT, LOUD_CLS_TORN):
            assert not r["normalized"]
            assert r["gain"] is None
        else:
            assert r["normalized"] and r["codec"] == PCM_CODEC
            assert 0 < r["gain"] <= 8.0
            if r["gain"] < 8.0:  # uncapped: re-measure hits the target
                assert abs(r["l"]["lufs_integrated"] + 23.0) < 0.15, (
                    cls, r["l"]["lufs_integrated"]
                )


def test_audio_loudness_suite_check(spark):
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import synth_loudness_clips

    clips = synth_loudness_clips(spark, 12)
    rep = run_suite(
        {"clips": clips},
        {"checks": [
            {"type": "audio_loudness", "name": "band", "table": "clips",
             "min_lufs": -40.0, "max_lufs": -5.0,
             "max_true_peak_dbtp": 0.0,
             # torn (2) + short (2) of 12 can never certify
             "max_violation_rate": 4.0 / 12.0 + 1e-9},
            {"type": "audio_loudness", "name": "strict", "table": "clips",
             "min_lufs": -23.05, "max_lufs": -22.95,
             "max_violation_rate": 0.0},
        ]},
    )
    rows = {r["check_name"]: r.asDict() for r in rep.collect()}
    assert rows["band"]["status"] == "pass", rows["band"]
    # only the 997 Hz -23 LUFS class fits the strict band -> fails
    assert rows["strict"]["status"] == "fail"
    assert rows["strict"]["metric"] > 0.5
