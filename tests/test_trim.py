"""Silence trimming + decimation (operators/trim.py, audio kernels)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import (
    decimate_batch,
    decode_payload,
    encode_payload,
    pcm16_from_float,
    reference_signal,
    speech_span_batch,
)
from jsonschema_spark.operators.trim import resample_pcm, trim_silence


def _body(n: int, cid: str = "clip-000000000007") -> np.ndarray:
    return reference_signal(cid, n).astype(np.float64)


def _pcm(sig: np.ndarray) -> bytes:
    return pcm16_from_float(sig).tobytes()


# ---------------------------------------------------------------------------
# kernel: speech_span_batch
# ---------------------------------------------------------------------------


def test_span_lead_and_tail():
    sig = np.concatenate([np.zeros(640), _body(3200), np.zeros(960)])
    d = speech_span_batch(pd.Series([_pcm(sig)]), pd.Series([16000]))
    assert d.iloc[0].tolist() == [4800, 640, 3840]


def test_span_edges():
    # all-silent, empty, NULL, undecodable-sr rows
    d = speech_span_batch(
        pd.Series([_pcm(np.zeros(1600)), b"", None, _pcm(_body(320))]),
        pd.Series([16000, 16000, 16000, None]),
    )
    assert d.iloc[0].tolist() == [1600, 0, 0]
    assert d.iloc[1].tolist() == [0, 0, 0]
    assert d.iloc[2].tolist() == [-1, -1, -1]
    assert d.iloc[3].tolist() == [-1, -1, -1]


def test_span_never_cuts_speech():
    """Span is whole frames: every sample with |s| > threshold is inside."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 4000))
        sig = rng.uniform(-0.02, 0.02, n)  # mostly sub-threshold noise
        k = int(rng.integers(0, n))
        sig[k] = 0.5  # one loud sample
        pay = _pcm(sig)
        d = speech_span_batch(pd.Series([pay]), pd.Series([16000]))
        pcm = np.frombuffer(pay, dtype="<i2").astype(np.int32)
        loud = np.nonzero(np.abs(pcm) > 327)[0]
        lo, hi = d.iloc[0]["start_sample"], d.iloc[0]["end_sample"]
        assert all(lo <= i < hi for i in loud)


def test_span_negative_fullscale():
    """|-32768| must not overflow int16 inside the kernel."""
    sig = np.zeros(640)
    pay = bytearray(_pcm(sig))
    pay[640:642] = (0x00, 0x80)  # sample 320 = -32768
    d = speech_span_batch(pd.Series([bytes(pay)]), pd.Series([16000]))
    assert d.iloc[0].tolist() == [640, 320, 640]


# ---------------------------------------------------------------------------
# kernel: decimate_batch
# ---------------------------------------------------------------------------


def test_decimate_matches_numpy_stride():
    pay = _pcm(_body(4801))  # odd length exercises ceil
    d = decimate_batch(pd.Series([pay]), pd.Series([16000]), 8000)
    pcm = np.frombuffer(pay, dtype="<i2")
    assert d.iloc[0]["n_out"] == 2401
    assert bytes(d.iloc[0]["out_bytes"]) == pcm[::2].tobytes()


def test_decimate_transcodes_containers():
    pcm = pcm16_from_float(_body(3200))
    d = decimate_batch(
        pd.Series([encode_payload(pcm, "opus")]), pd.Series([16000]), 8000
    )
    dec = decode_payload(encode_payload(pcm, "opus"))
    assert bytes(d.iloc[0]["out_bytes"]) == dec[::2].astype("<i2").tobytes()


def test_decimate_rejects_non_integer_ratio():
    d = decimate_batch(
        pd.Series([_pcm(_body(320)), None]), pd.Series([22050, 16000]), 16000
    )
    assert d["n_out"].tolist() == [-1, -1]
    assert d["out_bytes"].tolist() == [None, None]


# ---------------------------------------------------------------------------
# kernel: interpolate_batch (upsampling)
# ---------------------------------------------------------------------------


def test_interpolate_exact_blend_and_passthrough():
    from jsonschema_spark.functions.audio import interpolate_batch

    x = np.array([100, -200, 32767, -32768, 1], dtype=np.int16)
    d = interpolate_batch(pd.Series([x.tobytes()]), pd.Series([16000]), 32000)
    out = np.frombuffer(bytes(d.iloc[0]["out_bytes"]), dtype="<i2").astype(
        np.int64
    )
    assert d.iloc[0]["n_out"] == 10
    # even outputs reproduce the originals bit-for-bit
    assert np.array_equal(out[0::2], x.astype(np.int64))
    # odd outputs are the exact floor midpoint; last one clamps (repeat)
    want = [
        (100 - 200) // 2,          # floor(-50) = -50
        (-200 + 32767) // 2,       # 16283 (floor of 16283.5)
        (32767 - 32768) // 2,      # floor(-0.5) = -1  <- floor, not trunc
        (-32768 + 1) // 2,         # floor(-16383.5) = -16384
        1,                          # clamp: repeat last sample
    ]
    assert out[1::2].tolist() == want


def test_interpolate_factor_4_and_flags():
    from jsonschema_spark.functions.audio import interpolate_batch

    x = np.array([0, 1000], dtype=np.int16)
    d = interpolate_batch(
        pd.Series([x.tobytes(), x.tobytes(), None]),
        pd.Series([8000, 22050, 8000]),
        32000,
    )
    out = np.frombuffer(bytes(d.iloc[0]["out_bytes"]), dtype="<i2")
    assert out.tolist() == [0, 250, 500, 750, 1000, 1000, 1000, 1000]
    # non-integer ratio and NULL payload: flagged, never approximated
    assert d["n_out"].tolist() == [8, -1, -1]
    assert d.iloc[1]["out_bytes"] is None and d.iloc[2]["out_bytes"] is None


def test_interpolate_inverts_decimate_on_even_samples():
    from jsonschema_spark.functions.audio import interpolate_batch

    pay = _pcm(_body(3200))
    up = interpolate_batch(pd.Series([pay]), pd.Series([16000]), 32000)
    back = decimate_batch(
        pd.Series([bytes(up.iloc[0]["out_bytes"])]), pd.Series([32000]), 16000
    )
    assert bytes(back.iloc[0]["out_bytes"]) == pay


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clips(spark):
    lead, body, tail = np.zeros(640), _body(3200), np.zeros(960)
    rows = [
        ("pad", _pcm(np.concatenate([lead, body, tail])), 16000, 300, "pcm_s16le"),
        ("allsilent", _pcm(np.zeros(1600)), 16000, 100, "pcm_s16le"),
        ("container", encode_payload(pcm16_from_float(body), "opus"), 16000, 200,
         "opus"),
        ("nullpay", None, 16000, 100, "pcm_s16le"),
        ("oddrate", _pcm(body), 22050, 145, "pcm_s16le"),
    ]
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )


def test_trim_silence_frame(clips):
    out = {r["clip_id"]: r for r in trim_silence(clips).collect()}
    p = out["pad"]
    assert (p["start_sample"], p["end_sample"], p["trimmed"]) == (640, 3840, True)
    assert (p["trim_lead_ms"], p["trim_tail_ms"], p["dur_ms"]) == (40, 60, 200)
    orig = np.concatenate([np.zeros(640), _body(3200), np.zeros(960)])
    assert bytes(p["bytes"]) == _pcm(orig)[1280:7680]
    assert len(bytes(out["allsilent"]["bytes"])) == 0
    # containers pass through with span attached, payload untouched
    c = out["container"]
    assert not c["trimmed"] and c["n_samples"] == 3200
    assert bytes(c["bytes"]) == bytes(
        {r["clip_id"]: r for r in clips.collect()}["container"]["bytes"]
    )
    npay = out["nullpay"]
    assert npay["n_samples"] is None and not npay["trimmed"]
    assert npay["bytes"] is None and npay["dur_ms"] == 100


def test_resample_frame(clips):
    out = {r["clip_id"]: r for r in resample_pcm(clips, 8000).collect()}
    p = out["pad"]
    assert p["resampled"] and p["sr_hz"] == 8000 and p["n_out"] == 2400
    assert p["codec"] == "pcm_s16le" and p["dur_ms"] == 300
    # container transcoded to raw PCM at the target rate
    c = out["container"]
    assert c["resampled"] and c["codec"] == "pcm_s16le" and c["n_out"] == 1600
    # non-integer ratio + NULL pass through, loudly flagged
    assert not out["oddrate"]["resampled"] and out["oddrate"]["sr_hz"] == 22050
    assert out["oddrate"]["codec"] == "pcm_s16le"
    assert not out["nullpay"]["resampled"] and out["nullpay"]["n_out"] is None


def test_trim_single_arrow_hop(clips):
    """Span detection costs ONE ArrowEvalPython node; the slice itself is
    JVM-side (no second Python hop, no BatchEvalPython anywhere)."""
    plan = trim_silence(clips)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


def test_upsample_frame(clips):
    from jsonschema_spark.operators.trim import upsample_pcm

    out = {r["clip_id"]: r for r in upsample_pcm(clips, 32000).collect()}
    p = out["pad"]
    assert p["resampled"] and p["sr_hz"] == 32000 and p["n_out"] == 9600
    assert p["codec"] == "pcm_s16le" and p["dur_ms"] == 300
    c = out["container"]
    assert c["resampled"] and c["codec"] == "pcm_s16le" and c["n_out"] == 6400
    # non-integer ratio + NULL pass through, loudly flagged
    assert not out["oddrate"]["resampled"] and out["oddrate"]["sr_hz"] == 22050
    assert not out["nullpay"]["resampled"] and out["nullpay"]["n_out"] is None


def test_trim_then_resample_composes(clips):
    """The curation order that minimizes bytes: trim first, then decimate."""
    t = trim_silence(clips).drop(
        "n_samples", "start_sample", "end_sample", "trimmed",
        "trim_lead_ms", "trim_tail_ms",
    )
    r = {r["clip_id"]: r for r in resample_pcm(t, 8000).collect()}
    assert r["pad"]["n_out"] == 1600  # 3200 speech samples / 2
    body = _body(3200)
    assert bytes(r["pad"]["bytes"]) == pcm16_from_float(body)[::2].tobytes()


def test_transcode_to_flac_lossless(clips):
    from jsonschema_spark.operators.trim import transcode_to_flac

    out = {r["clip_id"]: r for r in transcode_to_flac(clips).collect()}
    orig = {r["clip_id"]: r for r in clips.collect()}
    for cid in ("pad", "allsilent", "container", "oddrate"):
        r = out[cid]
        assert r["transcoded"] and r["codec"] == "flac", cid
        assert bytes(r["bytes"])[:4] == b"fLaC"
        # lossless: decode(transcode(x)) == decode(x) bit-for-bit
        want = decode_payload(bytes(orig[cid]["bytes"]))
        got = decode_payload(bytes(r["bytes"]))
        assert np.array_equal(got, want), cid
        assert r["n_out"] == len(want)
    # tonal audio actually compresses vs raw PCM16
    assert len(bytes(out["pad"]["bytes"])) < len(bytes(orig["pad"]["bytes"]))
    n = out["nullpay"]
    assert not n["transcoded"] and n["bytes"] is None and n["n_out"] is None


def test_transcode_single_arrow_hop(clips):
    from jsonschema_spark.operators.trim import transcode_to_flac

    plan = (
        transcode_to_flac(clips)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# loudness normalization
# ---------------------------------------------------------------------------


def test_gain_normalize_rms_target():
    from jsonschema_spark.functions.audio import gain_normalize_batch

    sig = 0.5 * np.sin(2 * np.pi * 220.0 * np.arange(16000) / 16000.0)
    d = gain_normalize_batch(pd.Series([_pcm(sig)]), target_rms=0.1, max_gain=4.0)
    out = np.frombuffer(bytes(d.iloc[0]["out_bytes"]), dtype="<i2")
    rms = np.sqrt(np.mean((out.astype(np.float64) / 32768.0) ** 2))
    assert abs(rms - 0.1) < 1e-3  # hits the target
    # exact definition: floor(v * gain + 0.5), clipped
    pcm = np.frombuffer(_pcm(sig), dtype="<i2").astype(np.float64)
    g = d.iloc[0]["gain"]
    want = np.clip(np.floor(pcm * g + 0.5), -32768, 32767).astype("<i2")
    assert np.array_equal(out, want)


def test_gain_normalize_edges():
    from jsonschema_spark.functions.audio import gain_normalize_batch

    quiet = 0.001 * np.sin(2 * np.pi * 220.0 * np.arange(800) / 16000.0)
    d = gain_normalize_batch(
        pd.Series([_pcm(np.zeros(160)), _pcm(quiet), None, b""]),
        target_rms=0.1, max_gain=4.0,
    )
    assert d.iloc[0]["gain"] == 4.0  # all-zero: capped, zeros stay zeros
    assert bytes(d.iloc[0]["out_bytes"]) == b"\x00" * 320
    assert d.iloc[1]["gain"] == 4.0  # very quiet: capped
    assert d.iloc[2]["n_out"] == -1 and d.iloc[2]["out_bytes"] is None
    assert d.iloc[3]["n_out"] == 0 and bytes(d.iloc[3]["out_bytes"]) == b""


def test_normalize_loudness_frame(clips):
    from jsonschema_spark.operators.trim import normalize_loudness

    out = {r["clip_id"]: r for r in normalize_loudness(clips).collect()}
    assert out["pad"]["normalized"] and out["pad"]["gain"] is not None
    # container transcoded to raw pcm
    assert out["container"]["normalized"]
    assert out["container"]["codec"] == "pcm_s16le"
    assert not out["nullpay"]["normalized"] and out["nullpay"]["bytes"] is None
    # attenuation never clips: gain < 1 keeps samples in range
    loud = out["pad"]
    v = np.frombuffer(bytes(loud["bytes"]), dtype="<i2")
    assert v.min() >= -32768 and v.max() <= 32767
