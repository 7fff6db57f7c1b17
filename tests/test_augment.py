"""Augmentation operators (operators/augment.py): differential replays vs
independent numpy/Python implementations, plus plan-shape asserts (time
masking must stay entirely JVM-side; the Arrow ops must stay single-hop
and shuffle-free)."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.functions.audio import (
    mix_payloads_batch,
    speed_gather_batch,
)
from jsonschema_spark.operators.augment import (
    mix_overlay,
    speed_perturb,
    time_mask,
)

CLIP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
        T.StructField("_row_idx", T.LongType()),
    ]
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rows(n_clips=8, sr=16000):
    rng = np.random.RandomState(42)
    rows = []
    for i in range(n_clips):
        n = 3200 + 160 * i
        pcm = rng.randint(-30000, 30000, n).astype("<i2")
        rows.append(
            (f"clip-{i:012d}", bytes(pcm.tobytes()), sr, n * 1000 // sr,
             "pcm_s16le", "x", i)
        )
    return rows


@pytest.fixture(scope="module")
def aug_df(spark):
    return spark.createDataFrame(_rows(), CLIP_SCHEMA).persist()


# ---------------------------------------------------------------------------
# kernels (no SparkSession needed)
# ---------------------------------------------------------------------------


def test_speed_gather_kernel_indices():
    pcm = np.arange(-50, 50, dtype="<i2")
    for num, den in ((11, 10), (9, 10), (3, 2), (1, 1)):
        out = speed_gather_batch(pd.Series([pcm.tobytes()]), num, den)
        n_out = (len(pcm) * den) // num
        assert int(out["n_out"][0]) == n_out
        got = np.frombuffer(out["out_bytes"][0], dtype="<i2")
        exp = pcm[(np.arange(n_out) * num) // den]
        assert (got == exp).all()
    # NULL and undecodable pass-through
    out = speed_gather_batch(pd.Series([None]), 11, 10)
    assert out["out_bytes"][0] is None and int(out["n_out"][0]) == -1


def test_speed_gather_rejects_bad_rate():
    with pytest.raises(ValueError):
        speed_gather_batch(pd.Series([b""]), 0, 10)


def test_mix_payloads_kernel_exact():
    a = np.array([-32768, -100, 0, 100, 32767, 5], dtype="<i2")
    b = np.array([-32768, 100, 2, -3], dtype="<i2")  # shorter: zero-extended
    out = mix_payloads_batch(
        pd.Series([a.tobytes()]), pd.Series([b.tobytes()]), 0.25
    )
    got = np.frombuffer(out["out_bytes"][0], dtype="<i2")
    mixed = a.astype(np.float64).copy()
    mixed[: len(b)] += b.astype(np.float64) * 0.25
    exp = np.clip(np.floor(mixed + 0.5), -32768, 32767).astype("<i2")
    assert (got == exp).all()
    # clipping floor: -32768 + (-32768 * 0.25) pins at -32768
    assert got[0] == -32768
    # NULL on either side passes through
    out = mix_payloads_batch(pd.Series([a.tobytes()]), pd.Series([None]), 0.25)
    assert out["out_bytes"][0] is None and int(out["n_out"][0]) == -1


# ---------------------------------------------------------------------------
# operators (differential replay vs independent Python)
# ---------------------------------------------------------------------------


def test_speed_perturb_differential(aug_df):
    rows = _rows()
    for num, den in ((11, 10), (9, 10)):
        got = {
            r["clip_id"]: r
            for r in speed_perturb(aug_df.drop("_row_idx"), num, den)
            .select("clip_id", "bytes", "n_out", "perturbed", "dur_ms", "codec")
            .collect()
        }
        for cid, raw, sr, dur, _, _, i in rows:
            pcm = np.frombuffer(raw, dtype="<i2")
            n_out = (len(pcm) * den) // num
            r = got[cid]
            assert r["perturbed"] and r["n_out"] == n_out
            assert r["codec"] == "pcm_s16le"
            assert r["dur_ms"] == n_out * 1000 // sr
            exp = pcm[(np.arange(n_out) * num) // den]
            assert (np.frombuffer(bytes(r["bytes"]), dtype="<i2") == exp).all()


def test_time_mask_differential(aug_df):
    rows = _rows()
    got = {
        r["clip_id"]: r
        for r in time_mask(aug_df.drop("_row_idx"), n_masks=2, mask_ms=100)
        .select("clip_id", "bytes", "masked", "mask0_start", "mask1_start")
        .collect()
    }
    for cid, raw, sr, dur, _, _, i in rows:
        pcm = np.frombuffer(raw, dtype="<i2").copy()
        n = len(pcm)
        w = min(sr * 100 // 1000, n)
        r = got[cid]
        assert r["masked"]
        for k, col in enumerate(("mask0_start", "mask1_start")):
            s = _md5_60(f"{cid}:tm{k}") % max(n - w + 1, 1)
            assert r[col] == s
            pcm[s : s + w] = 0
        out = np.frombuffer(bytes(r["bytes"]), dtype="<i2")
        assert len(out) == n and (out == pcm).all()


def test_time_mask_passes_through_container_codecs(spark):
    rows = [("clip-000000000000", b"OpuS" + b"\x01\x02" * 10, 16000, 100,
             "opus", "x", 0)]
    df = spark.createDataFrame(rows, CLIP_SCHEMA)
    r = time_mask(df.drop("_row_idx")).collect()[0]
    assert not r["masked"] and r["mask0_start"] is None
    assert bytes(r["bytes"]) == rows[0][1]


def test_mix_overlay_differential(aug_df):
    rows = _rows()
    n = len(rows)
    got = {
        r["clip_id"]: r
        for r in mix_overlay(aug_df.drop("_row_idx"), aug_df, n_noise=n)
        .select("clip_id", "bytes", "mixed", "noise_idx", "n_out", "codec")
        .collect()
    }
    for cid, raw, sr, dur, _, _, i in rows:
        r = got[cid]
        nid = _md5_60(f"{cid}:mx") % n
        assert r["mixed"] and r["noise_idx"] == nid
        a = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        b = np.frombuffer(rows[nid][1], dtype="<i2").astype(np.float64)
        k = min(len(a), len(b))
        mixed = a.copy()
        mixed[:k] += b[:k] * 0.25
        exp = np.clip(np.floor(mixed + 0.5), -32768, 32767).astype("<i2")
        assert (np.frombuffer(bytes(r["bytes"]), dtype="<i2") == exp).all()
        assert r["n_out"] == len(a) and r["codec"] == "pcm_s16le"


def test_mix_overlay_null_noise_passes_through(spark, aug_df):
    # a bank missing the selected index -> left join NULL -> pass-through
    empty_bank = spark.createDataFrame([], CLIP_SCHEMA)
    out = mix_overlay(aug_df.drop("_row_idx"), empty_bank, n_noise=8).collect()
    assert all(not r["mixed"] for r in out)
    src = {r[0]: r[1] for r in _rows()}
    assert all(bytes(r["bytes"]) == src[r["clip_id"]] for r in out)


# ---------------------------------------------------------------------------
# plan shape
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_time_mask_plan_zero_python_zero_shuffle(aug_df):
    p = _plan(time_mask(aug_df.drop("_row_idx")))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Exchange" not in p


def test_speed_perturb_plan_single_arrow_hop_no_shuffle(aug_df):
    p = _plan(speed_perturb(aug_df.drop("_row_idx"), 11, 10))
    assert p.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in p and "Exchange" not in p


def test_mix_overlay_plan_single_arrow_hop(aug_df):
    p = _plan(mix_overlay(aug_df.drop("_row_idx"), aug_df, n_noise=8))
    assert p.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in p


# ---------------------------------------------------------------------------
# SpecAugment feature-space masking
# ---------------------------------------------------------------------------


def _md5_60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _expected_masks(cid, nfr, seed="", nt=2, max_t=20, nf=2, max_f=8,
                    n_mels=40):
    tm, fm = [], []
    for i in range(nt):
        w = _md5_60_py(f"{seed}:tw{i}|{cid}") % (max_t + 1)
        s = _md5_60_py(f"{seed}:ts{i}|{cid}") % max(1, nfr - w + 1)
        tm.append((s, w))
    for i in range(nf):
        w = _md5_60_py(f"{seed}:fw{i}|{cid}") % (max_f + 1)
        s = _md5_60_py(f"{seed}:fs{i}|{cid}") % max(1, n_mels - w + 1)
        fm.append((s, w))
    return tm, fm


def test_spec_augment_matches_python_replay(spark):
    import numpy as np
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from jsonschema_spark.operators.augment import spec_augment

    n_mels = 6
    rng = np.random.default_rng(3)
    rows = []
    for i, nfr in enumerate([0, 1, 5, 40]):
        q = rng.integers(1, 5000, size=nfr * n_mels).astype(np.int64)
        rows.append((f"c{i}", [int(v) for v in q], nfr))
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = spec_augment(df, n_mels=n_mels, seed="ep0", max_t_frames=7,
                       max_f_bins=3)
    got = {r["clip_id"]: r for r in out.collect()}
    for cid, flat, nfr in rows:
        tm, fm = _expected_masks(cid, nfr, seed="ep0", max_t=7,
                                 max_f=3, n_mels=n_mels)
        aug = got[cid]["aug_q"]
        assert len(aug) == len(flat)
        for pos, v in enumerate(flat):
            t, m = pos // n_mels, pos % n_mels
            masked = any(s <= t < s + w for s, w in tm) or any(
                s <= m < s + w for s, w in fm
            )
            assert aug[pos] == (0 if masked else v), (cid, pos)
        # provenance columns replay the draw
        assert got[cid]["_sa_t_s0"] == tm[0][0]
        assert got[cid]["_sa_t_w0"] == tm[0][1]
        assert got[cid]["_sa_f_s1"] == fm[1][0]


def test_spec_augment_epoch_seed_redraws(spark):
    import pyspark.sql.types as T

    from jsonschema_spark.operators.augment import spec_augment

    rows = [(f"c{i}", [1] * 200, 20) for i in range(10)]
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    a = spec_augment(df, n_mels=10, seed="ep0").collect()
    b = spec_augment(df, n_mels=10, seed="ep0").collect()
    c = spec_augment(df, n_mels=10, seed="ep1").collect()
    key = lambda rs: {r["clip_id"]: r["aug_q"] for r in rs}
    assert key(a) == key(b)  # deterministic replay
    assert key(a) != key(c)  # a new epoch draws new masks


def test_spec_augment_plan_keeps_md5_out_of_the_lambda(spark):
    """The md5 mask draws must survive as projection attributes — if
    project collapsing inlined them into the transform lambda they
    would re-evaluate once PER MATRIX ELEMENT (the lambda-hidden
    reference trap)."""
    import pyspark.sql.types as T

    from jsonschema_spark.operators.augment import spec_augment

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame([("c0", [1] * 80, 8)], schema)
    out = spec_augment(df, n_mels=10)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # 8 draws (2 time + 2 freq, width + start each) — exactly one md5
    # per draw; inlining would multiply them into the lambda
    assert plan.count("md5(") == 8, plan
    lam = plan[plan.index("lambdafunction"):]
    assert "md5(" not in lam.split(" AS aug_q")[0]


# ---------------------------------------------------------------------------
# SNR-targeted overlay mixing
# ---------------------------------------------------------------------------


def test_mix_snr_kernel_hits_target_ratio():
    import numpy as np
    import pandas as pd

    from jsonschema_spark.functions.audio import (
        encode_wav_pcm16,
        mix_payloads_snr_batch,
    )

    rng = np.random.default_rng(31)
    sr = 16000
    a = (6000 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
        np.int64
    )
    b = rng.integers(-12000, 12000, size=sr).astype(np.int64)
    r = 2.0  # rms_sig / rms_noise_scaled target
    out = mix_payloads_snr_batch(
        pd.Series([bytearray(encode_wav_pcm16(a, sr))]),
        pd.Series([bytearray(encode_wav_pcm16(b, sr))]),
        r,
    )
    g = out["gain"][0]
    pa = float((a * a).sum())
    pb = float((b * b).sum())
    import math

    assert g == math.sqrt(pa) / math.sqrt(pb) / r  # exact op order
    mixed = np.frombuffer(out["out_bytes"][0], dtype="<i2").astype(
        np.float64
    )
    noise_part = mixed - a  # added noise incl. rounding
    ratio = np.sqrt((a * a).mean()) / np.sqrt((noise_part**2).mean())
    assert abs(ratio - r) / r < 0.01  # target hit to rounding error
    # silent noise -> gain 0, output == input samples
    out2 = mix_payloads_snr_batch(
        pd.Series([bytearray(encode_wav_pcm16(a, sr))]),
        pd.Series([bytearray(encode_wav_pcm16(np.zeros(10, np.int64), sr))]),
        r,
    )
    assert out2["gain"][0] == 0.0
    back = np.frombuffer(out2["out_bytes"][0], dtype="<i2")
    assert (back == a).all()


def test_mix_overlay_snr_operator(spark):
    import numpy as np
    import pyspark.sql.functions as SF

    from jsonschema_spark.operators.augment import mix_overlay
    from jsonschema_spark.sources.clips import synth_padded_clips

    clips = synth_padded_clips(spark, 24, partitions=3).persist()
    plain = clips.select("clip_id", "bytes", "sr_hz", "dur_ms",
                         "codec", "transcript")
    r = mix_overlay(plain, clips, n_noise=24, snr_lin=2.0)
    rows = r.select("clip_id", "mixed", "mix_gain", "n_out").collect()
    assert len(rows) == 24
    mixed_rows = [x for x in rows if x["mixed"]]
    assert mixed_rows, "no rows mixed"
    for x in mixed_rows:
        assert x["mix_gain"] is not None and x["mix_gain"] >= 0.0
        assert x["n_out"] >= 0
    # deterministic: same plan, same gains
    again = {
        x["clip_id"]: x["mix_gain"]
        for x in mix_overlay(plain, clips, n_noise=24, snr_lin=2.0)
        .select("clip_id", "mix_gain").collect()
    }
    for x in rows:
        assert again[x["clip_id"]] == x["mix_gain"]
    clips.unpersist()
