"""Log-mel filterbank + corpus CMVN (functions/fbank.py).

Analytic anchors: the mel bank covers every FFT bin in [fmin, fmax]
with triangle weights; a pure tone concentrates its energy in the mel
bins whose triangles cover its frequency; the fixed-point kernel is
bit-deterministic; and — the design's whole point — the CMVN
aggregation is EXACTLY order-independent: any repartitioning of the
corpus yields bit-identical means/stds because the cross-clip sums
are int64.
"""

import numpy as np
import pandas as pd
import pytest

from jsonschema_spark.functions.fbank import (
    FBANK_Q,
    N_MELS,
    fbank_stats_batch,
    logmel_frames_q,
    mel_filterbank,
)

SR = 16000


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank(SR)
    assert fb.shape == (N_MELS, 257)
    # triangles are non-negative and each mel row sums positive
    assert (fb >= 0).all() and (fb.sum(axis=1) > 0).all()
    # mid-band FFT bins are covered by at least one triangle
    covered = fb.sum(axis=0)
    lo_bin = int(513 * 100 / SR)
    hi_bin = int(513 * 7000 / SR)
    assert (covered[lo_bin:hi_bin] > 0).all()


def test_tone_energy_lands_in_its_mel_bin():
    t = np.arange(SR) / SR
    for f in (300.0, 1000.0, 4000.0):
        x = np.round(8000 * np.sin(2 * np.pi * f * t)).astype(np.int64)
        q = logmel_frames_q(x, SR)
        fb = mel_filterbank(SR)
        fft_bin = int(round(f * 512 / SR))
        expected = np.argmax(fb[:, fft_bin])
        got = int(np.argmax(q.mean(axis=0)))
        assert abs(got - expected) <= 1, f


def test_kernel_deterministic_and_quantized():
    from jsonschema_spark.sources.clips import _speech_proxy

    x = _speech_proxy(140.0, SR, 1 << 40, 800)
    q1, q2 = logmel_frames_q(x, SR), logmel_frames_q(x, SR)
    assert np.array_equal(q1, q2)
    assert q1.dtype == np.int64 and q1.shape[1] == N_MELS
    # expected frame count for 25/10ms framing
    assert q1.shape[0] == 1 + (SR - 400) // 160


def test_subwindow_and_failures():
    assert logmel_frames_q(np.ones(100, dtype=np.int64), SR).shape == (
        0, N_MELS,
    )
    out = fbank_stats_batch(
        pd.Series([None, b"RIFF1234WAVEbroken"]), pd.Series([SR, SR])
    )
    assert list(out["n_samples"]) == [-1, -1]
    assert out["sum_q"].map(len).tolist() == [0, 0]


def test_fbank_ledger_corpus_verifies(spark):
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.fbank import audio_fbank_stats
    from jsonschema_spark.sources.clips import (
        FBANK_CLASS_MOD,
        synth_fbank_clips,
    )

    clips = synth_fbank_clips(spark, 4 * FBANK_CLASS_MOD)
    prof = clips.select(
        "_row_idx", "_sumq", "_sumsqq", "_nfr", "_n",
        audio_fbank_stats("bytes", "sr_hz").alias("p"),
    )
    bad = prof.where(
        ~(
            (F.col("p.sum_q") == F.col("_sumq"))
            & (F.col("p.sumsq_q") == F.col("_sumsqq"))
            & (F.col("p.n_frames") == F.col("_nfr"))
            & (F.col("p.n_samples") == F.col("_n"))
        )
    ).count()
    assert bad == 0
    torn = clips.where(F.col("_row_idx") % FBANK_CLASS_MOD == 3)
    assert torn.where(F.size("_sumq") != 0).count() == 0


def test_cmvn_is_partitioning_invariant(spark):
    """The design claim: int64 partials make corpus CMVN bit-identical
    under ANY repartitioning (a float sum would drift in the last
    bits and break reproducibility at 1000 executors)."""
    from jsonschema_spark.functions.fbank import cmvn_stats
    from jsonschema_spark.sources.clips import synth_fbank_clips

    clips = synth_fbank_clips(spark, 24, partitions=4).persist()
    a = sorted(tuple(r) for r in cmvn_stats(clips).collect())
    b = sorted(
        tuple(r) for r in cmvn_stats(clips.repartition(13)).collect()
    )
    c = sorted(
        tuple(r) for r in cmvn_stats(clips.coalesce(1)).collect()
    )
    clips.unpersist()
    assert a == b == c  # bit-equal, not approximately equal
    assert len(a) == N_MELS
    # stds are positive for a mixed corpus
    assert all(row[3] > 0 for row in a)


def test_cmvn_matches_numpy_reference(spark):
    """End-to-end CMVN equals a single-machine numpy replay of the
    same quantized kernel over the same clips."""
    from jsonschema_spark.functions.fbank import cmvn_stats
    from jsonschema_spark.sources.clips import synth_fbank_clips

    clips = synth_fbank_clips(spark, 12, partitions=3)
    rows = clips.select("bytes", "sr_hz").collect()
    from jsonschema_spark.functions.audio import decode_payload

    tot = np.zeros(N_MELS, dtype=np.int64)
    tot2 = np.zeros(N_MELS, dtype=np.int64)
    n = 0
    for r in rows:
        try:
            pcm = decode_payload(bytes(r["bytes"]))
        except ValueError:
            continue
        q = logmel_frames_q(pcm, r["sr_hz"])
        tot += q.sum(axis=0)
        tot2 += (q * q).sum(axis=0)
        n += q.shape[0]
    got = {
        r["bin"]: (r["n_frames"], r["mean_logmel"], r["std_logmel"])
        for r in cmvn_stats(clips).collect()
    }
    for b in range(N_MELS):
        mean = float(tot[b]) / FBANK_Q / n
        ex2 = float(tot2[b]) / (FBANK_Q * FBANK_Q) / n
        std = np.sqrt(max(ex2 - mean * mean, 0.0))
        assert got[b][0] == n
        assert got[b][1] == pytest.approx(mean, rel=1e-12)
        assert got[b][2] == pytest.approx(std, rel=1e-12)


def test_fbank_matrix_ledger_and_layout(spark):
    """The flattened tensor UDF matches the ledger element-for-element
    and the row-major layout convention (pos = frame*N_MELS + mel)."""
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.fbank import audio_fbank_matrix
    from jsonschema_spark.sources.clips import synth_fbank_mat_clips

    clips = synth_fbank_mat_clips(spark, 8, partitions=2)
    prof = clips.select(
        "_row_idx", "_mat", "_nfr", "_n", "bytes", "sr_hz",
        audio_fbank_matrix("bytes", "sr_hz").alias("p"),
    )
    rows = prof.collect()
    assert len(rows) == 8
    from jsonschema_spark.functions.audio import decode_payload

    for r in rows:
        assert list(r["p"]["mat_q"]) == list(r["_mat"]), r["_row_idx"]
        assert r["p"]["n_frames"] == r["_nfr"]
        assert len(r["_mat"]) == r["_nfr"] * N_MELS
        if r["_nfr"] > 0:
            pcm = decode_payload(bytes(r["bytes"]))
            q = logmel_frames_q(pcm, r["sr_hz"])
            assert list(q.reshape(-1)) == list(r["_mat"])


# ---------------------------------------------------------------------------
# Delta / delta-delta numerators (JVM algebra vs numpy reference)
# ---------------------------------------------------------------------------


def _delta_brute(q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Raw per-(t,m) loop spelling of the regression numerators —
    independent of both implementations under test."""
    T_, M = q.shape
    d = np.zeros_like(q)
    for t in range(T_):
        for m in range(M):
            for k in (1, 2):
                d[t, m] += k * (
                    q[min(t + k, T_ - 1), m] - q[max(t - k, 0), m]
                )
    dd = np.zeros_like(q)
    for t in range(T_):
        for m in range(M):
            for j in (1, 2):
                dd[t, m] += j * (
                    d[min(t + j, T_ - 1), m] - d[max(t - j, 0), m]
                )
    return d, dd


def test_delta_np_matches_brute():
    from jsonschema_spark.functions.fbank import delta_features_np

    rng = np.random.default_rng(7)
    q = rng.integers(-9000, 3000, size=(11, 5)).astype(np.int64)
    d, dd = delta_features_np(q)
    bd, bdd = _delta_brute(q)
    assert (d == bd).all() and (dd == bdd).all()


def test_delta_constant_and_ramp_anchors():
    from jsonschema_spark.functions.fbank import delta_features_np

    # constant matrix -> zero deltas everywhere
    q = np.full((6, 3), 1234, dtype=np.int64)
    d, dd = delta_features_np(q)
    assert (d == 0).all() and (dd == 0).all()
    # linear ramp in t -> interior delta numerator = 10*slope
    # (denominator 10: true delta == slope), interior dd = 0
    slope = 7
    q = (slope * np.arange(12))[:, None] * np.ones((1, 3), dtype=np.int64)
    d, dd = delta_features_np(q.astype(np.int64))
    assert (d[2:-2] == 10 * slope).all()
    # d deviates only within 2 frames of each edge, so dd (a second
    # clamped regression) is zero once 4 frames from either edge
    assert (dd[4:-4] == 0).all()


def test_delta_spark_matches_numpy(spark):
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from jsonschema_spark.functions.fbank import (
        delta_features,
        delta_features_np,
    )

    rng = np.random.default_rng(11)
    rows = []
    for i, nfr in enumerate([1, 2, 3, 9, 17]):
        q = rng.integers(-9000, 3000, size=(nfr, 4)).astype(np.int64)
        rows.append((f"c{i}", [int(v) for v in q.reshape(-1)], nfr))
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("nfr", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    d_col, dd_col = delta_features("mat_q", "nfr", n_mels=4)
    got = {
        r["clip_id"]: (r["d"], r["dd"])
        for r in df.select(
            "clip_id", d_col.alias("d"), dd_col.alias("dd")
        ).collect()
    }
    for (cid, flat, nfr) in rows:
        q = np.asarray(flat, dtype=np.int64).reshape(nfr, 4)
        ed, edd = delta_features_np(q)
        assert got[cid][0] == ed.reshape(-1).tolist(), cid
        assert got[cid][1] == edd.reshape(-1).tolist(), cid


# ---------------------------------------------------------------------------
# CTC feasibility gate
# ---------------------------------------------------------------------------


def _frames_py(sr: int, dur: int, win_ms: int = 25, hop_ms: int = 10) -> int:
    samples = sr * dur // 1000
    win, hop = sr * win_ms // 1000, sr * hop_ms // 1000
    return 1 + (samples - win) // hop if samples >= win else 0


def test_ctc_feasibility_matches_python(spark):
    import pyspark.sql.types as T

    from jsonschema_spark.functions.fbank import ctc_feasibility

    rows = [
        ("c0", "hello", 16000, 1000),     # plenty of frames
        ("c1", "aaa", 16000, 30),          # 1 frame, needs 3+2=5
        ("c2", "", 16000, 500),            # empty label -> not ok
        ("c3", None, 16000, 500),          # null label -> false, not NULL
        ("c4", "aabbcc", 16000, 24),       # sub-window -> 0 frames
        ("c5", "ab", 8000, 200),
        ("c6", "a", 16000, 100),
        # ADVICE r2: feasibility must see what encode_labels trains on
        ("c7", "ЖЖЖ", 16000, 1000),  # all-OOV -> empty labels -> false
        ("c8", "  A!!A  ", 16000, 40),     # normalized+OOV-dropped = "aa" (repeat)
        ("c9", "Hello   WORLD", 16000, 1000),  # case/ws must not inflate len
    ]
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("transcript", T.StringType()),
            T.StructField("sr_hz", T.IntegerType()),
            T.StructField("dur_ms", T.IntegerType()),
        ]
    )
    out = {
        r["clip_id"]: r
        for r in ctc_feasibility(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    import re

    from jsonschema_spark.operators.labels import DEFAULT_VOCAB

    for cid, txt, sr, dur in rows:
        r = out[cid]
        frames = _frames_py(sr, dur)
        fsub = 1 + (frames - 1) // 4 if frames > 0 else 0
        # the encode_labels walk: normalize, vocab-encode, drop OOV
        norm = re.sub(r"\s+", " ", (txt or "").lower()).strip()
        ids = [
            DEFAULT_VOCAB.index(ch) + 1 for ch in norm if ch in DEFAULT_VOCAB
        ]
        n = len(ids)
        reps = sum(1 for i in range(n - 1) if ids[i] == ids[i + 1])
        assert r["n_frames_meta"] == frames, cid
        assert r["frames_sub"] == fsub, cid
        assert r["label_len"] == n, cid
        assert r["label_repeats"] == reps, cid
        assert r["min_frames"] == n + reps, cid
        expect = n > 0 and fsub >= n + reps
        assert r["ctc_ok"] is expect, cid  # strict boolean, never NULL
    # the ADVICE scenarios, pinned explicitly
    assert out["c7"]["label_len"] == 0 and out["c7"]["ctc_ok"] is False
    assert out["c8"]["label_len"] == 2 and out["c8"]["label_repeats"] == 1
    assert out["c9"]["label_len"] == len("hello world")


# ---------------------------------------------------------------------------
# Per-utterance CMVN normalization
# ---------------------------------------------------------------------------


def test_cmvn_normalize_matches_numpy(spark):
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from jsonschema_spark.functions.fbank import cmvn_normalize

    n_mels = 4
    rng = np.random.default_rng(5)
    rows = []
    for i, nfr in enumerate([1, 3, 20]):
        q = rng.integers(-8000, 4000, size=(nfr, n_mels)).astype(np.int64)
        if i == 1:
            q[:, 2] = 777  # a zero-variance bin
        rows.append(
            (
                f"c{i}",
                [int(v) for v in q.reshape(-1)],
                [int(v) for v in q.sum(axis=0)],
                [int(v) for v in (q * q).sum(axis=0)],
                nfr,
            )
        )
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("sum_q", T.ArrayType(T.LongType())),
            T.StructField("sumsq_q", T.ArrayType(T.LongType())),
            T.StructField("nfr", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = {
        r["clip_id"]: r["x"]
        for r in df.select(
            "clip_id",
            cmvn_normalize(
                "mat_q", "sum_q", "sumsq_q", "nfr", n_mels=n_mels
            ).alias("x"),
        ).collect()
    }
    for cid, flat, sums, sqs, nfr in rows:
        got = out[cid]
        for pos, v in enumerate(flat):
            b = pos % n_mels
            mean = (float(sums[b]) / 1000.0) / float(nfr)
            ex2 = (float(sqs[b]) / 1e6) / float(nfr)
            var = ex2 - mean * mean
            std = np.sqrt(max(var, 0.0))
            want = (float(v) / 1000.0 - mean) / (std if std > 0 else 1.0)
            assert got[pos] == want, (cid, pos)  # BIT-equal, not approx
        # zero-variance bin centers to exactly 0.0
        if cid == "c1":
            for t in range(nfr):
                assert got[t * n_mels + 2] == 0.0


def test_one_hop_tensors_equal_jvm_algebra(spark):
    """The vectorized one-hop kernel (audio_train_tensors) and the
    JVM Column-algebra derive path (delta_features + spec_augment +
    cmvn_normalize over the stored matrix) are BIT-equal on every
    array — integers and doubles — across the ledger corpus, torn
    class included."""
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.fbank import (
        audio_fbank_full,
        audio_train_tensors,
        cmvn_normalize,
        delta_features,
    )
    from jsonschema_spark.operators.augment import spec_augment
    from jsonschema_spark.sources.clips import synth_fbank_mat_clips

    clips = synth_fbank_mat_clips(spark, 12, partitions=3).persist()
    one = clips.select(
        "clip_id",
        audio_train_tensors("clip_id", "bytes", "sr_hz", seed="ep0")
        .alias("s"),
    ).select("clip_id", "s.mat_q", "s.delta_q", "s.ddelta_q",
             "s.aug_q", "s.x", "s.n_frames")
    base = clips.select(
        "clip_id", audio_fbank_full("bytes", "sr_hz").alias("s")
    ).select(
        "clip_id",
        F.col("s.mat_q").alias("mat_q"),
        F.col("s.sum_q").alias("sum_q"),
        F.col("s.sumsq_q").alias("sumsq_q"),
        F.col("s.n_frames").alias("n_frames"),
    )
    d, dd = delta_features("mat_q", "n_frames")
    jvm = spec_augment(base, seed="ep0").withColumns(
        {
            "delta_q": d,
            "ddelta_q": dd,
            "x": cmvn_normalize("mat_q", "sum_q", "sumsq_q", "n_frames"),
        }
    )
    a = {r["clip_id"]: r for r in one.collect()}
    b = {r["clip_id"]: r for r in jvm.collect()}
    assert set(a) == set(b) and len(a) == 12
    for cid in a:
        for col in ("mat_q", "delta_q", "ddelta_q", "aug_q", "x",
                    "n_frames"):
            assert a[cid][col] == b[cid][col], (cid, col)
    clips.unpersist()


# ---------------------------------------------------------------------------
# MFCC (quantized-coefficient DCT-II)
# ---------------------------------------------------------------------------


def test_mfcc_spark_matches_numpy(spark):
    import pyspark.sql.types as T

    from jsonschema_spark.functions.fbank import N_CEPS, mfcc_np, mfcc_q

    rng = np.random.default_rng(17)
    rows = []
    for i, nfr in enumerate([0, 1, 7]):
        q = rng.integers(-9000, 3000, size=(nfr, 40)).astype(np.int64)
        rows.append((f"c{i}", [int(v) for v in q.reshape(-1)], nfr))
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("nfr", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["clip_id"]: r["cep"]
        for r in df.select(
            "clip_id", mfcc_q("mat_q", "nfr").alias("cep")
        ).collect()
    }
    for cid, flat, nfr in rows:
        q = np.asarray(flat, dtype=np.int64).reshape(nfr, 40)
        want = mfcc_np(q).reshape(-1).tolist()
        assert got[cid] == want, cid
        assert len(got[cid]) == nfr * N_CEPS


def test_mfcc_dc_anchor():
    """A constant log-mel frame concentrates in c0: the quantized
    basis rows for k>0 sum to ~0 (rounding residual only), so their
    cepstra are tiny relative to c0."""
    from jsonschema_spark.functions.fbank import mfcc_np

    q = np.full((1, 40), 5000, dtype=np.int64)
    cep = mfcc_np(q)[0]
    assert cep[0] > 10**9  # 5000 * 40 * sqrt(1/40)*2^20
    assert all(abs(c) <= 5000 * 40 for c in cep[1:])  # rounding only


def test_ctc_suite_check_and_suggest(spark):
    """Suite integration: the ctc_feasible check bounds the infeasible
    fraction; suggest drafts it anchored to the measured rate
    (must-pass-on-draft-data) whenever transcript + dur_ms exist."""
    import pyspark.sql.types as T

    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )
    from jsonschema_spark.operators.suite import run_suite

    rows = [
        # 3 feasible (long clips, short labels), 1 infeasible
        ("c0", b"\x00" * 64, 16000, 2000, "pcm_s16le", "hello there"),
        ("c1", b"\x00" * 64, 16000, 1500, "pcm_s16le", "ok"),
        ("c2", b"\x00" * 64, 16000, 3000, "pcm_s16le", "fine words"),
        ("c3", b"\x00" * 64, 16000, 40, "pcm_s16le",
         "much too long a label for four frames"),
    ]
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("sr_hz", T.IntegerType()),
            T.StructField("dur_ms", T.IntegerType()),
            T.StructField("codec", T.StringType()),
            T.StructField("transcript", T.StringType()),
        ]
    )
    clips = spark.createDataFrame(rows, schema)
    cfg = {
        "checks": [
            {"name": "ctc", "type": "ctc_feasible", "table": "clips",
             "max_violation_rate": 0.0},
            {"name": "ctc_loose", "type": "ctc_feasible",
             "table": "clips", "max_violation_rate": 0.25},
        ]
    }
    rep = {
        r["check_name"]: r
        for r in run_suite({"clips": clips}, cfg).collect()
    }
    assert rep["ctc"]["status"] == "fail"
    assert rep["ctc_loose"]["status"] == "pass"
    assert abs(rep["ctc"]["metric"] - 0.25) < 1e-9

    drafted = as_suite_config(
        clips, column_suggestions(clips, ["clip_id", "sr_hz"]),
        table="clips",
    )
    ctc = [c for c in drafted["checks"] if c["type"] == "ctc_feasible"]
    assert len(ctc) == 1
    assert ctc[0]["max_violation_rate"] >= 0.25
    rep2 = run_suite({"clips": clips}, {"checks": ctc}).collect()
    assert rep2[0]["status"] == "pass"


# ---------------------------------------------------------------------------
# Corpus CMVN apply + frame stacking
# ---------------------------------------------------------------------------


def test_corpus_cmvn_apply_matches_python(spark):
    import pyspark.sql.types as T

    from jsonschema_spark.functions.fbank import (
        cmvn_normalize_with,
        corpus_cmvn_arrays,
    )

    n_mels = 3
    rng = np.random.default_rng(21)
    rows = []
    for i, nfr in enumerate([2, 5]):
        q = rng.integers(-5000, 5000, size=(nfr, n_mels)).astype(np.int64)
        rows.append(
            (
                f"c{i}",
                [int(v) for v in q.reshape(-1)],
                [int(v) for v in q.sum(axis=0)],
                [int(v) for v in (q * q).sum(axis=0)],
                nfr,
            )
        )
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("sum_q", T.ArrayType(T.LongType())),
            T.StructField("sumsq_q", T.ArrayType(T.LongType())),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(rows, schema).persist()
    mean, std = corpus_cmvn_arrays(df, n_mels=n_mels)
    # driver stats equal a plain numpy reduction in the same op order
    tot = np.zeros(n_mels, dtype=np.int64)
    tot2 = np.zeros(n_mels, dtype=np.int64)
    n = 0
    for _, flat, _, _, nfr in rows:
        q = np.asarray(flat, dtype=np.int64).reshape(nfr, n_mels)
        tot += q.sum(axis=0)
        tot2 += (q * q).sum(axis=0)
        n += nfr
    for b in range(n_mels):
        m = (float(tot[b]) / 1000.0) / float(n)
        ex2 = (float(tot2[b]) / 1e6) / float(n)
        assert mean[b] == m
        assert std[b] == np.sqrt(max(ex2 - m * m, 0.0))
    out = {
        r["clip_id"]: r["xg"]
        for r in df.select(
            "clip_id",
            cmvn_normalize_with("mat_q", mean, std, n_mels=n_mels)
            .alias("xg"),
        ).collect()
    }
    for cid, flat, *_ in rows:
        for pos, v in enumerate(flat):
            b = pos % n_mels
            s = std[b] if std[b] > 0 else 1.0
            assert out[cid][pos] == (float(v) / 1000.0 - mean[b]) / s
    df.unpersist()


def test_stack_frames_gather(spark):
    import pyspark.sql.types as T

    from jsonschema_spark.functions.fbank import stack_frames

    n_mels = 2
    rows = []
    for i, nfr in enumerate([0, 1, 4, 7]):
        q = np.arange(nfr * n_mels, dtype=np.int64) + 100 * i
        rows.append((f"c{i}", [int(v) for v in q], nfr))
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("nfr", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = {
        r["clip_id"]: r["st"]
        for r in df.select(
            "clip_id",
            stack_frames(
                "mat_q", "nfr", stack=3, stride=2, n_mels=n_mels
            ).alias("st"),
        ).collect()
    }
    for cid, flat, nfr in rows:
        q = np.asarray(flat, dtype=np.int64).reshape(nfr, n_mels)
        t_out = -(-nfr // 2) if nfr else 0
        want = []
        for i in range(t_out):
            for j in range(3):
                src = min(i * 2 + j, nfr - 1)
                want.extend(q[src].tolist())
        assert list(out[cid]) == want, cid
        assert len(out[cid]) == t_out * 3 * n_mels


def test_grid_round_matches_duckdb_everywhere(spark):
    """grid_round and its SQL spelling are bit-identical across engines
    for positives, negatives, ties and NULL — the property round(double,n)
    lacks (the r2 reconcile driver failure)."""
    import duckdb
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.grid import grid_round, grid_round_sql

    vals = [0.1234565, -0.1234565, 0.0000005, -0.0000005, 1.5e-7,
            123456.789125, -3.0000015, 0.9999995, None, 0.0, -0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r["g"] for r in df.select(
        grid_round(F.col("v"), 6).alias("g")).collect()]
    con = duckdb.connect()
    want = [con.execute(
        f"SELECT {grid_round_sql('?::DOUBLE', 6)}", [v]).fetchone()[0]
        for v in vals]
    assert got == want
