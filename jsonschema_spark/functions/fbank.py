"""Log-mel filterbank features + corpus CMVN — the bridge from
validation to training-data production, in pure numpy (no audio libs).

Every speech model consumes log-mel energies, and every training run
needs corpus-level cepstral mean/variance normalization (CMVN) stats.
Both are computed here with the scale shape a 100 TB corpus demands:

  per clip (ONE Arrow hop)   25 ms / 10 ms Hann frames, rfft power,
                             HTK mel triangle bank (40 mels,
                             20-7600 Hz), log10 with a 1e-10 floor —
                             then QUANTIZED to fixed point
                             (floor(v*1000 + 0.5), int64 millis) and
                             reduced to per-bin SUM and SUM-OF-SQUARES
                             plus the frame count. The quantization is
                             the whole trick: int64 partials make the
                             cross-clip aggregation EXACT and
                             order-independent, so the corpus CMVN is
                             bit-reproducible on any partitioning AND
                             DuckDB-oracle-checkable (float sums are
                             order-dependent; integer sums are not).
                             Overflow headroom: sumsq at 1e9 frames
                             (~100k h of audio) is ~1.3e17 << 2^63.
  corpus CMVN (JVM side)     arrays_zip + posexplode -> groupBy(bin)
                             -> SUM(long) -> final mean/std in
                             correctly-rounded double ops only
                             (cast, /, *, -, sqrt — the float-oracle
                             whitelist), bit-equal to the DuckDB
                             replay of the same ledger integers.

Scale shape: one Arrow hop per clip; the CMVN shuffle is
O(clips x n_mels) skinny long rows -> n_mels output rows.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame

from jsonschema_spark.functions.audio import decode_payload

__all__ = [
    "mel_filterbank",
    "logmel_frames_q",
    "fbank_stats_batch",
    "audio_fbank_stats",
    "cmvn_stats",
    "FBANK_STATS_TYPE",
    "N_MELS",
    "FBANK_Q",
]

N_MELS = 40
FBANK_Q = 1000  # fixed-point scale: log-mel millis
_N_FFT = 512
_WIN_MS = 25
_HOP_MS = 10
_FMIN_HZ = 20.0
_FMAX_HZ = 7600.0
_POWER_FLOOR = 1e-10

FBANK_STATS_TYPE = T.StructType(
    [
        T.StructField("sum_q", T.ArrayType(T.LongType())),
        T.StructField("sumsq_q", T.ArrayType(T.LongType())),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def _mel(f: np.ndarray | float) -> np.ndarray | float:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _imel(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(
    sr: int,
    n_fft: int = _N_FFT,
    n_mels: int = N_MELS,
    fmin: float = _FMIN_HZ,
    fmax: float = _FMAX_HZ,
) -> np.ndarray:
    """(n_mels, n_fft//2+1) HTK-style triangular mel bank (the classic
    floor((n_fft+1)*f/sr) bin mapping)."""
    fmax = min(fmax, sr / 2.0)
    pts = _imel(np.linspace(_mel(fmin), _mel(fmax), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for j in range(n_mels):
        a, b, c = bins[j], bins[j + 1], bins[j + 2]
        for i in range(a, b):
            fb[j, i] = (i - a) / max(1, b - a)
        for i in range(b, c):
            fb[j, i] = (c - i) / max(1, c - b)
    return fb


_FB_CACHE: dict[int, np.ndarray] = {}


def _bank(sr: int) -> np.ndarray:
    fb = _FB_CACHE.get(sr)
    if fb is None:
        fb = _FB_CACHE[sr] = mel_filterbank(sr)
    return fb


def logmel_frames_q(pcm: np.ndarray, sr: int) -> np.ndarray:
    """(n_frames, N_MELS) int64 fixed-point (millis) log-mel matrix —
    shared by the batch kernel, the synth ledger and unit tests."""
    win = sr * _WIN_MS // 1000
    hop = sr * _HOP_MS // 1000
    n = len(pcm)
    k = 1 + (n - win) // hop if n >= win else 0
    if k <= 0:
        return np.zeros((0, N_MELS), dtype=np.int64)
    idx = np.arange(win)[None, :] + hop * np.arange(k)[:, None]
    fr = pcm[idx].astype(np.float64) * np.hanning(win)
    spec = np.fft.rfft(fr, _N_FFT, axis=1)
    power = spec.real * spec.real + spec.imag * spec.imag
    m = power @ _bank(sr).T
    v = np.log10(np.maximum(m, _POWER_FLOOR))
    return np.floor(v * FBANK_Q + 0.5).astype(np.int64)


def fbank_stats_batch(payloads: pd.Series, srs: pd.Series) -> pd.DataFrame:
    sums: list[list[int]] = []
    sqs: list[list[int]] = []
    kf = np.zeros(len(payloads), dtype=np.int64)
    ns = np.full(len(payloads), -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (
            isinstance(sr, float) and np.isnan(sr)
        ):
            sums.append([])
            sqs.append([])
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            sums.append([])
            sqs.append([])
            continue
        ns[i] = len(pcm)
        q = logmel_frames_q(pcm, int(sr))
        kf[i] = q.shape[0]
        if q.shape[0] == 0:
            sums.append([])
            sqs.append([])
        else:
            sums.append(q.sum(axis=0).tolist())
            sqs.append((q * q).sum(axis=0).tolist())
    return pd.DataFrame(
        {
            "sum_q": sums,
            "sumsq_q": sqs,
            "n_frames": kf.astype(np.int32),
            "n_samples": ns,
        }
    )


@F.pandas_udf(FBANK_STATS_TYPE)
def _fbank_udf(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
    return fbank_stats_batch(p, sr)


def audio_fbank_stats(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
) -> Column:
    """struct(sum_q, sumsq_q, n_frames, n_samples) — ONE Arrow hop.
    Undecodable / sub-window clips carry EMPTY arrays and n_frames 0
    (they contribute nothing to CMVN and explode to no feature
    rows)."""
    return _fbank_udf(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def cmvn_stats(
    df: DataFrame,
    payload: str = "bytes",
    sr_hz: str = "sr_hz",
) -> DataFrame:
    """Corpus CMVN: (bin, n_frames, mean_logmel, std_logmel) — one
    Arrow hop per clip, then an EXACT int64 aggregation (bit-equal on
    any partitioning) and final double math restricted to
    correctly-rounded ops so a DuckDB replay matches bit-for-bit."""
    s = audio_fbank_stats(payload, sr_hz)
    z = df.select(s.alias("s")).select(
        F.posexplode(F.arrays_zip("s.sum_q", "s.sumsq_q")).alias(
            "bin", "z"
        ),
        F.col("s.n_frames").alias("nf"),
    )
    agg = z.groupBy("bin").agg(
        F.sum("nf").alias("n_frames"),
        F.sum("z.sum_q").alias("tot_q"),
        F.sum("z.sumsq_q").alias("tot_sq"),
    )
    n = agg["n_frames"].cast("double")
    mean = agg["tot_q"].cast("double") / F.lit(float(FBANK_Q)) / n
    ex2 = (
        agg["tot_sq"].cast("double")
        / F.lit(float(FBANK_Q * FBANK_Q))
        / n
    )
    var = ex2 - mean * mean
    return agg.select(
        "bin",
        "n_frames",
        mean.alias("mean_logmel"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("std_logmel"),
    )


FBANK_MATRIX_TYPE = T.StructType(
    [
        T.StructField("mat_q", T.ArrayType(T.LongType())),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def fbank_matrix_batch(payloads: pd.Series, srs: pd.Series) -> pd.DataFrame:
    """Per-clip FLATTENED quantized log-mel matrix (row-major
    frame x mel, int64 millis) — the actual training input tensor;
    empty for undecodable / sub-window clips."""
    mats: list[list[int]] = []
    kf = np.zeros(len(payloads), dtype=np.int64)
    ns = np.full(len(payloads), -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (
            isinstance(sr, float) and np.isnan(sr)
        ):
            mats.append([])
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            mats.append([])
            continue
        ns[i] = len(pcm)
        q = logmel_frames_q(pcm, int(sr))
        kf[i] = q.shape[0]
        mats.append(q.reshape(-1).tolist())
    return pd.DataFrame(
        {
            "mat_q": mats,
            "n_frames": kf.astype(np.int32),
            "n_samples": ns,
        }
    )


@F.pandas_udf(FBANK_MATRIX_TYPE)
def _fbank_matrix_udf(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
    return fbank_matrix_batch(p, sr)


def audio_fbank_matrix(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
) -> Column:
    """struct(mat_q, n_frames, n_samples) — the full per-frame feature
    tensor, ONE Arrow hop; mat_q is row-major (frame, mel) flattened
    so pos -> (pos div N_MELS, pos mod N_MELS)."""
    return _fbank_matrix_udf(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


# ---------------------------------------------------------------------------
# Delta / delta-delta features — derived from the STORED quantized matrix
# ---------------------------------------------------------------------------

DELTA_N = 2  # regression half-window (the Kaldi/HTK default)
DELTA_DENOM = 2 * sum(k * k for k in range(1, DELTA_N + 1))  # = 10


def _clamp_frame(t: Column, n_frames: Column) -> Column:
    """Edge-replicating frame clamp to [0, n_frames-1] (HTK/Kaldi
    boundary convention for the delta regression)."""
    return F.greatest(F.lit(0), F.least(t, n_frames - F.lit(1)))


def _delta_num_at(
    mat: Column, t: Column, m: Column, n_frames: Column, n_mels: int
) -> Column:
    """Int64 delta NUMERATOR at (frame t, mel m) over a flattened
    row-major matrix attribute:

        num[t,m] = sum_{k=1..N} k * (q[min(t+k,T-1),m] - q[max(t-k,0),m])

    The true delta is num / DELTA_DENOM; keeping the numerator integer
    keeps the whole feature chain exact and cross-engine checkable."""
    total: Column | None = None
    for k in range(1, DELTA_N + 1):
        up = F.element_at(
            mat,
            (_clamp_frame(t + F.lit(k), n_frames) * F.lit(n_mels)
             + m + F.lit(1)).cast("int"),
        )
        dn = F.element_at(
            mat,
            (_clamp_frame(t - F.lit(k), n_frames) * F.lit(n_mels)
             + m + F.lit(1)).cast("int"),
        )
        term = F.lit(k).cast("long") * (up - dn)
        total = term if total is None else total + term
    return total


def delta_features(
    mat_col: str, n_frames_col: str, n_mels: int = N_MELS
) -> tuple[Column, Column]:
    """(delta_num, ddelta_num) int64 array columns over a MATERIALIZED
    flattened quantized log-mel matrix — pure Column algebra, no decode
    pass, no Python: deltas for a 100 TB corpus are derived from the
    already-written feature parquet (one scan, zero shuffles) instead
    of re-decoding payloads.

    True values: delta = delta_num / 10, delta-delta = ddelta_num / 100
    (DELTA_DENOM and its square); both divisions are single
    correctly-rounded IEEE ops, so the doubles are oracle-safe too.

    The delta-delta is the regression-of-the-regression with the SAME
    edge-replication clamp, expanded in closed form against the matrix
    attribute (16 element_at per element) rather than materializing the
    intermediate delta array — project collapsing would otherwise
    inline the whole first transform into every element_at of the
    second (the nested-rewrite blowup documented in CLAUDE.md).

    ``mat_col``/``n_frames_col`` MUST name plain attributes (HOF
    lambdas re-evaluate non-lambda subexpressions per element)."""
    mat = F.col(mat_col)
    nfr = F.col(n_frames_col)

    def _d(v: Column, pos: Column) -> Column:
        t = F.floor(pos / F.lit(n_mels)).cast("int")
        m = F.pmod(pos, F.lit(n_mels))
        return _delta_num_at(mat, t, m, nfr, n_mels)

    def _dd(v: Column, pos: Column) -> Column:
        t = F.floor(pos / F.lit(n_mels)).cast("int")
        m = F.pmod(pos, F.lit(n_mels))
        total: Column | None = None
        for j in range(1, DELTA_N + 1):
            up = _delta_num_at(
                mat, _clamp_frame(t + F.lit(j), nfr), m, nfr, n_mels
            )
            dn = _delta_num_at(
                mat, _clamp_frame(t - F.lit(j), nfr), m, nfr, n_mels
            )
            term = F.lit(j).cast("long") * (up - dn)
            total = term if total is None else total + term
        return total

    return F.transform(mat, _d), F.transform(mat, _dd)


def delta_features_np(q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reference numpy implementation of the SAME integer numerators
    over a (n_frames, n_mels) int64 matrix — unit-test pin."""
    T_, _ = q.shape
    d = np.zeros_like(q)
    for k in range(1, DELTA_N + 1):
        up = q[np.minimum(np.arange(T_) + k, T_ - 1)]
        dn = q[np.maximum(np.arange(T_) - k, 0)]
        d += k * (up - dn)
    dd = np.zeros_like(q)
    for j in range(1, DELTA_N + 1):
        up = d[np.minimum(np.arange(T_) + j, T_ - 1)]
        dn = d[np.maximum(np.arange(T_) - j, 0)]
        dd += j * (up - dn)
    return d, dd


# ---------------------------------------------------------------------------
# CTC feasibility — can (features, transcript) pairs train at all?
# ---------------------------------------------------------------------------


def frames_from_metadata(
    sr_col: Column | str = "sr_hz", dur_col: Column | str = "dur_ms"
) -> Column:
    """Feature-frame count implied by the METADATA alone (the 25/10 ms
    framing this module extracts): samples = sr*dur//1000, frames =
    1 + (samples - win)//hop for samples >= win else 0. Pure integer
    Column arithmetic — no decode, no Python — so a 10^12-row
    feasibility sweep is scan-speed. Pair with the payload-integrity
    checks when the metadata itself is suspect; products < 2^52 keep
    the floor-division exact."""
    sr = (F.col(sr_col) if isinstance(sr_col, str) else sr_col).cast("long")
    dur = (F.col(dur_col) if isinstance(dur_col, str) else dur_col).cast(
        "long"
    )
    samples = F.floor(sr * dur / F.lit(1000)).cast("long")
    win = F.floor(sr * F.lit(_WIN_MS) / F.lit(1000)).cast("long")
    hop = F.floor(sr * F.lit(_HOP_MS) / F.lit(1000)).cast("long")
    return F.when(
        samples >= win,
        F.lit(1) + F.floor((samples - win) / hop).cast("long"),
    ).otherwise(F.lit(0).cast("long"))


def ctc_feasibility(
    df: DataFrame,
    transcript_col: str = "transcript",
    sr_col: str = "sr_hz",
    dur_col: str = "dur_ms",
    subsample: int = 4,
    vocab: str | None = None,
) -> DataFrame:
    """CTC trainability gate: a (features, label) pair is only usable if
    the subsampled frame count can emit the label under CTC's blank
    rule — T_sub >= label_len + adjacent_repeats (each adjacent equal
    label pair needs a blank between emissions). Clips failing this are
    undecodable loss terms (infinite loss / skipped batches) that a
    100 TB curation pass must drop BEFORE feature extraction, which is
    why everything here is metadata-only integer Column arithmetic:
    frames from (sr, dur), char labels from the transcript, zero decode
    and zero Python.

    Label statistics come from the SAME normalize + vocabulary walk
    ``labels.encode_labels`` trains on (lowercase/collapse-ws/trim,
    then 1-based ``instr`` positions with OOV chars dropped) — NOT the
    raw transcript. The distinction matters: an all-OOV transcript
    (non-Latin text vs a char vocab) has a truly EMPTY label sequence
    and must gate ctc_ok=false, and raw uppercase/whitespace must not
    inflate min_frames. ``label_repeats`` counts adjacent equal IDS in
    the OOV-dropped sequence (what the loss actually sees).

    ``subsample`` models the encoder's time reduction (the usual conv
    front end): T_sub = 1 + (T-1)//subsample for T > 0. ``vocab``
    defaults to ``labels.DEFAULT_VOCAB``.

    Appends: n_frames_meta, frames_sub, label_len, label_repeats,
    min_frames, ctc_ok. NULL/empty/all-OOV transcripts and unframeable
    clips get ctc_ok = false (never NULL)."""
    from jsonschema_spark.operators.labels import DEFAULT_VOCAB
    from jsonschema_spark.operators.text import normalize

    if vocab is None:
        vocab = DEFAULT_VOCAB
    frames = frames_from_metadata(sr_col, dur_col)
    base = df.withColumn("_ctc_norm", normalize(F.col(transcript_col)))
    s = F.col("_ctc_norm")
    n = F.length(s)
    # the encode_labels walk: 1-based vocab positions, OOV (0) dropped.
    # sequence(1, 0) DESCENDS — gate empty strings before building it.
    raw = F.when(
        F.coalesce(n, F.lit(0)) < 1, F.array().cast("array<int>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.instr(F.lit(vocab), s.substr(i, F.lit(1))).cast(
                "int"
            ),
        )
    )
    base = base.withColumn("_ctc_ids", F.filter(raw, lambda v: v > 0))
    ids = F.col("_ctc_ids")
    m = F.size(ids)
    # adjacent equal id pairs: zip ids with ids[2:]; the trailing
    # element pairs with NULL -> NULL == x is NULL -> coalesce false.
    repeats = F.when(m < 2, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.zip_with(
                    ids,
                    F.slice(ids, 2, F.greatest(m - 1, F.lit(1))),
                    lambda a, b: a == b,
                ),
                lambda v: F.coalesce(v, F.lit(False)),
            )
        )
    )
    out = (
        base.withColumn("n_frames_meta", frames)
        .withColumn(
            "frames_sub",
            F.when(
                F.col("n_frames_meta") > 0,
                F.lit(1)
                + F.floor(
                    (F.col("n_frames_meta") - 1) / F.lit(subsample)
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn("label_len", m)
        .withColumn("label_repeats", repeats)
        .withColumn(
            "min_frames",
            (F.col("label_len") + F.col("label_repeats")).cast("long"),
        )
    )
    return out.withColumn(
        "ctc_ok",
        F.coalesce(
            (F.col("label_len") > 0)
            & (F.col("frames_sub") >= F.col("min_frames")),
            F.lit(False),
        ),
    ).drop("_ctc_norm", "_ctc_ids")


FBANK_FULL_TYPE = T.StructType(
    [
        T.StructField("mat_q", T.ArrayType(T.LongType())),
        T.StructField("sum_q", T.ArrayType(T.LongType())),
        T.StructField("sumsq_q", T.ArrayType(T.LongType())),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def fbank_full_batch(payloads: pd.Series, srs: pd.Series) -> pd.DataFrame:
    """Matrix AND partials from ONE decode+FFT pass — the feature job's
    kernel when both the per-clip tensor and the corpus CMVN are
    wanted (two separate UDFs would decode every payload twice)."""
    mats: list[list[int]] = []
    sums: list[list[int]] = []
    sqs: list[list[int]] = []
    kf = np.zeros(len(payloads), dtype=np.int64)
    ns = np.full(len(payloads), -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (
            isinstance(sr, float) and np.isnan(sr)
        ):
            mats.append([])
            sums.append([])
            sqs.append([])
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            mats.append([])
            sums.append([])
            sqs.append([])
            continue
        ns[i] = len(pcm)
        q = logmel_frames_q(pcm, int(sr))
        kf[i] = q.shape[0]
        mats.append(q.reshape(-1).tolist())
        if q.shape[0] == 0:
            sums.append([])
            sqs.append([])
        else:
            sums.append(q.sum(axis=0).tolist())
            sqs.append((q * q).sum(axis=0).tolist())
    return pd.DataFrame(
        {
            "mat_q": mats,
            "sum_q": sums,
            "sumsq_q": sqs,
            "n_frames": kf.astype(np.int32),
            "n_samples": ns,
        }
    )


@F.pandas_udf(FBANK_FULL_TYPE)
def _fbank_full_udf(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
    return fbank_full_batch(p, sr)


def audio_fbank_full(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
) -> Column:
    """struct(mat_q, sum_q, sumsq_q, n_frames, n_samples) — tensor and
    partials in ONE Arrow hop."""
    return _fbank_full_udf(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def cmvn_normalize(
    mat_col: str,
    sum_col: str,
    sumsq_col: str,
    n_frames_col: str,
    n_mels: int = N_MELS,
) -> Column:
    """Per-utterance CMVN-normalized feature tensor (array<double>) —
    the value a network actually consumes: x = (q/Q - mean_b) / std_b
    per mel bin, from the SAME row's int64 partials (no join, no
    shuffle, no Python).

    Every float op is in the correctly-rounded IEEE whitelist (cast,
    /, *, -, sqrt) in a FIXED association order — mean_b =
    (sum_b / Q) / T, ex2_b = (sumsq_b / Q^2) / T, var = ex2 - mean^2,
    std = sqrt(max(var, 0)) — so a DuckDB replay of the identical
    expression tree matches bit-for-bit (the gain_normalize lesson:
    exact-op chains make float oracles possible; pow/log/exp would
    not). Zero-variance bins divide by 1.0, which maps their centered
    value to exactly 0.0.

    Column-name args must reference materialized attributes (HOF
    lambda subexpression rule)."""
    mat = F.col(mat_col)
    s = F.col(sum_col)
    ss = F.col(sumsq_col)
    nfr = F.col(n_frames_col).cast("double")
    q = float(FBANK_Q)

    def _norm(v: Column, pos: Column) -> Column:
        b = (F.pmod(pos, F.lit(n_mels)) + F.lit(1)).cast("int")
        mean = F.element_at(s, b).cast("double") / F.lit(q) / nfr
        ex2 = (
            F.element_at(ss, b).cast("double") / F.lit(q * q) / nfr
        )
        var = ex2 - mean * mean
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
        return (v.cast("double") / F.lit(q) - mean) / F.when(
            std > F.lit(0.0), std
        ).otherwise(F.lit(1.0))

    return F.transform(mat, _norm)


# ---------------------------------------------------------------------------
# One-hop training tensors: mat + delta + SpecAugment + CMVN-normalize
# ---------------------------------------------------------------------------

TRAIN_TENSOR_TYPE = T.StructType(
    [
        T.StructField("mat_q", T.ArrayType(T.LongType())),
        T.StructField("delta_q", T.ArrayType(T.LongType())),
        T.StructField("ddelta_q", T.ArrayType(T.LongType())),
        T.StructField("aug_q", T.ArrayType(T.LongType())),
        T.StructField("x", T.ArrayType(T.DoubleType())),
        T.StructField("sum_q", T.ArrayType(T.LongType())),
        T.StructField("sumsq_q", T.ArrayType(T.LongType())),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def _md5_60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def spec_masks_py(
    clip_id: str,
    n_frames: int,
    seed: str = "",
    n_time_masks: int = 2,
    max_t_frames: int = 20,
    n_freq_masks: int = 2,
    max_f_bins: int = 8,
    n_mels: int = N_MELS,
) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """The EXACT SpecAugment draw of operators/augment.spec_augment,
    replayed in Python (md5_60 of 'seed:tag|clip_id') — shared by the
    one-hop tensor kernel, tests, and synth ledgers."""
    tm, fm = [], []
    for i in range(n_time_masks):
        w = _md5_60_py(f"{seed}:tw{i}|{clip_id}") % (max_t_frames + 1)
        s = _md5_60_py(f"{seed}:ts{i}|{clip_id}") % max(
            1, n_frames - w + 1
        )
        tm.append((s, w))
    for i in range(n_freq_masks):
        w = _md5_60_py(f"{seed}:fw{i}|{clip_id}") % (max_f_bins + 1)
        s = _md5_60_py(f"{seed}:fs{i}|{clip_id}") % max(1, n_mels - w + 1)
        fm.append((s, w))
    return tm, fm


def train_tensor_batch(
    clip_ids: pd.Series,
    payloads: pd.Series,
    srs: pd.Series,
    seed: str,
) -> pd.DataFrame:
    """The whole per-clip tensor chain in ONE decode pass, vectorized:
    quantized log-mel matrix, integer delta/delta-delta numerators
    (delta_features_np — bit-equal to the JVM Column algebra, pinned
    by test), SpecAugment-masked matrix (spec_masks_py — the identical
    md5 draw), and the per-utterance CMVN-normalized doubles in the
    same fixed exact-op association order as ``cmvn_normalize``.

    This is the PRODUCTION path when payloads are being decoded anyway
    (the JVM-algebra ops exist for deriving from already-written
    feature parquet without touching payloads): the interpreted HOF
    cost of the derive path (~20 element_at per element) becomes a
    numpy matrix op, at the price of shipping the extra arrays across
    Arrow once."""
    n = len(payloads)
    out = {
        "mat_q": [],
        "delta_q": [],
        "ddelta_q": [],
        "aug_q": [],
        "x": [],
        "sum_q": [],
        "sumsq_q": [],
    }
    kf = np.zeros(n, dtype=np.int64)
    ns = np.full(n, -1, dtype=np.int64)
    for i, (cid, raw, sr) in enumerate(
        zip(clip_ids.tolist(), payloads.tolist(), srs.tolist())
    ):
        q = np.zeros((0, N_MELS), dtype=np.int64)
        if raw is not None and sr is not None and not (
            isinstance(sr, float) and np.isnan(sr)
        ):
            try:
                pcm = decode_payload(bytes(raw))
            except (ValueError, TypeError, struct.error):
                pcm = None
            if pcm is not None:
                ns[i] = len(pcm)
                q = logmel_frames_q(pcm, int(sr))
        kf[i] = q.shape[0]
        d, dd = delta_features_np(q)
        aug = q.copy()
        tmask, fmask = spec_masks_py(str(cid), q.shape[0], seed=seed)
        for s, w in tmask:
            aug[s : s + w, :] = 0
        for s, w in fmask:
            aug[:, s : s + w] = 0
        if q.shape[0]:
            mean = (q.sum(axis=0, dtype=np.int64) / FBANK_Q) / float(
                q.shape[0]
            )
            ex2 = (
                (q.astype(np.int64) ** 2).sum(axis=0, dtype=np.int64)
                / float(FBANK_Q * FBANK_Q)
            ) / float(q.shape[0])
            std = np.sqrt(np.maximum(ex2 - mean * mean, 0.0))
            x = (q / float(FBANK_Q) - mean) / np.where(
                std > 0.0, std, 1.0
            )
        else:
            x = np.zeros((0, N_MELS))
        out["mat_q"].append(q.reshape(-1).tolist())
        out["delta_q"].append(d.reshape(-1).tolist())
        out["ddelta_q"].append(dd.reshape(-1).tolist())
        out["aug_q"].append(aug.reshape(-1).tolist())
        out["x"].append(x.reshape(-1).tolist())
        if q.shape[0]:
            out["sum_q"].append(q.sum(axis=0).tolist())
            out["sumsq_q"].append((q * q).sum(axis=0).tolist())
        else:
            out["sum_q"].append([])
            out["sumsq_q"].append([])
    out["n_frames"] = kf.astype(np.int32)
    out["n_samples"] = ns
    return pd.DataFrame(out)


def audio_train_tensors(
    clip_id: Column | str = "clip_id",
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
    seed: str = "",
) -> Column:
    """struct(mat_q, delta_q, ddelta_q, aug_q, x, n_frames,
    n_samples) — the complete training input in ONE Arrow hop."""

    @F.pandas_udf(TRAIN_TENSOR_TYPE)
    def _udf(c: pd.Series, p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return train_tensor_batch(c, p, sr, seed)

    return _udf(
        F.col(clip_id) if isinstance(clip_id, str) else clip_id,
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


# ---------------------------------------------------------------------------
# MFCC — quantized-coefficient DCT-II over the stored log-mel matrix
# ---------------------------------------------------------------------------

N_CEPS = 13
MFCC_COEF_Q = 1 << 20  # fixed-point scale for the DCT basis


def mfcc_coeffs_q(
    n_ceps: int = N_CEPS,
    n_mels: int = N_MELS,
    scale: int = MFCC_COEF_Q,
) -> list[list[int]]:
    """Orthonormal DCT-II basis rows (k = 0..n_ceps-1, the HTK/Kaldi
    cepstral convention: k=0 carries sqrt(1/M), higher k sqrt(2/M)),
    QUANTIZED to integers (floor(c*scale + 0.5), half-up like every
    fixed-point step here). The quantization is what makes MFCC an
    exact-integer op: the matmul against the int64 log-mel millis
    stays in int64 (|q| ~ 1e4 * |c_q| ~ 2.3e5 * 40 mels ~ 9e10 << 2^63)
    and is therefore bit-reproducible on any engine — the SAME ints
    are inlined into the Spark literal and the DuckDB oracle."""
    rows: list[list[int]] = []
    for k in range(n_ceps):
        a = np.sqrt((1.0 if k == 0 else 2.0) / n_mels)
        row = [
            int(
                np.floor(
                    a
                    * np.cos(np.pi * (m + 0.5) * k / n_mels)
                    * scale
                    + 0.5
                )
            )
            for m in range(n_mels)
        ]
        rows.append(row)
    return rows


def mfcc_q(
    mat_col: str,
    n_frames_col: str,
    n_ceps: int = N_CEPS,
    n_mels: int = N_MELS,
) -> Column:
    """Int64 MFCC numerators over a MATERIALIZED flattened log-mel
    matrix: out[t*n_ceps + k] = sum_m mat[t*n_mels+m] * C_q[k][m]
    (true cepstrum = out / (FBANK_Q * MFCC_COEF_Q)). Pure Column
    algebra — cepstral features for a written feature table without a
    decode pass. The basis is ONE foldable 2-D array literal consumed
    through small HOF lambdas (the PQ-ADC lesson: unrolled literal
    chains blow janino's method limit and re-evaluate under
    interpreted eval; a literal array + aggregate does not)."""
    mat = F.col(mat_col)
    nfr = F.col(n_frames_col)
    coeffs = mfcc_coeffs_q(n_ceps, n_mels)
    c_lit = F.array(
        *[
            F.array(*[F.lit(v).cast("long") for v in row])
            for row in coeffs
        ]
    )

    def _cep(pos: Column) -> Column:
        t = F.floor(pos / F.lit(n_ceps)).cast("int")
        k = F.pmod(pos, F.lit(n_ceps)).cast("int")
        row = F.element_at(c_lit, k + F.lit(1))

        def _fold(acc: Column, m: Column) -> Column:
            return acc + F.element_at(
                mat, (t * F.lit(n_mels) + m + F.lit(1)).cast("int")
            ) * F.element_at(row, (m + F.lit(1)).cast("int"))

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(n_mels - 1)),
            F.lit(0).cast("long"),
            _fold,
        )

    return F.when(
        nfr < 1, F.array().cast("array<long>")
    ).otherwise(
        F.transform(
            F.sequence(
                F.lit(0), nfr.cast("int") * F.lit(n_ceps) - F.lit(1)
            ),
            _cep,
        )
    )


def mfcc_np(q: np.ndarray, n_ceps: int = N_CEPS) -> np.ndarray:
    """Reference numpy replay of the SAME integer matmul."""
    c = np.asarray(mfcc_coeffs_q(n_ceps, q.shape[1] or N_MELS),
                   dtype=np.int64)
    if q.shape[0] == 0:
        return np.zeros((0, n_ceps), dtype=np.int64)
    return q.astype(np.int64) @ c.T


# ---------------------------------------------------------------------------
# Corpus-level CMVN apply + low-frame-rate stacking
# ---------------------------------------------------------------------------


def corpus_cmvn_arrays(
    feats: DataFrame,
    sum_col: str = "sum_q",
    sumsq_col: str = "sumsq_q",
    n_frames_col: str = "n_frames",
    n_mels: int = N_MELS,
) -> tuple[list[float], list[float]]:
    """(mean, std) per bin from a partials frame — the driver-side
    reduction of the corpus CMVN, in the SAME exact-op association
    order as ``cmvn_stats``/DuckDB ((sum/Q)/n, (sumsq/Q²)/n,
    sqrt(max(ex2-mean², 0))): the int64 sums are exact on any
    partitioning and every float op is correctly rounded, so these
    doubles are bit-reproducible and safely inlined as literals."""
    z = feats.select(
        F.posexplode(
            F.arrays_zip(F.col(sum_col), F.col(sumsq_col))
        ).alias("bin", "z"),
        F.col(n_frames_col).alias("nf"),
    )
    rows = (
        z.groupBy("bin")
        .agg(
            F.sum("nf").alias("n"),
            F.sum(f"z.{sum_col}").alias("s"),
            F.sum(f"z.{sumsq_col}").alias("ss"),
        )
        .collect()
    )
    mean = [0.0] * n_mels
    std = [0.0] * n_mels
    for r in rows:
        b, n = r["bin"], float(r["n"])
        m = (float(r["s"]) / float(FBANK_Q)) / n
        ex2 = (float(r["ss"]) / float(FBANK_Q * FBANK_Q)) / n
        v = ex2 - m * m
        mean[b] = m
        std[b] = float(np.sqrt(max(v, 0.0)))
    return mean, std


def cmvn_normalize_with(
    mat_col: str,
    mean: list[float],
    std: list[float],
    n_mels: int = N_MELS,
) -> Column:
    """Corpus-level CMVN apply: normalize every element against
    driver-provided per-bin stats (foldable literal arrays — zero
    joins, zero shuffles; the 40-double broadcast is the expression
    itself). Same exact-op chain as the per-utterance variant, so the
    doubles remain oracle-safe. Zero/absent-variance bins divide by
    1.0."""
    mat = F.col(mat_col)
    mean_lit = F.array(*[F.lit(float(v)) for v in mean])
    std_lit = F.array(*[F.lit(float(v)) for v in std])

    def _norm(v: Column, pos: Column) -> Column:
        b = (F.pmod(pos, F.lit(n_mels)) + F.lit(1)).cast("int")
        m = F.element_at(mean_lit, b)
        s = F.element_at(std_lit, b)
        return (v.cast("double") / F.lit(float(FBANK_Q)) - m) / F.when(
            s > F.lit(0.0), s
        ).otherwise(F.lit(1.0))

    return F.transform(mat, _norm)


def stack_frames(
    mat_col: str,
    n_frames_col: str,
    stack: int = 3,
    stride: int = 3,
    n_mels: int = N_MELS,
) -> Column:
    """Low-frame-rate transform (the transducer/LAS front end): stack
    ``stack`` consecutive frames into one super-frame every ``stride``
    frames, edge-replicating past the end — T_out = ceil(T/stride),
    width = stack*n_mels:

        out[i, j*n_mels + m] = mat[min(i*stride + j, T-1), m]

    Pure Column algebra over the materialized matrix (an index
    gather — the values are untouched int64, so the op is trivially
    exact cross-engine)."""
    mat = F.col(mat_col)
    nfr = F.col(n_frames_col)
    width = stack * n_mels
    t_out = F.floor(
        (nfr.cast("long") + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")

    def _gather(pos: Column) -> Column:
        i = F.floor(pos / F.lit(width)).cast("int")
        r = F.pmod(pos, F.lit(width))
        j = F.floor(r / F.lit(n_mels)).cast("int")
        m = F.pmod(r, F.lit(n_mels))
        src_t = F.least(i * F.lit(stride) + j, nfr - F.lit(1))
        return F.element_at(
            mat, (src_t * F.lit(n_mels) + m + F.lit(1)).cast("int")
        )

    return F.when(
        nfr < 1, F.array().cast("array<long>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), t_out * F.lit(width) - F.lit(1)),
            _gather,
        )
    )
