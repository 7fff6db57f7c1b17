"""ITU-R BS.1770-4 / EBU R128 loudness measurement — pure numpy.

The broadcast-standard perceptual loudness metric, and the audio QC
gate every real curation pipeline runs alongside RMS/peak: program
loudness in LUFS (K-weighted, two-stage gated), momentary loudness, and
true peak in dBTP (4x oversampled — catches inter-sample overs a plain
sample peak misses).

Everything here is public-spec material: the K-weighting filter is the
two-biquad cascade of BS.1770-4 (a +4 dB high shelf modelling the head
as a rigid sphere, then the RLB revised-low-frequency-B high-pass),
designed at the clip's own sample rate from the analog prototype
parameters published in the spec-evaluation literature (De Man 2018,
"Evaluation of Implementations of the ITU-R BS.1770 Loudness
Algorithm") — at 48 kHz the design reproduces the spec's tabulated
coefficients (pinned in tests). Gating per BS.1770-4 §3: 400 ms blocks
at 75 % overlap, -70 LUFS absolute gate, then a relative gate 10 LU
below the absolute-gated mean. The engine's PCM model is mono int16, so
the channel-weighted sum reduces to the single G=1 term.

Scale design: the hot path is the per-sample IIR recursion — inherently
sequential in TIME but embarrassingly parallel across CLIPS, so the
batch kernel runs the recursion once over a (max_len, n_clips) padded
matrix: every numpy step advances ALL clips one sample. Per-clip
results are bit-identical to running the same recursion on each clip
alone (elementwise float64 ops in the same order), which is what lets a
driver-side ledger certify executor output exactly. Block powers come
from one cumsum of the squared filtered matrix; the true-peak
interpolation is a 4-phase 12-tap windowed-sinc FIR (the spec's Annex 2
shape) done as 36 shifted multiply-adds — no per-sample Python
anywhere except the single shared time loop.
"""

from __future__ import annotations

import numpy as np

# BS.1770-4 K-weighting analog prototype (De Man 2018, Table 1) — the
# fs-parameterized design whose 48 kHz instantiation is the spec table.
_SHELF_F0 = 1681.974450955533
_SHELF_GAIN_DB = 3.999843853973347
_SHELF_Q = 0.7071752369554196
_HP_F0 = 38.13547087602444
_HP_Q = 0.5003270373238773

_ABS_GATE_LUFS = -70.0
_BLOCK_SEC = 0.400
_STEP_SEC = 0.100


def k_weighting_coeffs(fs: int) -> tuple[np.ndarray, np.ndarray]:
    """(b, a) coefficient stacks, shape (2, 3): row 0 the high shelf,
    row 1 the RLB high-pass, both normalized to a0 = 1 (RBJ audio-EQ
    cookbook bilinear designs at the given sample rate)."""
    if fs <= 0:
        raise ValueError("k_weighting_coeffs: fs must be positive")
    # stage 1: high shelf (tan-domain bilinear design; the Vb exponent
    # 0.4996667741545416 is the published constant that makes the 48 kHz
    # instantiation land on the spec's tabulated coefficients)
    K = np.tan(np.pi * _SHELF_F0 / fs)
    Vh = 10.0 ** (_SHELF_GAIN_DB / 20.0)
    Vb = Vh ** 0.4996667741545416
    q = _SHELF_Q
    a0 = 1.0 + K / q + K * K
    b_sh = np.array([
        (Vh + Vb * K / q + K * K) / a0,
        2.0 * (K * K - Vh) / a0,
        (Vh - Vb * K / q + K * K) / a0,
    ])
    a_sh = np.array([
        1.0,
        2.0 * (K * K - 1.0) / a0,
        (1.0 - K / q + K * K) / a0,
    ])
    # stage 2: RLB high-pass — the spec keeps the numerator at exactly
    # [1, -2, 1] (passband gain slightly above unity; the -0.691
    # constant absorbs it at 997 Hz)
    K = np.tan(np.pi * _HP_F0 / fs)
    q = _HP_Q
    a0 = 1.0 + K / q + K * K
    b_hp = np.array([1.0, -2.0, 1.0])
    a_hp = np.array([
        1.0,
        2.0 * (K * K - 1.0) / a0,
        (1.0 - K / q + K * K) / a0,
    ])
    return np.stack([b_sh, b_hp]), np.stack([a_sh, a_hp])


def _biquad_cascade(x: np.ndarray, b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Two-stage direct-form-I biquad over a (L, B) matrix — ONE time
    loop advances every clip (column) a sample; per-column output is
    bit-identical to filtering that column alone."""
    L = x.shape[0]
    y = x
    for s in range(2):
        b0, b1, b2 = b[s]
        a1, a2 = a[s][1], a[s][2]
        # feed-forward half is a plain convolution — hoist it out of the
        # recursion as three whole-matrix ops (measured ~2x: the Python
        # loop then carries only the two feedback taps per sample)
        u = b0 * y
        u[1:] += b1 * y[:-1]
        u[2:] += b2 * y[:-2]
        out = np.empty_like(y)
        y1 = np.zeros(y.shape[1])
        y2 = np.zeros(y.shape[1])
        for i in range(L):
            yi = u[i] - a1 * y1 - a2 * y2
            out[i] = yi
            y2, y1 = y1, yi
        y = out
    return y


# 4x-oversampling interpolator for true peak (BS.1770-4 Annex 2 shape):
# 4 polyphase branches of 12 taps from a 48-tap Hann-windowed sinc.
_TP_FACTOR = 4
_TP_TAPS_PER_PHASE = 12


def _truepeak_fir() -> np.ndarray:
    n = _TP_FACTOR * _TP_TAPS_PER_PHASE
    t = np.arange(n, dtype=np.float64)
    center = (n - 1) / 2.0
    h = np.sinc((t - center) / _TP_FACTOR)
    h *= np.hanning(n)
    # unity DC gain per phase (each branch must pass a constant signal
    # at amplitude 1 — otherwise a full-scale square reads > 0 dBTP)
    h = h.reshape(_TP_TAPS_PER_PHASE, _TP_FACTOR)
    h /= h.sum(axis=0, keepdims=True)
    return h.reshape(n)


_TP_H = _truepeak_fir()


def _true_peak(x: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Per-column true peak (linear, >= the sample peak) of a padded
    (L, B) matrix; samples at or beyond each column's n_valid are
    excluded. 36 shifted multiply-adds, no Python time loop."""
    L, B = x.shape
    idx = np.arange(L)[:, None]
    mask = idx < n_valid[None, :]
    xm = np.where(mask, x, 0.0)
    peak = np.abs(xm).max(axis=0)
    # columns are zero beyond n_valid, so interpolated values past each
    # clip's tail are interpolations of its zero-padded extension — they
    # decay to 0 and never raise the max; no edge masking needed, and
    # the result is independent of how much batch padding a clip got.
    # The interpolation runs in float32 with reused out= buffers: the
    # path is pure memory traffic (48 taps x the whole matrix), f32
    # halves it (measured ~3x with the buffer reuse), and 1e-7 relative
    # rounding is noise against the 12-tap interpolator's own ~0.1 dB
    # envelope — still deterministic and batch-invariant.
    T = _TP_TAPS_PER_PHASE
    h = _TP_H.reshape(T, _TP_FACTOR).astype(np.float32)
    n_out = L + T
    xp = np.zeros((L + 2 * T, B), dtype=np.float32)
    xp[T : T + L] = xm
    acc = np.empty((n_out, B), dtype=np.float32)
    tmp = np.empty_like(acc)
    ipeak = np.zeros(B, dtype=np.float32)
    for p in range(_TP_FACTOR):
        np.multiply(xp[T : T + n_out], h[0, p], out=acc)
        for j in range(1, T):
            np.multiply(xp[T - j : T - j + n_out], h[j, p], out=tmp)
            acc += tmp
        np.abs(acc, out=tmp)
        np.maximum(ipeak, tmp.max(axis=0), out=ipeak)
    return np.maximum(peak, ipeak.astype(np.float64))


def loudness_batch(
    signals: list[np.ndarray | None], fs: int
) -> dict[str, np.ndarray]:
    """BS.1770-4 loudness for a batch of mono int16-scale signals at a
    shared sample rate. Returns arrays over the batch:

      lufs_integrated     gated program loudness (NaN if undecodable,
                          shorter than one 400 ms block, or fully gated)
      lufs_momentary_max  max 400 ms block loudness, ungated (NaN if no
                          block fits)
      true_peak_dbtp      4x-oversampled peak in dBTP (NaN on None)
      n_blocks            gating blocks measured (-1 on None, 0 if the
                          clip is shorter than one block)

    ``None`` entries (undecodable payloads upstream) yield NaN/-1."""
    n = len(signals)
    out_i = np.full(n, np.nan)
    out_m = np.full(n, np.nan)
    out_tp = np.full(n, np.nan)
    out_nb = np.full(n, -1, dtype=np.int64)
    ok = [i for i, s in enumerate(signals) if s is not None and len(s) > 0]
    if not ok:
        return {
            "lufs_integrated": out_i, "lufs_momentary_max": out_m,
            "true_peak_dbtp": out_tp, "n_blocks": out_nb,
        }
    b, a = k_weighting_coeffs(fs)
    block = int(round(_BLOCK_SEC * fs))
    step = int(round(_STEP_SEC * fs))
    lens = np.array([len(signals[i]) for i in ok])
    L = int(lens.max())
    x = np.zeros((L, len(ok)))
    for c, i in enumerate(ok):
        s = np.asarray(signals[i], dtype=np.float64) / 32768.0
        x[: len(s), c] = s
    out_tp_ok = _true_peak(x, lens)
    with np.errstate(divide="ignore"):
        out_tp[ok] = 20.0 * np.log10(out_tp_ok)
    y = _biquad_cascade(x, b, a)
    # block mean-squares from ONE cumsum of y^2 (columns independent)
    cs = np.vstack([np.zeros((1, y.shape[1])), np.cumsum(y * y, axis=0)])
    n_blocks = np.maximum((lens - block) // step + 1, 0)
    out_nb[ok] = n_blocks
    max_blocks = int(n_blocks.max()) if len(n_blocks) else 0
    if max_blocks > 0:
        starts = np.arange(max_blocks) * step                 # (J,)
        valid = starts[:, None] < (lens[None, :] - block + 1)  # (J, C)
        s0 = np.minimum(starts[:, None], np.maximum(lens[None, :] - block, 0))
        z = (
            np.take_along_axis(cs, s0 + block, axis=0)
            - np.take_along_axis(cs, s0, axis=0)
        ) / float(block)                                       # (J, C)
        with np.errstate(divide="ignore"):
            lb = -0.691 + 10.0 * np.log10(z)
        lb = np.where(valid, lb, -np.inf)
        z = np.where(valid, z, 0.0)
        has_block = valid.any(axis=0)
        mm = np.where(has_block, lb.max(axis=0), np.nan)
        out_m[ok] = mm

        # gated means accumulate SEQUENTIALLY over blocks: np.sum's
        # pairwise tree depends on the padded block count, so a clip's
        # result would shift by an ulp with its batch neighbours;
        # left-assoc += (padded rows add exact 0.0) is batch-invariant
        def _gated_mean_power(gate: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            zs = np.zeros(z.shape[1])
            for j in range(z.shape[0]):
                zs = zs + np.where(gate[j], z[j], 0.0)
            return zs, gate.sum(axis=0)

        g_abs = (lb > _ABS_GATE_LUFS) & valid
        zsum, cnt = _gated_mean_power(g_abs)
        with np.errstate(divide="ignore", invalid="ignore"):
            rel_thresh = -0.691 + 10.0 * np.log10(
                zsum / np.maximum(cnt, 1)
            ) - 10.0
        g_rel = g_abs & (lb > rel_thresh[None, :])
        zsum2, cnt2 = _gated_mean_power(g_rel)
        with np.errstate(divide="ignore", invalid="ignore"):
            li = -0.691 + 10.0 * np.log10(zsum2 / np.maximum(cnt2, 1))
        out_i[ok] = np.where((cnt > 0) & (cnt2 > 0), li, np.nan)
    return {
        "lufs_integrated": out_i, "lufs_momentary_max": out_m,
        "true_peak_dbtp": out_tp, "n_blocks": out_nb,
    }


def loudness_single(signal: np.ndarray, fs: int) -> dict[str, float]:
    """Single-clip convenience wrapper (the batch kernel with B=1 —
    bit-identical by construction; tests pin it)."""
    r = loudness_batch([signal], fs)
    return {k: v[0] for k, v in r.items()}
