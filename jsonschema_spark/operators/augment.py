"""Training-data augmentation: speed perturbation, time masking, overlay
(noise) mixing — the standard ASR corpus-expansion ops, re-expressed
Spark-first.

Speech training pipelines multiply effective corpus size by perturbing
clean clips: resample to 0.9x/1.1x speed (Kaldi-style 3-way speed
perturbation), zero out random time spans (the waveform analogue of
SpecAugment time masking), and overlay background audio at a reduced
gain (noise augmentation). All three are deterministic here — spans and
noise pairings derive from md5(clip_id), never an RNG stream — so every
output payload is bit-reproducible on any engine, and re-running the
pipeline (or resuming it from a checkpoint) regenerates identical bytes.

Scale shapes (10^12 clips):
- ``speed_perturb`` — narrow per-row map, one Arrow hop, zero shuffle.
- ``time_mask`` — ZERO Python: mask starts are md5_60 arithmetic and the
  payload rewrite is JVM binary surgery (substring/concat/repeat), all
  inside whole-stage codegen next to the scan.
- ``mix_overlay`` — one join against the noise bank (noise banks are
  small — AQE broadcasts them; no forced hint, per the at-scale
  broadcast-OOM lesson) + one Arrow hop for the sample addition.

Each op rewrites the payload as raw pcm_s16le and flags rows it could
not rewrite instead of silently passing corrupt bytes downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import mix_payloads, speed_gather

PCM_CODEC = "pcm_s16le"
BYTES_PER_SAMPLE = 2


def _md5_60(col):
    """Top 60 bits of md5 as BIGINT — the engine's cross-engine hash
    family (DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def speed_perturb(
    df: DataFrame,
    num: int,
    den: int,
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Speed-perturb every clip by the exact rational factor ``num/den``
    (num=11, den=10 -> 1.1x faster; num=9, den=10 -> 0.9x slower).

    Output sample j is input sample (j*num)//den — nearest-sample
    resampling as pure integer index arithmetic (one Arrow hop, zero
    shuffle). The payload is rewritten as raw pcm_s16le (containers
    transcode on the way through), ``dur_col`` is recomputed from the
    output sample count, and ``perturbed`` flags rewritten rows;
    NULL/undecodable rows pass through with ``perturbed = false``."""
    d = df.withColumn("_sp", speed_gather(payload_col, num, den))
    ok = F.coalesce(F.col("_sp.n_out") >= 0, F.lit(False))
    sr = F.col(sr_col).cast("long")

    out_cols = []
    for c in df.columns:
        if c == payload_col:
            out_cols.append(
                F.when(ok, F.col("_sp.out_bytes"))
                .otherwise(F.col(payload_col))
                .alias(payload_col)
            )
        elif c == codec_col:
            out_cols.append(
                F.when(ok, F.lit(PCM_CODEC))
                .otherwise(F.col(codec_col))
                .alias(codec_col)
            )
        elif c == dur_col:
            out_cols.append(
                F.when(ok, F.floor(F.col("_sp.n_out") * 1000 / sr))
                .otherwise(F.col(dur_col))
                .cast(dict(df.dtypes)[dur_col])
                .alias(dur_col)
            )
        else:
            out_cols.append(F.col(c))
    return d.select(
        *out_cols,
        ok.alias("perturbed"),
        F.when(ok, F.col("_sp.n_out")).alias("n_out"),
    )


def time_mask(
    df: DataFrame,
    n_masks: int = 2,
    mask_ms: int = 100,
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
    id_col: str = "clip_id",
) -> DataFrame:
    """Zero out ``n_masks`` deterministic time spans of ``mask_ms`` each —
    waveform time masking (the SpecAugment primitive), ZERO Python.

    Mask k starts at md5_60(clip_id || ':tm<k>') % (n - w + 1) samples
    (w = sr*mask_ms//1000, clamped to the clip length); the rewrite is
    JVM binary surgery — substring / concat / unhex(repeat('0000', w)) —
    entirely inside whole-stage codegen, so masked bytes never leave the
    JVM. Masks may overlap (zeroing is idempotent). Only raw pcm_s16le
    payloads are maskable; other codecs pass through with
    ``masked = false``. Adds mask<k>_start columns (sample index, NULL
    for pass-through rows).

    The output is ONE concat of alternating keep/zero slices over the
    SORTED span starts (array_sort), so every piece is a substring of the
    scan attribute itself. Composing masks by rewriting the previous
    layer's concat instead re-evaluates that intermediate once per
    referencing substring — measured 6x slower already at two masks."""
    if n_masks < 1:
        raise ValueError("n_masks must be >= 1")
    sr = F.col(sr_col).cast("long")
    n = (F.length(F.col(payload_col)) / BYTES_PER_SAMPLE).cast("long")
    w = F.least(F.floor(sr * mask_ms / 1000).cast("long"), n)
    maskable = (
        F.coalesce(F.col(codec_col) == PCM_CODEC, F.lit(False))
        & F.col(payload_col).isNotNull()
        & (n > 0)
    )

    starts = [
        _md5_60(F.concat(F.col(id_col), F.lit(f":tm{k}")))
        % F.greatest(n - w + 1, F.lit(1))
        for k in range(n_masks)
    ]

    # piecewise single-pass build over sorted starts p_1 <= ... <= p_K
    # (sentinel p_{K+1} = n):
    #   keep [0, p_1)
    #   for each k: zeros over [p_k, min(p_k + w, p_{k+1}))
    #               keep  over [min(p_k + w, p_{k+1}), p_{k+1})
    # — overlapping masks merge naturally (the next span re-zeroes from
    # its own start), and total length telescopes to n.
    arr = F.array_sort(F.array(*starts))
    p = [F.element_at(arr, k + 1) for k in range(n_masks)]
    nxt = p[1:] + [n]
    src = F.col(payload_col)
    pieces = [F.substring(src, 1, (p[0] * BYTES_PER_SAMPLE).cast("int"))]
    for k in range(n_masks):
        cut = F.least(p[k] + w, nxt[k])
        pieces.append(
            F.unhex(F.repeat(F.lit("0000"), (cut - p[k]).cast("int")))
        )
        pieces.append(
            F.substring(
                src,
                (cut * BYTES_PER_SAMPLE + 1).cast("int"),
                ((nxt[k] - cut) * BYTES_PER_SAMPLE).cast("int"),
            )
        )
    body = F.concat(*pieces)

    out_cols = []
    for c in df.columns:
        if c == payload_col:
            out_cols.append(
                F.when(maskable, body).otherwise(F.col(payload_col))
                .alias(payload_col)
            )
        else:
            out_cols.append(F.col(c))
    return df.select(
        *out_cols,
        maskable.alias("masked"),
        *[
            F.when(maskable, s).alias(f"mask{k}_start")
            for k, s in enumerate(starts)
        ],
    )


def mix_overlay(
    df: DataFrame,
    noise: DataFrame,
    n_noise: int,
    gain: float = 0.25,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    noise_idx_col: str = "_row_idx",
    noise_payload_col: str = "bytes",
    snr_lin: float | None = None,
) -> DataFrame:
    """Overlay every clip with a deterministically selected noise-bank
    clip at ``gain`` (noise augmentation).

    Noise selection is md5_60(clip_id || ':mx') % n_noise against the
    bank's ``noise_idx_col`` — a plain equi-join the optimizer sizes
    (noise banks are small; AQE broadcasts them — no forced hint). The
    mix itself is one Arrow hop: out = clip(floor(a + b*gain + 0.5))
    over len(a), exactly-rounded double arithmetic so the output payload
    is SQL-reproducible. Rewrites payload as raw pcm_s16le; adds
    (mixed, noise_idx, n_out). Rows whose payload or selected noise is
    NULL/undecodable pass through with ``mixed = false``.

    ``snr_lin`` switches to SNR-TARGETED mixing: the per-pair gain is
    derived from measured powers over the overlap so that
    rms(signal)/rms(scaled noise) == snr_lin (a linear amplitude
    ratio — convert from dB once on the driver; pow/log in the row
    path would break cross-engine bit-parity). Adds a ``mix_gain``
    column; silent signal/noise overlap mixes at gain 0."""
    if n_noise <= 0:
        raise ValueError("n_noise must be positive")
    nid = _md5_60(F.concat(F.col(id_col), F.lit(":mx"))) % n_noise
    bank = noise.select(
        F.col(noise_idx_col).cast("long").alias("_noise_idx"),
        F.col(noise_payload_col).alias("_noise_bytes"),
    )
    if snr_lin is not None:
        from jsonschema_spark.functions.audio import mix_payloads_snr

        mx = mix_payloads_snr(payload_col, "_noise_bytes", snr_lin)
    else:
        mx = mix_payloads(payload_col, "_noise_bytes", gain)
    d = (
        df.withColumn("_noise_idx", nid)
        .join(bank, "_noise_idx", "left")
        .withColumn("_mx", mx)
    )
    ok = F.coalesce(F.col("_mx.n_out") >= 0, F.lit(False))

    out_cols = []
    for c in df.columns:
        if c == payload_col:
            out_cols.append(
                F.when(ok, F.col("_mx.out_bytes"))
                .otherwise(F.col(payload_col))
                .alias(payload_col)
            )
        elif c == codec_col:
            out_cols.append(
                F.when(ok, F.lit(PCM_CODEC))
                .otherwise(F.col(codec_col))
                .alias(codec_col)
            )
        else:
            out_cols.append(F.col(c))
    extra = (
        [F.when(ok, F.col("_mx.gain")).alias("mix_gain")]
        if snr_lin is not None
        else []
    )
    return d.select(
        *out_cols,
        ok.alias("mixed"),
        F.col("_noise_idx").alias("noise_idx"),
        F.when(ok, F.col("_mx.n_out")).alias("n_out"),
        *extra,
    )


# ---------------------------------------------------------------------------
# SpecAugment — feature-space time/frequency masking
# ---------------------------------------------------------------------------


def spec_augment(
    df: DataFrame,
    mat_col: str = "mat_q",
    n_frames_col: str = "n_frames",
    clip_id_col: str = "clip_id",
    n_time_masks: int = 2,
    max_t_frames: int = 20,
    n_freq_masks: int = 2,
    max_f_bins: int = 8,
    n_mels: int = 40,
    seed: str = "",
    out_col: str = "aug_q",
) -> DataFrame:
    """SpecAugment (Park et al. 1904.08779) over the flattened quantized
    log-mel matrix: ``n_time_masks`` frame spans and ``n_freq_masks``
    mel-bin spans are zeroed (q = 0). Everything is deterministic —
    widths and starts are md5_60 arithmetic on (seed, clip_id), so the
    SAME masks apply on re-runs, resumed checkpoints and in the DuckDB
    oracle replay; a training epoch re-draws by changing ``seed``.

    Scale shape: ZERO Python, zero shuffle — mask scalars are codegen'd
    md5 expressions and the rewrite is one array ``transform`` per row
    over the materialized matrix attribute. Mask draws:

        t_w[i] = md5_60(seed:tw{i} | clip_id) % (max_t_frames + 1)
        t_s[i] = md5_60(seed:ts{i} | clip_id) % max(1, T - t_w[i] + 1)

    (freq masks analogously over ``n_mels``), i.e. a width-uniform
    draw then a start-uniform draw over valid positions — masks wider
    than the clip clamp to the whole axis.

    The mask parameter columns (``_sa_t_s0`` ...) are RETURNED next to
    ``out_col`` — augmentation provenance for auditing, and a hard
    requirement: an alias referenced ONLY inside a HOF lambda is
    re-inlined by project collapsing (lambda-hidden references are not
    counted), which would re-run the md5 draw once per matrix element;
    keeping the scalars in the output projection pins them as
    attributes (verified by the plan assert in tests/test_fbank.py)."""
    cid = F.col(clip_id_col)
    nfr = F.col(n_frames_col)

    widths = {}
    for i in range(n_time_masks):
        widths[f"_sa_t_w{i}"] = F.pmod(
            _md5_60(F.concat_ws("|", F.lit(f"{seed}:tw{i}"), cid)),
            F.lit(max_t_frames + 1),
        )
    for i in range(n_freq_masks):
        widths[f"_sa_f_w{i}"] = F.pmod(
            _md5_60(F.concat_ws("|", F.lit(f"{seed}:fw{i}"), cid)),
            F.lit(max_f_bins + 1),
        )
    a = df.withColumns(widths)

    starts = {}
    for i in range(n_time_masks):
        dom = F.greatest(
            F.lit(1).cast("long"),
            nfr.cast("long") - F.col(f"_sa_t_w{i}") + F.lit(1),
        )
        starts[f"_sa_t_s{i}"] = F.pmod(
            _md5_60(F.concat_ws("|", F.lit(f"{seed}:ts{i}"), cid)), dom
        )
    for i in range(n_freq_masks):
        dom = F.greatest(
            F.lit(1).cast("long"),
            F.lit(n_mels).cast("long") - F.col(f"_sa_f_w{i}") + F.lit(1),
        )
        starts[f"_sa_f_s{i}"] = F.pmod(
            _md5_60(F.concat_ws("|", F.lit(f"{seed}:fs{i}"), cid)), dom
        )
    b = a.withColumns(starts)

    mat = F.col(mat_col)

    def _mask(v, pos):
        t = F.floor(pos / F.lit(n_mels)).cast("long")
        m = F.pmod(pos, F.lit(n_mels)).cast("long")
        hit = F.lit(False)
        for i in range(n_time_masks):
            s, w = F.col(f"_sa_t_s{i}"), F.col(f"_sa_t_w{i}")
            hit = hit | ((t >= s) & (t < s + w))
        for i in range(n_freq_masks):
            s, w = F.col(f"_sa_f_s{i}"), F.col(f"_sa_f_w{i}")
            hit = hit | ((m >= s) & (m < s + w))
        return F.when(hit, F.lit(0).cast("long")).otherwise(v)

    return b.withColumn(out_col, F.transform(mat, _mask))
