"""Payload-rewriting audio curation: silence trimming + sample-rate
normalization.

Training corpora shed dead air and normalize sample rates *before* the
expensive stages (fingerprinting, ASR feature extraction) — at 100 TB a
20% silence fraction is 20 TB of bytes every downstream shuffle, UDF hop
and sink would otherwise carry. Both operators therefore sit early in the
funnel and REDUCE bytes-in-flight:

- ``trim_silence``: energy-VAD span in one Arrow hop (only a 24-byte span
  struct returns from Python), then the payload slice is JVM-side binary
  ``substring`` — trimmed bytes never round-trip through the Python
  worker, and whole-stage codegen keeps the slice next to the scan.
- ``resample_pcm``: integer-factor decimation (48k→16k, 16k→8k) in one
  Arrow hop; containers are transcoded to raw PCM on the way through.

Scale notes (10^12 clips): both are narrow per-row maps — zero shuffle,
partitioning follows the scan; the byte reduction *shrinks* every
downstream stage. Decision paths are pure integer arithmetic, so the
DuckDB oracle recomputes spans and decimated payloads bit-for-bit from
the same parquet files (contract queries ``clips_trim_silence``,
``clips_resample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import (
    SILENCE_AMP,
    decimate,
    speech_span,
)

PCM_CODEC = "pcm_s16le"
BYTES_PER_SAMPLE = 2


def trim_silence(
    df: DataFrame,
    silence_amp: int = SILENCE_AMP,
    frame_div: int = 50,
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Trim leading/trailing silence from raw-PCM payloads.

    Adds columns:
      n_samples / start_sample / end_sample — the detected speech span
          (NULL where the payload is NULL or undecodable);
      trimmed — true iff the payload column was actually rewritten;
      trim_lead_ms / trim_tail_ms — how much was cut (0 for pass-through).
    and REWRITES ``payload_col`` + ``dur_col`` for trimmed rows.

    Only raw ``pcm_s16le`` rows are byte-sliceable; container codecs pass
    through unchanged with their span attached (trim-after-decode for
    those belongs in a transcode hop — see ``resample_pcm``). All-silent
    clips trim to an EMPTY payload (span [0, 0)) — downstream gates drop
    them; undecodable rows pass through with NULL span so decode checks
    surface them instead of this operator eating the evidence.
    """
    span = speech_span(payload_col, sr_col, silence_amp, frame_div)
    d = df.withColumn("_span", span)

    ok = F.coalesce(F.col("_span.n_samples") >= 0, F.lit(False))
    n_samples = F.when(ok, F.col("_span.n_samples"))
    start = F.when(ok, F.col("_span.start_sample"))
    end = F.when(ok, F.col("_span.end_sample"))
    sliceable = F.coalesce(F.col(codec_col) == PCM_CODEC, F.lit(False)) & ok
    sr = F.col(sr_col).cast("long")

    new_bytes = F.when(
        sliceable,
        F.substring(
            F.col(payload_col),
            (start * BYTES_PER_SAMPLE + 1).cast("int"),
            ((end - start) * BYTES_PER_SAMPLE).cast("int"),
        ),
    ).otherwise(F.col(payload_col))
    new_dur = F.when(
        sliceable, F.floor((end - start) * 1000 / sr).cast(dict(df.dtypes)[dur_col])
    ).otherwise(F.col(dur_col))
    lead_ms = F.when(sliceable, F.floor(start * 1000 / sr)).otherwise(
        F.lit(0)
    ).cast("long")
    tail_ms = F.when(
        sliceable, F.floor((n_samples - end) * 1000 / sr)
    ).otherwise(F.lit(0)).cast("long")

    out_cols = []
    for c in df.columns:
        if c == payload_col:
            out_cols.append(new_bytes.alias(payload_col))
        elif c == dur_col:
            out_cols.append(new_dur.alias(dur_col))
        else:
            out_cols.append(F.col(c))
    return d.select(
        *out_cols,
        n_samples.alias("n_samples"),
        start.alias("start_sample"),
        end.alias("end_sample"),
        sliceable.alias("trimmed"),
        lead_ms.alias("trim_lead_ms"),
        tail_ms.alias("trim_tail_ms"),
    )


def resample_pcm(
    df: DataFrame,
    target_sr: int,
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Normalize sample rate by integer-factor decimation.

    Rows whose rate divides evenly (``sr_hz % target_sr == 0``) and decode
    are rewritten: payload becomes raw pcm_s16le at ``target_sr`` (codec
    + sr_hz columns updated, containers transcoded); everything else
    passes through unchanged with ``resampled = false`` — non-integer
    ratios are flagged, never silently approximated. Adds
    (resampled, n_out). ``dur_col`` is recomputed from the output sample
    count for resampled rows (floor(n_out * 1000 / target_sr)).
    """
    d = df.withColumn("_dec", decimate(payload_col, sr_col, target_sr))
    return _apply_rate_rewrite(
        df, d, target_sr, payload_col, sr_col, codec_col, dur_col
    )


def upsample_pcm(
    df: DataFrame,
    target_sr: int,
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Normalize sample rate UP by integer-factor linear interpolation
    (8 kHz telephony -> 16 kHz ASR input; functions/audio.upsample).

    Mirror of resample_pcm: rows where ``target_sr % sr_hz == 0`` (factor
    >= 2) and decode are rewritten to raw pcm_s16le at ``target_sr``
    (out[j] = exact-integer blend of neighbors; every L-th sample is the
    original bit-for-bit); everything else passes through unchanged with
    ``resampled = false`` — non-integer ratios flagged, never silently
    approximated."""
    from jsonschema_spark.functions.audio import upsample

    d = df.withColumn("_dec", upsample(payload_col, sr_col, target_sr))
    return _apply_rate_rewrite(
        df, d, target_sr, payload_col, sr_col, codec_col, dur_col
    )


def _apply_rate_rewrite(
    df: DataFrame,
    d: DataFrame,
    target_sr: int,
    payload_col: str,
    sr_col: str,
    codec_col: str,
    dur_col: str,
) -> DataFrame:
    """Shared column rewrite below a rate-conversion Arrow hop (``_dec``
    struct): swap payload/sr/codec/dur on converted rows, pass everything
    else through, add (resampled, n_out)."""
    ok = F.coalesce(F.col("_dec.n_out") >= 0, F.lit(False))

    out_cols = []
    for c in df.columns:
        if c == payload_col:
            out_cols.append(
                F.when(ok, F.col("_dec.out_bytes"))
                .otherwise(F.col(payload_col))
                .alias(payload_col)
            )
        elif c == sr_col:
            out_cols.append(
                F.when(ok, F.lit(target_sr))
                .otherwise(F.col(sr_col))
                .cast(dict(df.dtypes)[sr_col])
                .alias(sr_col)
            )
        elif c == codec_col:
            out_cols.append(
                F.when(ok, F.lit(PCM_CODEC))
                .otherwise(F.col(codec_col))
                .alias(codec_col)
            )
        elif c == dur_col:
            out_cols.append(
                F.when(
                    ok,
                    F.floor(F.col("_dec.n_out") * 1000 / target_sr),
                )
                .otherwise(F.col(dur_col))
                .cast(dict(df.dtypes)[dur_col])
                .alias(dur_col)
            )
        else:
            out_cols.append(F.col(c))
    return d.select(
        *out_cols,
        ok.alias("resampled"),
        F.when(ok, F.col("_dec.n_out")).alias("n_out"),
    )


def transcode_to_flac(
    df: DataFrame,
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
    lpc_max_order: int = 0,
) -> DataFrame:
    """Archival codec normalization: rewrite every decodable payload as
    REAL FLAC (lossless — functions/flac.py), the storage-side twin of
    resample/downmix's compute-side normalization. Undecodable rows pass
    through unchanged with ``transcoded = false`` (quarantine them with
    the validation family, never drop silently). Adds (transcoded,
    n_out). At 100 TB this is the pattern that matters: one scan, one
    Arrow hop, zero shuffle — the written corpus is typically 2-4x
    smaller, which every downstream scan repays."""
    from jsonschema_spark.functions.audio import transcode_flac

    d = df.withColumn(
        "_tc", transcode_flac(payload_col, sr_col, lpc_max_order)
    )
    ok = F.coalesce(F.col("_tc.n_out") >= 0, F.lit(False))
    out_cols = []
    for c in df.columns:
        if c == payload_col:
            out_cols.append(
                F.when(ok, F.col("_tc.out_bytes"))
                .otherwise(F.col(payload_col))
                .alias(payload_col)
            )
        elif c == codec_col:
            out_cols.append(
                F.when(ok, F.lit("flac"))
                .otherwise(F.col(codec_col))
                .alias(codec_col)
            )
        else:
            out_cols.append(F.col(c))
    return d.select(
        *out_cols,
        ok.alias("transcoded"),
        F.when(ok, F.col("_tc.n_out")).alias("n_out"),
    )


def downmix_mono(
    df: DataFrame,
    payload_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """Normalize channel count: stereo RIFF/WAVE PCM16 payloads are
    rewritten as raw mono pcm_s16le with out[i] = (l[i] + r[i]) >> 1 —
    exact integer arithmetic, so the DuckDB oracle rebuilds output
    payloads bit-for-bit (``clips_downmix``). Already-mono containers,
    raw PCM, NULL and undecodable rows pass through with
    ``downmixed = false`` (decode failures surface via the decode
    checks, never here). Adds (downmixed, n_out). One Arrow hop, zero
    shuffle; like trim/resample this HALVES bytes-in-flight for stereo
    corpora before the expensive downstream stages."""
    from jsonschema_spark.functions.audio import downmix

    d = df.withColumn("_dm", downmix(payload_col))
    ok = F.coalesce(F.col("_dm.n_out") >= 0, F.lit(False))
    out_cols = []
    for c in df.columns:
        if c == payload_col:
            out_cols.append(
                F.when(ok, F.col("_dm.out_bytes"))
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
    return d.select(
        *out_cols,
        ok.alias("downmixed"),
        F.when(ok, F.col("_dm.n_out")).alias("n_out"),
    )


def normalize_loudness(
    df: DataFrame,
    target_rms: float = 0.1,
    max_gain: float = 4.0,
    payload_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """Normalize clip loudness to ``target_rms`` (linear full-scale RMS;
    0.1 = -20 dBFS), gain capped at ``max_gain``.

    Decodable rows are rewritten as raw pcm_s16le with every sample
    scaled by clip(floor(v * gain + 0.5)) — integer-exact given the gain,
    and the gain itself is exactly-rounded double arithmetic, so the
    DuckDB oracle reproduces output payloads bit-for-bit
    (``clips_gain_normalize``). NULL/undecodable rows pass through with
    ``normalized = false``. Adds (normalized, gain). One Arrow hop, zero
    shuffle; at corpus scale this removes the loudness spread that
    otherwise dominates batch statistics in training.
    """
    from jsonschema_spark.functions.audio import gain_normalize

    d = df.withColumn("_gn", gain_normalize(payload_col, target_rms, max_gain))
    ok = F.coalesce(F.col("_gn.n_out") >= 0, F.lit(False))
    out_cols = []
    for c in df.columns:
        if c == payload_col:
            out_cols.append(
                F.when(ok, F.col("_gn.out_bytes"))
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
    return d.select(
        *out_cols,
        ok.alias("normalized"),
        F.when(ok, F.col("_gn.gain")).alias("gain"),
    )


def normalize_to_lufs(
    df: DataFrame,
    target_lufs: float = -23.0,
    max_gain: float = 8.0,
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
) -> DataFrame:
    """Normalize clip loudness to ``target_lufs`` INTEGRATED program
    loudness (BS.1770-4 gated — the EBU R128 / speech-corpus stance;
    the perceptual upgrade over :func:`normalize_loudness`'s plain RMS).
    Gain capped at ``max_gain``; rows whose loudness cannot be measured
    (undecodable, sub-block, fully gated) pass through unmodified with
    ``normalized = false`` — a normalizer that cannot measure must not
    guess. Adds (normalized, gain, lufs_in). One Arrow hop, zero
    shuffle."""
    from jsonschema_spark.functions.audio import lufs_normalize

    d = df.withColumn(
        "_ln", lufs_normalize(payload_col, sr_col, target_lufs, max_gain)
    )
    ok = F.coalesce(F.col("_ln.n_out") >= 0, F.lit(False))
    out_cols = []
    for c in df.columns:
        if c == payload_col:
            out_cols.append(
                F.when(ok, F.col("_ln.out_bytes"))
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
    return d.select(
        *out_cols,
        ok.alias("normalized"),
        F.when(ok, F.col("_ln.gain")).alias("gain"),
        F.when(ok, F.col("_ln.lufs_in")).alias("lufs_in"),
    )
