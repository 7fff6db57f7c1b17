"""Audio segmentation: split clips into fixed-duration training segments.

Training pipelines rarely feed whole recordings to a model — they want
uniform windows (e.g. 100 ms frames for fingerprinting, 10 s chunks for
ASR). For raw PCM16 payloads the byte layout IS the sample layout
(2 bytes/sample, mono), so segmentation is pure Column algebra:

    scan -> sequence(0, n_seg-1) -> explode -> substring(bytes, off, len)

ZERO Python, zero shuffle, whole-stage codegen end to end — the segment
rows stream out of the same task that read the parquet row group. This is
the kind of operator that would be a per-row UDF in a naive port; Spark's
binary `substring` + array `sequence`/`explode` make it free.

Container formats (WAV/flac/opus) are NOT byte-sliceable mid-stream;
those rows pass through as a single segment 0 (flag ``sliceable=false``)
— decode-then-segment for them belongs in the Arrow decode hop instead.

Guards: ``F.sequence(0, n-1)`` DESCENDS for n <= 0 (sequence(0,-1) =
[0,-1]); empty payloads are guarded to an empty segment array and drop
out at the explode.

Scale note (10^12 clips): output cardinality is segments ~= dur/segment_ms
per clip — the explode multiplies rows but not bytes (each segment slice
references its window); downstream shuffles should happen AFTER any
per-segment reduction. Partition count follows the input scan; resize
with ``spark.sql.files.maxPartitionBytes`` as payload width dictates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCM_CODEC = "pcm_s16le"
BYTES_PER_SAMPLE = 2


def segment_clips(
    df: DataFrame,
    segment_ms: int,
    min_tail_ms: int = 0,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
    dur_col: str = "dur_ms",
    transcript_col: str | None = None,
) -> DataFrame:
    """Explode each clip into fixed-duration segments.

    Returns (clip_id, segment_id, seg_idx, seg_start_ms, seg_dur_ms,
    sr_hz, codec, sliceable, seg_bytes). The final segment may be shorter
    than ``segment_ms``; tails shorter than ``min_tail_ms`` are dropped
    (a short-tail gate for training-window uniformity). Non-PCM codecs
    yield one whole-payload segment with ``sliceable = false`` whose
    duration comes from ``dur_col`` (metadata — a compressed container's
    byte count says nothing about its duration); NULL payloads yield zero
    segments (nothing to carry).

    ``transcript_col`` (optional) adds ``seg_transcript``: the character
    window proportional to the sample window — char range
    [floor(start*len/n), floor(end*len/n)) — the standard weak-alignment
    for cutting (audio, text) training pairs when no forced aligner has
    run; slices reassemble the transcript exactly (concatenation over
    seg_idx is the identity — integer-floor boundaries are monotone and
    exhaustive). Non-sliceable rows carry the whole transcript. Like the
    byte slice it is pure Column algebra — zero Python, zero shuffle.
    """
    if segment_ms <= 0:
        raise ValueError("segment_ms must be positive")

    n_bytes = F.length(F.col(payload_col))
    n_samples = (n_bytes / BYTES_PER_SAMPLE).cast("long")
    # samples per segment, per row (sr varies by row)
    sps = (F.col(sr_col).cast("long") * segment_ms / 1000).cast("long")
    n_seg = F.ceil(n_samples / sps).cast("long")

    # sliceable requires raw PCM, a usable sample rate AND a non-zero
    # window (sr*segment_ms >= 1000) — coalesce collapses three-valued
    # logic so a NULL codec/sr row passes through whole instead of
    # exploding into duplicate whole-payload copies (~NULL is NULL and
    # would skip the passthrough branch)
    pcm = F.coalesce(
        (F.col(codec_col) == PCM_CODEC)
        & F.col(sr_col).isNotNull()
        & (F.col(sr_col) > 0)
        & (sps > 0),
        F.lit(False),
    )

    idxs = (
        F.when(F.col(payload_col).isNull(), F.array().cast("array<int>"))
        .when(~pcm, F.array(F.lit(0)))
        .when(n_seg < 1, F.array().cast("array<int>"))
        .otherwise(F.sequence(F.lit(0), (n_seg - 1).cast("int")))
    )

    dur_meta = (
        F.col(dur_col).cast("long") if dur_col in df.columns
        else F.lit(None).cast("long")
    )
    extra = [F.col(transcript_col).alias("_transcript")] if transcript_col else []
    seg = df.select(
        F.col(id_col),
        F.col(payload_col),
        F.col(sr_col),
        F.col(codec_col),
        pcm.alias("sliceable"),
        n_samples.alias("_n_samples"),
        sps.alias("_sps"),
        dur_meta.alias("_dur_meta"),
        *extra,
        F.explode(idxs).alias("seg_idx"),
    )

    start_sample = F.col("seg_idx").cast("long") * F.col("_sps")
    this_samples = F.least(F.col("_sps"), F.col("_n_samples") - start_sample)
    seg_bytes = F.when(
        F.col("sliceable"),
        F.substring(
            F.col(payload_col),
            (start_sample * BYTES_PER_SAMPLE + 1).cast("int"),
            (this_samples * BYTES_PER_SAMPLE).cast("int"),
        ),
    ).otherwise(F.col(payload_col))
    sr = F.col(sr_col).cast("long")
    seg_start_ms = F.floor(start_sample * 1000 / sr).cast("long")
    # duration: derived from the sample window for sliceable PCM; from the
    # dur_ms METADATA for container codecs (compressed byte counts say
    # nothing about duration)
    seg_dur_ms = F.when(
        F.col("sliceable"), F.floor(this_samples * 1000 / sr).cast("long")
    ).otherwise(F.col("_dur_meta"))

    tx_cols = []
    if transcript_col:
        tx_len = F.length(F.col("_transcript")).cast("long")
        # char window [floor(start*len/n), floor(end*len/n)): monotone
        # exhaustive integer boundaries -> concatenation over seg_idx
        # reassembles the transcript exactly
        ch_start = F.floor(start_sample * tx_len / F.col("_n_samples")).cast("long")
        ch_end = F.floor(
            (start_sample + this_samples) * tx_len / F.col("_n_samples")
        ).cast("long")
        seg_tx = F.when(
            F.col("sliceable"),
            F.substring(
                F.col("_transcript"),
                (ch_start + 1).cast("int"),
                (ch_end - ch_start).cast("int"),
            ),
        ).otherwise(F.col("_transcript"))
        tx_cols = [seg_tx.alias("seg_transcript")]
    out = seg.select(
        F.col(id_col),
        F.concat(
            F.col(id_col), F.lit("#"), F.lpad(F.col("seg_idx").cast("string"), 5, "0")
        ).alias("segment_id"),
        F.col("seg_idx").cast("int").alias("seg_idx"),
        F.when(F.col("sliceable"), seg_start_ms).otherwise(F.lit(0)).alias(
            "seg_start_ms"
        ),
        seg_dur_ms.alias("seg_dur_ms"),
        F.col(sr_col),
        F.col(codec_col),
        F.col("sliceable"),
        seg_bytes.alias("seg_bytes"),
        *tx_cols,
    )
    if min_tail_ms > 0:
        out = out.where(~F.col("sliceable") | (F.col("seg_dur_ms") >= min_tail_ms))
    return out


def segment_summary(segments: DataFrame) -> DataFrame:
    """Per-clip rollup: (clip_id, n_segments, total_ms, sliceable) — one
    narrow aggregate keyed by clip_id."""
    return (
        segments.groupBy("clip_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("seg_dur_ms").alias("total_ms"),
            F.min("sliceable").alias("sliceable"),
        )
        .orderBy("clip_id")
    )


def segment_decoded(
    df: DataFrame,
    segment_ms: int,
    min_tail_ms: int = 0,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
    transcript_col: str | None = None,
) -> DataFrame:
    """Segment COMPRESSED audio: decode each payload once (any container
    ``functions.audio.decode_payload`` speaks — WAV depths, G.711, ADPCM,
    real FLAC, raw PCM) and explode the decoded stream into fixed
    ``segment_ms`` raw-PCM16 training windows.

    This is the decode-then-segment hop ``segment_clips`` deliberately
    defers for its ``sliceable=false`` container rows: the decode is
    O(clip) and runs EXACTLY ONCE per clip inside one Arrow hop
    (functions.audio.segment_pcm returns array<binary>); the per-segment
    fan-out is a JVM ``posexplode_outer`` over that array — segment rows
    never round-trip through Python, and undecodable clips surface as one
    loud row (NULL seg_idx/seg_bytes, n_samples = -1) instead of silently
    vanishing.

    Returns (clip_id, segment_id, seg_idx, seg_start_sample,
    seg_n_samples, n_samples, sr_hz, codec, seg_bytes). Boundaries are in
    SAMPLES (seg_start_sample = seg_idx * (sr*segment_ms div 1000)) —
    exact integers, unlike ms starts which floor-divide unevenly at
    odd rates. The final segment keeps its natural tail; tails shorter
    than ``min_tail_ms`` are dropped when requested (the filter sits
    ABOVE the generate so the decode UDF still runs once).

    Scale shape (10^12 clips): one scan -> one ArrowEvalPython -> one
    Generate — zero shuffle, parallelism = input partitions; output rows
    multiply but each segment references its own window of the decoded
    buffer. Downstream shuffles belong AFTER any per-segment reduction.
    """
    from jsonschema_spark.functions.audio import segment_pcm

    tx_in = (
        [F.col(transcript_col).alias("_transcript")] if transcript_col
        else []
    )
    dec = df.select(
        F.col(id_col),
        F.col(sr_col),
        F.col(codec_col),
        *tx_in,
        segment_pcm(payload_col, sr_col, segment_ms).alias("_seg"),
    )
    # own projection: posexplode must reference the struct ATTRIBUTE, not
    # re-expand the UDF expression per field (project collapsing)
    dec = dec.select(
        F.col(id_col),
        F.col(sr_col),
        F.col(codec_col),
        *([F.col("_transcript")] if transcript_col else []),
        F.col("_seg.n_samples").alias("n_samples"),
        F.posexplode_outer("_seg.segs").alias("seg_idx", "seg_bytes"),
    )
    sps = (F.col(sr_col).cast("long") * segment_ms / 1000).cast("long")
    out = dec.select(
        F.col(id_col),
        F.when(
            F.col("seg_idx").isNotNull(),
            F.concat(
                F.col(id_col),
                F.lit("#"),
                F.lpad(F.col("seg_idx").cast("string"), 5, "0"),
            ),
        ).alias("segment_id"),
        F.col("seg_idx").cast("long").alias("seg_idx"),
        (F.col("seg_idx").cast("long") * sps).alias("seg_start_sample"),
        (F.length("seg_bytes") / BYTES_PER_SAMPLE).cast("long").alias(
            "seg_n_samples"
        ),
        F.col("n_samples"),
        F.col(sr_col),
        F.col(codec_col),
        F.col("seg_bytes"),
        *_seg_transcript_cols(
            transcript_col,
            F.col("seg_idx").cast("long") * sps,
            (F.length("seg_bytes") / BYTES_PER_SAMPLE).cast("long"),
            F.col("n_samples"),
        ),
    )
    if min_tail_ms > 0:
        min_samples = (
            F.col(sr_col).cast("long") * min_tail_ms / 1000
        ).cast("long")
        out = out.where(
            F.col("seg_idx").isNull()
            | (F.col("seg_n_samples") >= min_samples)
        )
    return out


def _seg_transcript_cols(transcript_col, start_sample, this_samples, n):
    """Weak-alignment transcript window for a segment row: char range
    [floor(start*len/n), floor(end*len/n)) — monotone exhaustive integer
    boundaries, so concatenation over seg_idx reassembles the transcript
    exactly (the same convention segment_clips uses); NULL on the loud
    undecodable rows (n <= 0 divides to NULL and the when() gate keeps
    it NULL). Returns [] when no transcript column was requested."""
    if not transcript_col:
        return []
    tx = F.col("_transcript")
    tx_len = F.length(tx).cast("long")
    ch_start = F.floor(start_sample * tx_len / n).cast("long")
    ch_end = F.floor((start_sample + this_samples) * tx_len / n).cast(
        "long"
    )
    return [
        F.when(
            start_sample.isNotNull() & (n > 0),
            F.substring(tx, (ch_start + 1).cast("int"),
                        (ch_end - ch_start).cast("int")),
        ).alias("seg_transcript")
    ]


def segment_auto(
    df: DataFrame,
    segment_ms: int,
    min_tail_ms: int = 0,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    sr_col: str = "sr_hz",
    codec_col: str = "codec",
    transcript_col: str | None = None,
) -> DataFrame:
    """Route every row through the CHEAPEST correct segmentation path:
    raw ``pcm_s16le`` rows are byte-sliced entirely JVM-side (substring
    over an exploded index sequence — zero Python, the payload never
    crosses the Arrow boundary), everything else (WAV depths, G.711,
    ADPCM, real FLAC — and NULL codecs, which must be sniffed) takes the
    decode-once Arrow hop of ``segment_decoded``. Both branches emit the
    SAME sample-exact schema plus ``seg_path`` ('slice' | 'decode'), and
    the slice branch is byte-identical to what the decode branch would
    produce for the same payload (raw PCM "decode" is the identity).

    Scale shape: the two branches are predicate-disjoint scans of the
    input (`codec = 'pcm_s16le'` vs the rest) — the filter pushes to the
    parquet scan, and a corpus PARTITIONED BY codec prunes each branch to
    its own files, so the union costs one logical pass. No shuffle in
    either branch; the union is a plan-level concatenation, not an
    exchange."""
    pcm_mask = F.coalesce(
        F.col(codec_col) == PCM_CODEC, F.lit(False)
    )

    sps = (F.col(sr_col).cast("long") * segment_ms / 1000).cast("long")
    n_samples = (F.length(F.col(payload_col)) / BYTES_PER_SAMPLE).cast(
        "long"
    )
    n_seg = F.ceil(n_samples / sps).cast("long")
    # odd-length payloads are MALFORMED pcm_s16le, not floorable: the
    # decode path's frombuffer raises, so the slice path must go loud
    # (n_samples = -1, one NULL-segment row) on them too
    even_len = F.length(F.col(payload_col)) % 2 == 0
    slice_ok = (
        F.col(payload_col).isNotNull()
        & F.col(sr_col).isNotNull()
        & (sps > 0)
        & (n_samples > 0)
        & even_len
    )
    idxs = F.when(slice_ok, F.sequence(F.lit(0), (n_seg - 1).cast("int")))
    tx_in = (
        [F.col(transcript_col).alias("_transcript")] if transcript_col
        else []
    )
    sliced = (
        df.where(pcm_mask)
        .select(
            F.col(id_col),
            F.col(payload_col),
            F.col(sr_col),
            F.col(codec_col),
            *tx_in,
            sps.alias("_sps"),
            n_samples.alias("_n"),
            F.posexplode_outer(idxs).alias("_p", "seg_idx"),
        )
        .select(
            F.col(id_col),
            F.when(
                F.col("seg_idx").isNotNull(),
                F.concat(
                    F.col(id_col),
                    F.lit("#"),
                    F.lpad(F.col("seg_idx").cast("string"), 5, "0"),
                ),
            ).alias("segment_id"),
            F.col("seg_idx").cast("long").alias("seg_idx"),
            (F.col("seg_idx").cast("long") * F.col("_sps")).alias(
                "seg_start_sample"
            ),
            F.when(
                F.col("seg_idx").isNotNull(),
                F.least(
                    F.col("_sps"),
                    F.col("_n") - F.col("seg_idx").cast("long") * F.col("_sps"),
                ),
            ).alias("seg_n_samples"),
            # parity with the decode path's loud convention: -1 for
            # rows it could not decode (NULL payload / unusable rate),
            # the true decoded length otherwise (0 for empty payloads,
            # which also surface as one NULL-segment row)
            F.when(
                F.col(payload_col).isNull()
                | F.col(sr_col).isNull()
                | (F.col("_sps") <= 0)
                | (F.length(F.col(payload_col)) % 2 == 1),
                F.lit(-1),
            )
            .otherwise(F.col("_n"))
            .alias("n_samples"),
            F.col(sr_col),
            F.col(codec_col),
            F.when(
                F.col("seg_idx").isNotNull(),
                F.substring(
                    F.col(payload_col),
                    (
                        F.col("seg_idx").cast("long")
                        * F.col("_sps")
                        * BYTES_PER_SAMPLE
                        + 1
                    ).cast("int"),
                    # least(...) trims BOTH the natural tail and any odd
                    # trailing byte (raw "decode" floors to whole samples)
                    (
                        F.least(
                            F.col("_sps"),
                            F.col("_n")
                            - F.col("seg_idx").cast("long") * F.col("_sps"),
                        )
                        * BYTES_PER_SAMPLE
                    ).cast("int"),
                ),
            ).alias("seg_bytes"),
            F.lit("slice").alias("seg_path"),
            *_seg_transcript_cols(
                transcript_col,
                F.col("seg_idx").cast("long") * F.col("_sps"),
                F.least(
                    F.col("_sps"),
                    F.col("_n")
                    - F.col("seg_idx").cast("long") * F.col("_sps"),
                ),
                F.when(
                    F.col(payload_col).isNull()
                    | F.col(sr_col).isNull()
                    | (F.col("_sps") <= 0)
                    | (F.length(F.col(payload_col)) % 2 == 1),
                    F.lit(-1),
                ).otherwise(F.col("_n")),
            ),
        )
    )
    if min_tail_ms > 0:
        min_s = (F.col(sr_col).cast("long") * min_tail_ms / 1000).cast(
            "long"
        )
        sliced = sliced.where(
            F.col("seg_idx").isNull() | (F.col("seg_n_samples") >= min_s)
        )
    decoded = segment_decoded(
        df.where(~pcm_mask),
        segment_ms,
        min_tail_ms=min_tail_ms,
        id_col=id_col,
        payload_col=payload_col,
        sr_col=sr_col,
        codec_col=codec_col,
        transcript_col=transcript_col,
    ).withColumn("seg_path", F.lit("decode"))
    return sliced.unionByName(decoded)


def segment_energy(
    segments: DataFrame,
    msq_floor: int = 16,
    payload_col: str = "seg_bytes",
    n_col: str = "seg_n_samples",
) -> DataFrame:
    """Per-segment energy profile + silence gate over segmented PCM16:
    adds ``seg_sumsq`` / ``seg_peak`` (integer-EXACT sum of squares and
    peak |sample| — one Arrow hop, functions/audio.pcm_energy) and
    ``silent`` = sumsq < n_samples * ``msq_floor`` (an integer
    mean-square floor: msq_floor=16 flags anything quieter than a
    constant amplitude-4 tone). All integer arithmetic, so a SQL engine
    re-decoding the same bytes reproduces every value bit-for-bit.

    NULL payloads (a router's loud undecodable rows) carry NULL energy
    and NULL ``silent`` — they are not silently "loud" OR "quiet";
    gate them with the validation family, not this flag.

    Scale shape: one ArrowEvalPython over the segment rows, zero
    shuffle; at 10^12 segments this pipelines behind the segmentation
    Generate in the same stage. The energy hop could be fused into the
    decode kernel, but a separate hop works uniformly over BOTH router
    paths (slice output never touches Python otherwise)."""
    from jsonschema_spark.functions.audio import pcm_energy

    e = segments.withColumn("_e", pcm_energy(payload_col))
    return (
        e.withColumn("seg_sumsq", F.col("_e.sumsq"))
        .withColumn("seg_peak", F.col("_e.peak"))
        .withColumn(
            "silent",
            F.col("_e.sumsq")
            < F.col(n_col).cast("long") * F.lit(int(msq_floor)),
        )
        .drop("_e")
    )
