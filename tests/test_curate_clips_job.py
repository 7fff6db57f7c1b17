"""Audio-clip curation funnel (jobs/curate_clips_job.py): schema gate ->
SNR+transcript invariant gate -> duplicate-id resolution -> exact payload
dedup, with hand-planted rows that exercise every stage deterministically."""

from pyspark.sql import Row

from jobs.curate_clips_job import curate_clips
from jsonschema_spark.functions.audio import (
    encode_payload,
    pcm16_from_float,
    reference_signal,
    reference_transcript,
)
from jsonschema_spark.sources.clips import CLIPS_SCHEMA, synth_clips


def _clip(cid, codec="pcm_s16le", sr=16000, dur=400, payload_of=None,
          transcript=None):
    n = sr * dur // 1000
    src = payload_of or cid
    payload = encode_payload(pcm16_from_float(reference_signal(src, n)), codec)
    return Row(
        clip_id=cid,
        bytes=bytearray(payload),
        sr_hz=sr,
        dur_ms=dur,
        codec=codec,
        transcript=transcript if transcript is not None else reference_transcript(cid),
    )


def test_curate_clips_planted_funnel(spark):
    a = "clip-000000000001"
    d = "clip-000000000003"
    e = "clip-000000000004"
    f = "clip-000000000005"
    rows = [
        _clip(a),                                  # survivor
        _clip(a),                                  # duplicate id (identical row)
        _clip(d, payload_of=e),                    # wrong signal -> SNR fail
        _clip(e, codec="amr"),                     # codec enum -> schema invalid
        _clip(f, transcript="wrong words"),        # transcript mismatch
    ]
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    curated, stats = curate_clips(df)
    assert stats["input_rows"] == 5
    # the SNR gate is a SCHEMA content check (contentMediaType), so the
    # wrong-signal row d counts as schema-invalid alongside e's codec enum
    assert stats["schema_invalid"] == 2            # d (SNR), e (enum)
    assert stats["invariant_failed"] == 1          # f (transcript mismatch)
    assert stats["duplicate_ids_removed"] == 1     # second copy of a
    assert stats["duplicate_payloads_removed"] == 0
    assert stats["output_rows"] == 1
    assert [r.clip_id for r in curated.select("clip_id").collect()] == [a]


def test_curate_clips_payload_dedup(spark):
    """Cross-id payload duplicates: in the synthetic world audio is a pure
    function of clip_id, so a copied payload necessarily fails the SNR
    invariant — relax the threshold to isolate the payload-dedup stage."""
    a = "clip-000000000001"
    c = "clip-000000000002"
    rows = [
        _clip(a),
        _clip(c, payload_of=a, transcript=reference_transcript(c)),
    ]
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    curated, stats = curate_clips(df, snr_threshold_db=-1000.0)
    assert stats["schema_invalid"] == 0
    assert stats["invariant_failed"] == 0
    assert stats["duplicate_ids_removed"] == 0
    assert stats["duplicate_payloads_removed"] == 1
    assert [r.clip_id for r in curated.select("clip_id").collect()] == [a]


def test_curate_clips_synth_consistency(spark, tmp_path):
    """Funnel identities over the planted synthetic table + output write."""
    out = str(tmp_path / "curated_clips")
    clips = synth_clips(spark, 1500)
    curated, stats = curate_clips(clips, output=out)
    assert stats["output_rows"] == (
        stats["input_rows"]
        - stats["schema_invalid"]
        - stats["invariant_failed"]
        - stats["duplicate_ids_removed"]
        - stats["duplicate_payloads_removed"]
    )
    assert sum(stats["by_codec"].values()) == stats["output_rows"]
    # planted rates: ~1% schema violators per family, ~0.5% dup ids
    assert stats["schema_invalid"] > 0
    assert stats["duplicate_ids_removed"] > 0
    written = spark.read.parquet(out)
    assert written.count() == stats["output_rows"]
    assert set(written.columns) == {
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"
    }


def test_curate_clips_near_dedup_stage(spark):
    """near_dedup=True removes gain-adjusted re-encodes of the same
    recording under different ids (audio-fingerprint LSH + connected
    components, min clip_id survives). The near-dup corpus has no
    reference-signal ground truth, so the SNR invariant is off —
    the documented real-corpus setting."""
    from jsonschema_spark.sources.clips import synth_near_dup_clips

    n = 120  # plants a re-encode of row i-1 at every i % 4 == 3
    clips = synth_near_dup_clips(spark, n)
    curated, stats = curate_clips(
        clips.drop("_row_idx"), snr_threshold_db=None, near_dedup=True
    )
    planted = sum(1 for i in range(n) if i % 4 == 3 and i > 0)
    assert stats["schema_invalid"] == 0
    assert stats["invariant_failed"] == 0
    assert stats["duplicate_ids_removed"] == 0
    assert stats["duplicate_payloads_removed"] == 0
    assert stats["near_duplicates_removed"] == planted
    assert stats["output_rows"] == n - planted
    # survivors are exactly the non-planted (base) rows
    ids = {r["clip_id"] for r in curated.select("clip_id").collect()}
    assert ids == {f"clip-{i:012d}" for i in range(n) if not (i % 4 == 3 and i > 0)}


def test_curate_clips_near_dedup_off_by_default(spark):
    from jsonschema_spark.sources.clips import synth_near_dup_clips

    clips = synth_near_dup_clips(spark, 40)
    _curated, stats = curate_clips(clips.drop("_row_idx"), snr_threshold_db=None)
    assert stats["near_duplicates_removed"] == 0
    assert stats["output_rows"] == 40


def test_curate_clips_normalization_stage(spark):
    """--trim-silence/--resample rewrite payloads AFTER gates + dedup:
    byte counts shrink, survivors unchanged, attribution in the report."""
    import numpy as np

    a, b = "clip-000000000001", "clip-000000000002"
    na, nb = 16000 * 400 // 1000, 16000 * 400 // 1000
    pad = np.zeros(640)  # 40 ms of silence
    rows = []
    for cid, n in ((a, na), (b, nb)):
        sig = np.concatenate([pad, reference_signal(cid, n).astype(np.float64)])
        rows.append(Row(
            clip_id=cid, bytes=bytearray(pcm16_from_float(sig).tobytes()),
            sr_hz=16000, dur_ms=440, codec="pcm_s16le",
            transcript=reference_transcript(cid),
        ))
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    # padded payloads don't match the reference signal -> skip the SNR gate
    curated, stats = curate_clips(
        df, snr_threshold_db=None, trim=True, resample_sr=8000
    )
    assert stats["output_rows"] == 2
    assert stats["rows_trimmed"] == 2 and stats["rows_resampled"] == 2
    assert stats["bytes_in"] == 2 * (640 + na) * 2
    assert stats["bytes_out"] == (na + nb)  # trimmed, then every 2nd sample
    out = {r["clip_id"]: r for r in curated.collect()}
    assert out[a]["sr_hz"] == 8000 and len(bytes(out[a]["bytes"])) == na
    ref = pcm16_from_float(reference_signal(a, na).astype(np.float64))
    assert bytes(out[a]["bytes"]) == ref[::2].tobytes()


def test_curate_clips_bandwidth_gate(spark):
    from jsonschema_spark.sources.clips import (
        BW_CLASS_MOD,
        BW_CLS_CROWDED,
        BW_CLS_UPSAMPLED,
        synth_bandwidth_clips,
    )

    n = 90
    clips = synth_bandwidth_clips(spark, n, partitions=4).drop("_row_idx")
    # pure tones don't match the two-harmonic reference -> skip SNR gate
    curated, stats = curate_clips(
        clips, snr_threshold_db=None, bandwidth_gate=True
    )
    expected_rejected = sum(
        1 for i in range(n)
        if i % BW_CLASS_MOD in (BW_CLS_UPSAMPLED, BW_CLS_CROWDED)
    )
    assert stats["bandwidth_rejected"] == expected_rejected
    assert stats["output_rows"] == n - expected_rejected
    assert stats["quality_rejected"] == 0
    assert curated.count() == n - expected_rejected

    # gate off by default: nothing attributed to bandwidth
    _, stats_off = curate_clips(clips, snr_threshold_db=None)
    assert stats_off["bandwidth_rejected"] == 0
    assert stats_off["output_rows"] == n


def test_curate_clips_transcode_stage(spark):
    """--transcode-flac re-encodes the FINAL payloads losslessly: runs
    after trim/resample, codec column flips to flac, byte totals shrink,
    and decode(transcoded) == the post-normalization samples."""
    import numpy as np

    from jsonschema_spark.functions.audio import decode_payload

    a, b = "clip-000000000001", "clip-000000000002"
    n = 16000 * 400 // 1000
    rows = []
    for cid in (a, b):
        sig = reference_signal(cid, n).astype(np.float64)
        rows.append(Row(
            clip_id=cid, bytes=bytearray(pcm16_from_float(sig).tobytes()),
            sr_hz=16000, dur_ms=400, codec="pcm_s16le",
            transcript=reference_transcript(cid),
        ))
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    curated, stats = curate_clips(
        df, snr_threshold_db=None, resample_sr=8000, transcode=True
    )
    assert stats["output_rows"] == 2
    assert stats["rows_resampled"] == 2 and stats["rows_transcoded"] == 2
    assert stats["bytes_out"] < stats["bytes_in"]
    out = {r["clip_id"]: r for r in curated.collect()}
    for cid in (a, b):
        r = out[cid]
        assert r["codec"] == "flac" and bytes(r["bytes"])[:4] == b"fLaC"
        ref = pcm16_from_float(reference_signal(cid, n).astype(np.float64))
        dec = decode_payload(bytes(r["bytes"]))
        assert np.array_equal(
            np.asarray(dec, dtype=np.int64),
            ref[::2].astype(np.int64),  # decimated first, then lossless
        )
    assert stats["by_codec"] == {"flac": 2}


def test_curate_clips_hygiene_gates(spark):
    """The three content-hygiene screens compose into the funnel with
    first-failing-stage attribution: dropout-corpus classes route to
    the artifact stage (silence/torn clips fail tonality FIRST when
    both gates are on), and each gate defaults off."""
    from jsonschema_spark.sources.clips import (
        DROPOUT_CLASS_MOD,
        synth_dropout_clips,
    )

    n = 4 * DROPOUT_CLASS_MOD
    led = ["_nd", "_dms", "_mdms", "_nc", "_thr", "_int", "_n",
           "_drop", "_click", "_ok", "_meas"]
    clips = synth_dropout_clips(spark, n, partitions=4).drop(
        "_row_idx", *led
    )
    # artifact gate alone: classes 1,2,3 (planted artifacts) + 4,5
    # (silence/torn: not measurable) all attribute to the artifact stage
    curated, stats = curate_clips(
        clips, snr_threshold_db=None, artifact_gate=True
    )
    assert stats["artifact_rejected"] == 4 * 5
    assert stats["tonality_rejected"] == 0
    assert stats["output_rows"] == 4
    assert curated.count() == 4

    # tonality + artifacts: silence/torn are unmeasurable to BOTH
    # screens and the tonality stage runs FIRST in the chain, so it
    # claims them; the artifact stage keeps only the planted classes
    _, stats2 = curate_clips(
        clips, snr_threshold_db=None, tonality_gate=True,
        artifact_gate=True,
    )
    assert stats2["tonality_rejected"] == 4 * 2  # silence + torn
    assert stats2["artifact_rejected"] == 4 * 3  # dropouts/clicks/both
    assert stats2["output_rows"] == 4

    # all gates off: everything flows through
    _, stats_off = curate_clips(clips, snr_threshold_db=None)
    assert stats_off["artifact_rejected"] == 0
    assert stats_off["snr_est_rejected"] == 0
    assert stats_off["output_rows"] == n


def test_curate_clips_snr_est_gate(spark):
    """The reference-free SNR stage rejects exactly the under-floor
    classes of the SNR ledger corpus (planted 7/0 dB mixes, static,
    silence, torn)."""
    from jsonschema_spark.sources.clips import (
        SNR_CLASS_MOD,
        synth_snr_clips,
    )

    n = 4 * SNR_CLASS_MOD
    clips = synth_snr_clips(spark, n, partitions=4).drop(
        "_row_idx", "_planted_db", "_est", "_p10", "_p90", "_act",
        "_nfr", "_n", "_noisy", "_ok", "_meas",
    )
    curated, stats = curate_clips(
        clips, snr_threshold_db=None, snr_est_gate=True
    )
    # classes 2,3,4,5,6 of 7 violate the 15 dB floor / measurability
    assert stats["snr_est_rejected"] == 4 * 5
    assert stats["output_rows"] == 4 * 2
    assert curated.count() == 4 * 2
