"""Audio fingerprint near-dup dedup: spectral fingerprint kernel margins,
operator vs planted ledger, LSH == brute force, plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import (
    encode_payload,
    pcm16_from_float,
    spectral_fingerprint_batch,
)
from jsonschema_spark.operators import dedup
from jsonschema_spark.sources.clips import (
    ND_MAX_UNIQUE,
    _neardup_signal,
    synth_near_dup_clips,
)


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.dot(a, b))  # fingerprints are L2-normalized


def _fp(payloads):
    return spectral_fingerprint_batch(pd.Series(payloads)).tolist()


def test_fingerprint_reencode_invariance():
    """The same recording re-encoded (lossless flac, lossy opus, gain 0.7)
    fingerprints within cosine 1e-6 of its source; a different recording
    stays far below the 0.97 threshold."""
    sig = _neardup_signal(7, 16000)
    other = _neardup_signal(8, 16000)
    base = encode_payload(pcm16_from_float(sig), "pcm_s16le")
    flac = encode_payload(pcm16_from_float(sig), "flac")
    opus = encode_payload(pcm16_from_float(sig * 0.7), "opus")
    diff = encode_payload(pcm16_from_float(other), "pcm_s16le")
    f_base, f_flac, f_opus, f_diff = _fp([base, flac, opus, diff])
    assert _cos(f_base, f_flac) > 1 - 1e-6
    assert _cos(f_base, f_opus) > 1 - 1e-6
    assert _cos(f_base, f_diff) < 0.95


def test_fingerprint_bad_payloads_are_none():
    out = _fp([None, b"", b"\x01\x02\x03\x04"])
    assert out[0] is None and out[1] is None
    # 4 arbitrary bytes decode as raw PCM16 (2 samples) — still a vector
    assert out[2] is None or len(out[2]) == 128


def test_fingerprint_is_l2_normalized_float32():
    sig = _neardup_signal(3, 8000)
    (f,) = _fp([encode_payload(pcm16_from_float(sig), "pcm_s16le")])
    assert len(f) == 128
    assert abs(float(np.linalg.norm(f)) - 1.0) < 1e-5


def test_synth_guard_rejects_grid_overflow(spark):
    with pytest.raises(ValueError):
        synth_near_dup_clips(spark, ND_MAX_UNIQUE + 1)


def _planted_pairs(n, dup_period=4):
    return {
        (f"clip-{i - 1:012d}", f"clip-{i:012d}")
        for i in range(n)
        if i % dup_period == dup_period - 1 and i > 0
    }


def test_audio_near_dups_match_planted_ledger(spark):
    n = 240
    clips = synth_near_dup_clips(spark, n)
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.audio_near_dup_pairs(clips).collect()
    }
    assert got == _planted_pairs(n)


def test_audio_near_dups_lsh_equals_brute(spark):
    n = 160
    clips = synth_near_dup_clips(spark, n)
    lsh = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in dedup.audio_near_dup_pairs(clips, method="lsh").collect()
    }
    brute = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in dedup.audio_near_dup_pairs(clips, method="brute").collect()
    }
    assert lsh == brute
    assert len(lsh) == len(_planted_pairs(n))


def test_audio_near_dups_plan_single_arrow_hop(spark):
    """The fingerprint UDF must evaluate ONCE per row: (a) the cached
    fingerprint stage contains exactly one ArrowEvalPython (no stacked
    double-eval from filter pushdown under the projection), and (b) the
    pair plan consumes it through InMemoryTableScan (the persist barrier
    that stops per-plane re-expansion)."""
    from jsonschema_spark.functions.audio import audio_fingerprint

    clips = synth_near_dup_clips(spark, 60)
    fp = clips.select(
        F.col("clip_id").alias("vec_id"),
        audio_fingerprint("bytes").alias("embedding"),
    )
    fp_plan = fp._jdf.queryExecution().executedPlan().toString()
    assert fp_plan.count("ArrowEvalPython") == 1

    pairs = dedup.audio_near_dup_pairs(clips)
    pairs.collect()  # materialize the persisted fingerprint stage
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    # every ArrowEvalPython occurrence is a reprint of the SAME cached
    # child (one eval at materialization): no stacked double-eval remains
    import re

    assert not re.search(
        r"ArrowEvalPython[^\n]*\n[^\n]*ArrowEvalPython", plan
    )
