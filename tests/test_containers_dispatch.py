"""Unified container dispatch (functions/containers.py).

Every container family routes to its strongest check through ONE sniff,
and the metadata gates catch header-vs-column disagreement — the
mislabeled-upload signature schema keywords cannot express.
"""

import numpy as np
import pandas as pd
import pytest

from jsonschema_spark.functions.containers import (
    container_meta_gates,
    container_profile_batch,
    container_sniff,
)


def _wav(m=3200, sr=16000):
    from jsonschema_spark.functions.audio import encode_wav_pcm16

    x = (np.arange(m, dtype=np.int64) * 37) % 8000 - 4000
    return encode_wav_pcm16(x, sr)


def test_sniff_covers_every_family():
    from jsonschema_spark.functions.audio import encode_aiff, encode_au
    from jsonschema_spark.functions.flac import encode_flac
    from jsonschema_spark.functions.mp3 import encode_mp3_stream
    from jsonschema_spark.functions.ogg import encode_ogg_opus

    x = (np.arange(800, dtype=np.int64) * 37) % 8000 - 4000
    assert container_sniff(_wav()) == "wav"
    assert container_sniff(encode_flac(x.astype(np.int32), 16000)) == "flac"
    assert container_sniff(encode_aiff(x, 16000)) == "aiff"
    assert container_sniff(encode_au(x, 16000)) == "au"
    assert container_sniff(encode_ogg_opus(3)) == "ogg"
    assert container_sniff(
        encode_mp3_stream(3, 2, 3, 16000, "mono", (64,))
    ) == "mp3"
    # bare sync-word MP3 (no ID3) and bare PCM
    assert container_sniff(b"\xff\xe2rest") == "mp3"
    assert container_sniff(b"\x01\x02\x03\x04") == "raw"


def test_profile_routes_and_normalizes():
    from jsonschema_spark.functions.mp3 import encode_mp3_stream

    mp3 = encode_mp3_stream(10, 2, 3, 16000, "mono", (64,), seed=2)
    rows = container_profile_batch(
        pd.Series([_wav(), mp3, b"\x00\x01" * 100, None], dtype=object)
    )
    wav = rows.iloc[0]
    assert wav["ok"] and wav["container"] == "wav"
    assert wav["sample_rate"] == 16000 and wav["n_samples"] == 3200
    assert wav["parsed_dur_ms"] == 200
    m = rows.iloc[1]
    assert m["ok"] and m["container"] == "mp3"
    assert m["sample_rate"] == 16000
    assert m["parsed_dur_ms"] == 10 * 576 * 1000 // 16000
    assert pd.isna(m["n_samples"])  # structural walk, no decode
    raw = rows.iloc[2]
    assert raw["ok"] and raw["container"] == "raw"
    assert raw["n_samples"] == 100 and pd.isna(raw["sample_rate"])
    assert rows.iloc[3]["error"] == "null_payload"


def test_failures_carry_the_walker_error():
    from jsonschema_spark.functions.flac import encode_flac
    from jsonschema_spark.functions.ogg import encode_ogg_opus

    x = (np.arange(3200, dtype=np.int64) * 37) % 8000 - 4000
    torn_flac = encode_flac(x.astype(np.int32), 16000)[:-9]
    ogg = bytearray(encode_ogg_opus(5, seed=1))
    ogg[-3] ^= 0x01
    rows = container_profile_batch(
        pd.Series([torn_flac, bytes(ogg), b"\x01\x02\x03"], dtype=object)
    )
    assert not rows.iloc[0]["ok"]
    assert rows.iloc[0]["container"] == "flac"
    assert rows.iloc[0]["error"].startswith("decode_failed")
    assert not rows.iloc[1]["ok"]
    assert rows.iloc[1]["error"] == "crc_mismatch"
    assert not rows.iloc[2]["ok"]  # odd-length bare PCM
    assert rows.iloc[2]["error"] == "odd_pcm_length"


def test_meta_gates_catch_header_column_disagreement(spark):
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.containers import (
        audio_container_profile,
    )

    rows = [
        ("a", _wav(3200, 16000), 16000, 200),   # agrees
        ("b", _wav(3200, 16000), 22050, 200),   # rate lies
        ("c", _wav(3200, 16000), 16000, 900),   # duration lies
        ("d", b"\x00\x01" * 3200, 16000, 200),  # bare PCM: column-rate dur
        ("e", None, 16000, 200),                # null payload
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int"
    )
    g = container_meta_gates(audio_container_profile("bytes"))
    got = {
        r["clip_id"]: r
        for r in df.select("clip_id", g.alias("g")).collect()
    }
    assert got["a"]["g"]["meta_ok"] is True
    assert got["b"]["g"]["rate_ok"] is False
    assert got["b"]["g"]["dur_ok"] is True
    assert got["c"]["g"]["dur_ok"] is False
    assert got["d"]["g"]["meta_ok"] is True  # 3200 samples @16 k = 200 ms
    assert got["e"]["g"]["meta_ok"] is False  # unmeasurable fails loudly


def test_mixed_ledger_corpus_verifies(spark):
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.containers import (
        audio_container_profile,
    )
    from jsonschema_spark.sources.clips import (
        MIXED_CLASS_MOD,
        synth_mixed_clips,
    )

    clips = synth_mixed_clips(spark, 2 * MIXED_CLASS_MOD)
    prof = clips.select(
        "_row_idx", "_container", "_ok", "_rate", "_channels", "_n",
        "_pdur", "_rate_ok", "_dur_ok", "_meta_ok", "sr_hz", "dur_ms",
        audio_container_profile("bytes").alias("p"),
    )
    rows = prof.select(
        "*", container_meta_gates(F.col("p")).alias("g")
    ).collect()
    assert len(rows) == 2 * MIXED_CLASS_MOD
    for r in rows:
        p, g = r["p"], r["g"]
        assert p["container"] == r["_container"], r["_row_idx"]
        assert p["ok"] == r["_ok"], r["_row_idx"]
        assert p["sample_rate"] == r["_rate"], r["_row_idx"]
        assert p["channels"] == r["_channels"], r["_row_idx"]
        assert p["n_samples"] == r["_n"], r["_row_idx"]
        assert p["parsed_dur_ms"] == r["_pdur"], r["_row_idx"]
        assert g["rate_ok"] == r["_rate_ok"], r["_row_idx"]
        assert g["dur_ok"] == r["_dur_ok"], r["_row_idx"]
        assert g["meta_ok"] == r["_meta_ok"], r["_row_idx"]
