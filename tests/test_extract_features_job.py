"""Feature-extraction job (jobs/extract_features_job.py): the
production last-mile — shards/parquet in, gated, quantized log-mel
partials + corpus CMVN out, one JSON report."""

import glob
import json

import pyspark.sql.functions as F

from jobs.extract_features_job import extract_features, main


def test_cmvn_matches_library_path(spark, tmp_path):
    """The job's CMVN (computed from the WRITTEN partials, no second
    decode pass) is bit-equal to functions/fbank.cmvn_stats."""
    from jsonschema_spark.functions.fbank import cmvn_stats
    from jsonschema_spark.sources.clips import synth_fbank_clips

    clips = synth_fbank_clips(spark, 16, partitions=4).drop(
        "_row_idx", "_sumq", "_sumsqq", "_nfr", "_n"
    ).persist()
    feats, cm, stats = extract_features(
        clips,
        features=str(tmp_path / "feats"),
        cmvn=str(tmp_path / "cmvn"),
    )
    want = sorted(tuple(r) for r in cmvn_stats(clips).collect())
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "cmvn")).collect()
    )
    assert got == want
    assert stats["input_rows"] == 16 and stats["gated_rows"] == 0
    assert stats["feature_rows"] == 16
    assert stats["decoded_rows"] == 12  # torn class undecodable
    written = spark.read.parquet(str(tmp_path / "feats"))
    assert written.count() == 16
    clips.unpersist()


def test_gated_extraction_drops_bad_clips(spark, tmp_path):
    """--gate composes the tonality + artifact screens: the dropout
    corpus's damaged/silent/torn classes never reach features."""
    from jsonschema_spark.sources.clips import (
        DROPOUT_CLASS_MOD,
        synth_dropout_clips,
    )

    n = 2 * DROPOUT_CLASS_MOD
    clips = synth_dropout_clips(spark, n, partitions=4)
    clips = clips.drop(*[c for c in clips.columns if c.startswith("_")])
    feats, cm, stats = extract_features(clips, gate=True)
    # only class 0 (clean) survives both screens
    assert stats["input_rows"] == n
    assert stats["gated_rows"] == 2 * 5
    assert stats["feature_rows"] == 2
    assert feats.where(F.col("n_frames") > 0).count() == 2


def test_job_cli_from_shards(spark, tmp_path, capsys):
    """End to end from WebDataset shards: pack a corpus, run the CLI
    against the shard glob, read back features + CMVN."""
    from jsonschema_spark.sources.clips import synth_fbank_clips
    from jsonschema_spark.sources.shards import write_tar_shards

    d = str(tmp_path / "shards")
    clips = synth_fbank_clips(spark, 12, partitions=2).drop(
        "_row_idx", "_sumq", "_sumsqq", "_nfr", "_n"
    )
    write_tar_shards(clips.coalesce(1), d, shard_bytes=1 << 20).collect()
    assert glob.glob(d + "/*.tar")
    rc = main([
        "--shards", d + "/*.tar",
        "--features", str(tmp_path / "f"),
        "--cmvn", str(tmp_path / "c"),
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_rows"] == 12
    assert stats["feature_rows"] == 12
    cm = spark.read.parquet(str(tmp_path / "c"))
    assert cm.count() == 40
    assert cm.where(F.col("n_frames") > 0).count() == 40


def test_matrix_deltas_specaugment_output(spark, tmp_path):
    """--matrix writes training tensors from the SAME decode pass as
    the partials (one Arrow hop); --deltas matches the numpy regression
    reference; --specaugment matches the md5 mask replay; and the CMVN
    path is bit-equal to the non-matrix run."""
    import numpy as np

    from jsonschema_spark.functions.fbank import (
        N_MELS,
        delta_features_np,
    )
    from jsonschema_spark.sources.clips import synth_fbank_mat_clips
    from tests.test_augment import _expected_masks

    raw = synth_fbank_mat_clips(spark, 12, partitions=3).persist()
    clips = raw.drop(*[c for c in raw.columns if c.startswith("_")])
    feats, cm, stats = extract_features(
        clips,
        features=str(tmp_path / "feats"),
        cmvn=str(tmp_path / "cmvn"),
        matrix=str(tmp_path / "mat"),
        deltas=True,
        specaugment="ep0",
    )
    # CMVN equals the plain (no-matrix) path bit-for-bit
    _, _, _ = extract_features(clips, cmvn=str(tmp_path / "cmvn2"))
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "cmvn")).collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "cmvn2")).collect()
    )
    assert a == b

    mat = spark.read.parquet(str(tmp_path / "mat"))
    ledger = {
        r["clip_id"]: (list(r["_mat"]), r["_nfr"])
        for r in raw.select("clip_id", "_mat", "_nfr").collect()
    }
    rows = mat.collect()
    assert len(rows) == 12
    for r in rows:
        flat, nfr = ledger[r["clip_id"]]
        assert list(r["mat_q"]) == flat
        q = np.asarray(flat, dtype=np.int64).reshape(nfr, N_MELS)
        ed, edd = delta_features_np(q)
        assert list(r["delta_q"]) == ed.reshape(-1).tolist()
        assert list(r["ddelta_q"]) == edd.reshape(-1).tolist()
        tm, fm = _expected_masks(r["clip_id"], nfr, seed="ep0")
        for pos, v in enumerate(flat):
            t, m = pos // N_MELS, pos % N_MELS
            masked = any(s <= t < s + w for s, w in tm) or any(
                s <= m < s + w for s, w in fm
            )
            assert r["aug_q"][pos] == (0 if masked else v)
    raw.unpersist()


def test_tensor_shards_end_to_end(spark, tmp_path, capsys):
    """Shards in, tensor shards out: the full production cycle via the
    CLI — WebDataset clip tars -> gated decode -> one-hop tensors ->
    npy tensor tars; the read-back x doubles are bit-equal to the
    engine's normalize chain."""
    import numpy as np

    from jsonschema_spark.sources.clips import synth_fbank_mat_clips
    from jsonschema_spark.sources.shards import read_tensor_shards

    raw = synth_fbank_mat_clips(spark, 10, partitions=2).persist()
    clips = raw.drop(*[c for c in raw.columns if c.startswith("_")])
    out = str(tmp_path / "tshards")
    _f, _c, stats = extract_features(
        clips, tensor_shards=out, deltas=True, specaugment="ep0"
    )
    assert stats["shard_samples"] == stats["decoded_rows"]
    back = read_tensor_shards(
        spark,
        out + "/*.tar",
        members={
            "mat": "long", "x": "double", "delta": "long",
            "ddelta": "long", "aug": "long",
        },
    )
    rows = back.collect()
    assert len(rows) == stats["shard_samples"]
    ledger = {
        r["clip_id"]: (list(r["_mat"]), r["_nfr"])
        for r in raw.select("clip_id", "_mat", "_nfr").collect()
    }
    from jsonschema_spark.functions.fbank import (
        N_MELS,
        delta_features_np,
    )

    for r in rows:
        flat, nfr = ledger[r["clip_id"]]
        assert list(r["mat"]) == flat
        q = np.asarray(flat, dtype=np.int64).reshape(nfr, N_MELS)
        ed, _ = delta_features_np(q)
        assert list(r["delta"]) == ed.reshape(-1).tolist()
        assert r["transcript"] is not None
        assert len(r["x"]) == len(flat)
    raw.unpersist()


def test_labels_in_tensor_shards(spark, tmp_path):
    """(features, labels) pairs: --labels encodes transcripts through
    the char-CTC vocab into 1-D npy members next to the tensors."""
    from jsonschema_spark.operators.labels import DEFAULT_VOCAB
    from jsonschema_spark.sources.clips import synth_fbank_mat_clips
    from jsonschema_spark.sources.shards import read_tensor_shards

    raw = synth_fbank_mat_clips(spark, 8, partitions=2)
    clips = raw.drop(*[c for c in raw.columns if c.startswith("_")])
    out = str(tmp_path / "lshards")
    _f, _c, stats = extract_features(
        clips, tensor_shards=out, labels=True
    )
    back = read_tensor_shards(
        spark,
        out + "/*.tar",
        members={"mat": "long", "x": "double", "labels": "long"},
    ).collect()
    assert len(back) == stats["shard_samples"] > 0
    import re

    for r in back:
        norm = re.sub(r"\s+", " ", r["transcript"].lower()).strip()
        want = [
            DEFAULT_VOCAB.find(c) + 1
            for c in norm
            if DEFAULT_VOCAB.find(c) >= 0
        ]
        assert list(r["labels"]) == want
