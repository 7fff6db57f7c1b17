"""Dataset builder (jobs/make_dataset_job.py): clips in, per-split
WebDataset tensor shards + train-only CMVN + report out."""

import json
import os

import pyspark.sql.functions as F

from jobs.make_dataset_job import main, make_dataset


def test_make_dataset_end_to_end(spark, tmp_path):
    from jsonschema_spark.sources.clips import synth_fbank_mat_clips
    from jsonschema_spark.sources.shards import read_tensor_shards

    raw = synth_fbank_mat_clips(spark, 40, partitions=4).persist()
    clips = raw.drop(*[c for c in raw.columns if c.startswith("_")])
    # plant a byte-identical duplicate pair that must share a split
    dup = clips.limit(1).withColumn(
        "clip_id", F.concat(F.col("clip_id"), F.lit("-copy"))
    )
    clips = clips.unionByName(dup)
    out = str(tmp_path / "ds")
    report = make_dataset(
        clips, out,
        fractions={"train": 0.7, "valid": 0.3},
        deltas=True, labels=True,
    )
    assert report["input_rows"] == 41
    sp = report["splits"]
    assert set(sp) == {"train", "valid"}
    assert sp["train"]["rows"] + sp["valid"]["rows"] == 41
    # all decodable clips landed in shards
    total_sharded = sum(s["shard_samples"] for s in sp.values())
    decoded = sum(s["rows"] for s in sp.values()) - 0
    assert total_sharded <= decoded
    # the duplicate pair shares a split (content-fingerprint grouping)
    back = {}
    for name in sp:
        if sp[name]["shard_samples"] == 0:
            continue
        rows = read_tensor_shards(
            spark, os.path.join(out, name, "*.tar"),
            members={"mat": "long", "x": "double", "delta": "long",
                     "ddelta": "long", "labels": "long"},
        ).collect()
        for r in rows:
            back[r["clip_id"]] = name
    for cid, split_name in back.items():
        if cid.endswith("-copy"):
            assert back[cid[: -len("-copy")]] == split_name
    # train-only CMVN exists with 40 bins and positive frame counts
    cm = spark.read.parquet(os.path.join(out, "cmvn_train")).collect()
    assert len(cm) == 40 and all(r["n_frames"] > 0 for r in cm)
    # per-split index parquet supports ranged reads
    name = max(sp, key=lambda s: sp[s]["shard_samples"])
    idx = spark.read.parquet(os.path.join(out, name, "_index")).collect()
    assert idx
    r0 = idx[0]
    with open(os.path.join(out, name, r0["shard"]), "rb") as f:
        f.seek(r0["offset_data"])
        data = f.read(r0["size_bytes"])
    assert len(data) == r0["size_bytes"]
    # report.json round-trips
    on_disk = json.load(open(os.path.join(out, "report.json")))
    assert on_disk["splits"] == sp
    raw.unpersist()


def test_make_dataset_cli(spark, tmp_path, capsys):
    out = str(tmp_path / "dscli")
    rc = main([
        "--synthesize", "24", "--output", out,
        "--fractions", "train:0.8,valid:0.2", "--no-labels",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["splits"]["train"]["rows"] + rep["splits"]["valid"]["rows"] == 24
    assert os.path.exists(os.path.join(out, "report.json"))
