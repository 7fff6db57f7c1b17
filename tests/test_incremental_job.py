"""Daily-delta incremental validation job: a two-step snapshot chain whose
incremental violations equal full re-validation at every step."""

import json

from pyspark.sql import functions as F

from jobs.incremental_validate_job import main
from jsonschema_spark.operators.validate import validate

SCHEMA = {
    "type": "object",
    "required": ["id", "v"],
    "properties": {
        "id": {"type": "integer", "minimum": 0},
        "v": {"type": "number", "maximum": 100},
    },
}


def _snap(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


def _viol_set(df):
    return {(r.id, r.keyword) for r in df.collect()}


def test_incremental_chain_equals_full(spark, tmp_path):
    v1 = [(1, 10.0), (2, 200.0), (3, 30.0)]           # id=2 violates maximum
    v2 = v1 + [(4, -0.5)]                              # added row: clean v, fine id
    v2 = [(i, (400.0 if i == 3 else x)) for i, x in v2]  # id=3 changed -> violates
    v3 = [(i, x) for i, x in v2 if i != 2] + [(5, 50.0)]  # id=2 removed, id=5 added

    paths = {}
    for name, rows in (("s1", v1), ("s2", v2), ("s3", v3)):
        paths[name] = str(tmp_path / name)
        _snap(spark, rows).write.parquet(paths[name])
    out1, out2, out3 = (str(tmp_path / f"viol{i}") for i in (1, 2, 3))

    # first run: full (no prior)
    rc = main(["--new", paths["s1"], "--keys", "id",
               "--schema", _schema_file(tmp_path), "--violations", out1])
    assert rc == 0

    # second and third runs: incremental, chained
    rc = main(["--old", paths["s1"], "--new", paths["s2"], "--keys", "id",
               "--schema", _schema_file(tmp_path),
               "--prior-violations", out1, "--violations", out2])
    assert rc == 0
    rc = main(["--old", paths["s2"], "--new", paths["s3"], "--keys", "id",
               "--schema", _schema_file(tmp_path),
               "--prior-violations", out2, "--violations", out3])
    assert rc == 0

    for out, path in ((out1, "s1"), (out2, "s2"), (out3, "s3")):
        full = validate(spark.read.parquet(paths[path]), SCHEMA).violations(["id"])
        assert _viol_set(spark.read.parquet(out)) == _viol_set(full), path


def _schema_file(tmp_path):
    p = tmp_path / "schema.json"
    if not p.exists():
        p.write_text(json.dumps(SCHEMA))
    return str(p)
