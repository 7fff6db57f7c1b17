"""End-to-end `spark-submit --py-files` smoke: the north rule's submission
shape (BASELINE.json north_rule: "run via spark-submit --py-files").

The test proves the library actually ships in the zip: the job file is
copied OUT of the repo into a tmpdir, the subprocess runs with that tmpdir
as cwd and no PYTHONPATH, so `import jsonschema_spark` can only resolve
from the --py-files artifact spark-submit distributes.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_json_line(text: str) -> dict:
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in stdout:\n{text[-2000:]}")


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zip_path = tmp_path / "jsonschema_spark.zip"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py"),
         "--out", str(zip_path)],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    names = zipfile.ZipFile(zip_path).namelist()
    assert "jsonschema_spark/__init__.py" in names
    assert "jsonschema_spark/operators/validate.py" in names
    assert not any(n.startswith(("tests/", "jobs/")) for n in names)

    # determinism: a rebuild is byte-identical
    zip2 = tmp_path / "rebuild.zip"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py"),
         "--out", str(zip2)],
        capture_output=True, text=True, timeout=60, check=True,
    )
    assert zip_path.read_bytes() == zip2.read_bytes()

    job = tmp_path / "validate_clips_job.py"
    shutil.copy(os.path.join(REPO, "jobs", "validate_clips_job.py"), job)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update(
        OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1", MKL_NUM_THREADS="1",
        PYSPARK_PYTHON=sys.executable, PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    manifest = tmp_path / "manifest"
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", str(zip_path), str(job),
         "--synthesize", "300", "--buckets", "8",
         "--manifest", str(manifest)],
        cwd=str(tmp_path), capture_output=True, text=True, env=env,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    out = _last_json_line(r.stdout)
    assert out["manifest_rows"] == 300
    assert out["processed_partitions"] == 8
    assert out["passed"] + out["failed"] == 300
    assert out["failed"] > 0  # synth plants violations
