"""Build the --py-files artifact: dist/jsonschema_spark.zip.

The zip ships ONLY the library package (pure .py — no tests, no jobs); the
driver script stays a plain file outside it, which is exactly the

    spark-submit --py-files jsonschema_spark.zip jobs/validate_clips_job.py ...

shape the north rule requires. The build is deterministic (fixed
timestamps, sorted entries, fixed permissions) so rebuilding from the same
tree is byte-identical — an artifact hash can stand in for a version.
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "jsonschema_spark")
    parent = os.path.dirname(os.path.abspath(out))
    os.makedirs(parent, exist_ok=True)
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "dist", "jsonschema_spark.zip")
    )
    args = ap.parse_args(argv)
    print(build(args.out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
