"""Build the ``--py-files`` artifact for cluster submission.

Zips the ``json_to_avro_schema_spark`` package (source only, no caches)
into ``engine.zip`` so a run ships as::

    spark-submit --master <cluster> --py-files engine.zip \
        scripts/submit_job.py spec.json --table <input> --out <dir>

Executors unpack the zip onto their PYTHONPATH — no install step on the
cluster. Usage: ``python scripts/make_pyfiles.py [out.zip]``.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "json_to_avro_schema_spark"


def build(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "engine.zip")
    print(build(out))
