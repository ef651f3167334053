"""Build the --py-files artifact for spark-submit deployment.

    python tools/package_pyfiles.py [dist/serialization_agents_spark.zip]

Zips the `serialization_agents_spark` package (sources only — no
__pycache__, no tests) so executors can import it via

    spark-submit --py-files dist/serialization_agents_spark.zip \
        serialization_agents_spark/runner.py ...

Deterministic: entries are sorted and timestamps zeroed, so re-packaging
an unchanged tree yields a byte-identical artifact (content-addressable
deploys / cache-friendly object stores).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "serialization_agents_spark"


def build_zip(out_path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    entries = []
    pkg_root = os.path.join(REPO, PACKAGE)
    for base, dirs, files in os.walk(pkg_root):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            full = os.path.join(base, f)
            arc = os.path.relpath(full, REPO)
            entries.append((full, arc))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data, zipfile.ZIP_DEFLATED)
    return out_path


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", f"{PACKAGE}.zip"
    )
    path = build_zip(out)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path}: {n} modules")


if __name__ == "__main__":
    main()
