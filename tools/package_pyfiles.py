#!/usr/bin/env python
"""Build the spark-submit --py-files artifact (north_star: "the whole
pipeline ships via spark-submit --py-files to run at N and 4N
executors").

Produces a deterministic zip of the ``websearchengine_spark`` package::

    python tools/package_pyfiles.py [--out dist/websearchengine_spark.zip]

Cluster usage (any entry point)::

    spark-submit --py-files dist/websearchengine_spark.zip \\
        --master <cluster> cli_submit.py build --corpus ... --out ...

where ``cli_submit.py`` is any driver script importing
``websearchengine_spark.cli`` (the zip lands on every executor's
PYTHONPATH, so the pandas-UDF workers import the same code the driver
runs — the same guarantee session.get_spark arranges in local mode).
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "websearchengine_spark"


def build(out_path: str) -> list[str]:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    names = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                names.append(os.path.relpath(full, REPO))
    # fixed timestamp -> byte-stable artifact for identical sources
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in names:
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            # writestr honors the ZipInfo's compress_type, NOT the
            # archive-level default — without this every entry is STORED
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(os.path.join(REPO, rel), "rb") as fh:
                z.writestr(info, fh.read())
    return names


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(REPO, "dist", PKG + ".zip")
    )
    args = ap.parse_args()
    names = build(args.out)
    print(f"{args.out}: {len(names)} modules")


if __name__ == "__main__":
    main()
