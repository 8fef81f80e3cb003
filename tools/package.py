"""Build the --py-files artifact for cluster submission.

    python tools/package.py [--out dist/kgspark.zip]
    spark-submit --py-files dist/kgspark.zip run_pipeline.py --input ... \
        --output ... --work-dir ...

Zips the pure-Python package (no data, no tests) so every executor can import
``knowledgegraphbuilder_spark`` — the standard deployment unit for a
multi-executor cluster (BASELINE.json north rule).
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    pkg = os.path.join(ROOT, "knowledgegraphbuilder_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    return out


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "dist", "kgspark.zip"))
    args = ap.parse_args()
    out = build(args.out)
    names = zipfile.ZipFile(out).namelist()
    print(f"{out}: {len(names)} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
