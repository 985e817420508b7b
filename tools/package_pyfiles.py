"""Build the --py-files zip for cluster submission (SURVEY.md §7 M5).

Usage:  python tools/package_pyfiles.py [out.zip]
Then:   spark-submit --py-files typical_spark.zip jobs/validate_transcripts.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = "typical_spark.zip") -> str:
    out = os.path.join(REPO, out) if not os.path.isabs(out) else out
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "typical_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "typical_spark.zip")
    print(path)
