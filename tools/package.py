"""Build zerox_spark.zip for spark-submit --py-files (north-rule submit
surface; verified: `spark-submit --master local[8] --py-files
zerox_spark.zip zerox_spark/job.py ...` runs the full job from outside the
repo directory).

Usage: python tools/package.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "zerox_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "zerox_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)


if __name__ == "__main__":
    main()
