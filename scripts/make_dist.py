#!/usr/bin/env python3
"""Build dist/pdfspark.zip for `spark-submit --py-files` deployment
(the north rule's deploy path). Pure-source zip, deterministic order,
no timestamps variance beyond file mtimes."""

from __future__ import annotations

import os
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO_ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "pdfspark.zip")
    pkg = os.path.join(REPO_ROOT, "pdfspark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    arc = os.path.relpath(full, REPO_ROOT)
                    z.write(full, arc)
    print(out)
    return out


if __name__ == "__main__":
    main()
