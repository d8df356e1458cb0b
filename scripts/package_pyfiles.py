"""Zip gpse/ into gpse.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile


def main(out: str = "gpse.zip") -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(os.path.join(root, out), "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(root, "gpse")
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    print(f"wrote {os.path.join(root, out)}")


if __name__ == "__main__":
    main()
