#!/usr/bin/env python
"""Asset renaming utility (parity with the reference's renamer.py:1-9):
renames the files in each instrument bank directory to ``<numeric-prefix>.wav``.
"""

import os
import sys

BASE = sys.argv[1] if len(sys.argv) > 1 else "./test_files"

for bank in ("ha", "ji", "mi"):
    d = os.path.join(BASE, bank)
    if not os.path.isdir(d):
        continue
    for f in os.listdir(d):
        prefix = f.split(".")[0]
        os.rename(os.path.join(d, f), os.path.join(d, f"{prefix}.wav"))
