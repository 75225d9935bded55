"""Guard: the golden1..4 chunk file lists in run_tests.sh must cover every
golden-marked test, or a new parity file would silently skip CI.

Parses the GOLDENn=(...) arrays out of scripts/run_tests.sh, collects
``-m golden`` over (a) the whole tests/ tree and (b) the union of the
chunks, and exits nonzero on any mismatch (missing or double-counted).
"""

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect(targets):
    out = subprocess.run(
        [sys.executable, "-m", "pytest", *targets, "-m", "golden",
         "--collect-only", "-q", "-p", "no:cacheprovider"],
        cwd=ROOT, capture_output=True, text=True).stdout
    return {l.strip() for l in out.splitlines() if "::" in l}


sh = open(os.path.join(ROOT, "scripts/run_tests.sh")).read()
chunks = re.findall(r"GOLDEN\d=\(([^)]*)\)", sh)
if len(chunks) != 4:
    sys.exit(f"expected 4 GOLDENn arrays in run_tests.sh, found {len(chunks)}")
chunk_files = [f for c in chunks for f in c.split()]

total = collect(["tests/"])
chunked = collect(chunk_files)
missing = sorted(total - chunked)
extra = sorted(chunked - total)
print(f"golden tests: {len(total)} total, {len(chunked)} in chunks")
if missing:
    print("NOT covered by any golden chunk:", *missing, sep="\n  ")
if extra:
    print("in chunks but not collected from tests/:", *extra, sep="\n  ")
sys.exit(1 if (missing or extra) else 0)
