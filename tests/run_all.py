"""Run the full test suite as one subprocess per test file.

Fallback verification gate for memory-constrained boxes: a single pytest
process accumulates XLA compile-cache memory across ~160 jit signatures and
(before the per-module cache clearing in conftest.py) hard-segfaulted near
the end of the run on the 2-CPU container.  Per-file subprocesses bound the
peak absolutely, at the cost of re-importing jax per file.

Usage:  python tests/run_all.py  [extra pytest args...]
Exit code 0 iff every file's run passed.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import time


def main() -> int:
    here = pathlib.Path(__file__).parent
    files = sorted(here.glob("test_*.py"))
    extra = sys.argv[1:]
    failures = []
    t0 = time.time()
    for f in files:
        t = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", str(f), "-q", *extra],
            cwd=str(here.parent))
        status = "ok" if r.returncode == 0 else f"FAIL rc={r.returncode}"
        print(f"[run_all] {f.name}: {status} ({time.time() - t:.0f}s)")
        if r.returncode != 0:
            failures.append(f.name)
    print(f"[run_all] total {time.time() - t0:.0f}s; "
          f"{len(files) - len(failures)}/{len(files)} files passed")
    if failures:
        print("[run_all] failed:", ", ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
