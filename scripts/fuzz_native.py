"""Build and run the native-runtime differential fuzzes (C++-level spec
twins that complement the Python-oracle tests):

* scripts/fuzz_adapters.cpp — KTrack / adapt_stateful / adapt_stateless_inc
  vs division-based reference-semantics twins.

Usage: python scripts/fuzz_native.py
"""

import pathlib
import subprocess
import sys
import tempfile

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    with tempfile.TemporaryDirectory() as td:
        exe = f"{td}/fuzz_adapters"
        build = subprocess.run(
            ["g++", "-O2", "-march=native", "-std=c++17", "-o", exe,
             str(ROOT / "scripts" / "fuzz_adapters.cpp"), "-lpthread"],
            capture_output=True, text=True,
        )
        if build.returncode != 0:
            sys.stderr.write(build.stderr)
            return build.returncode
        run = subprocess.run([exe], capture_output=True, text=True)
        sys.stdout.write(run.stdout)
        sys.stderr.write(run.stderr)
        return run.returncode


if __name__ == "__main__":
    sys.exit(main())
