"""Headline benchmark entry point (driver-run, real TPU).

The implementation lives in quanta_tpu/benchmarks/decode_bench.py (shipped
with the package; also reachable as `quanta-tpu bench headline`). Prints
ONE JSON line on stdout; per-format tables go to stderr.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quanta_tpu.benchmarks.decode_bench import main  # noqa: E402

if __name__ == "__main__":
    main()
