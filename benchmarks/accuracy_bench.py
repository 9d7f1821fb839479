"""Compat shim: the drivers live in quanta_tpu/benchmarks/ (shipped with
the package). Kept so documented ``python benchmarks/accuracy_bench.py``
invocations keep working from a repo checkout."""
import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
runpy.run_module("quanta_tpu.benchmarks.accuracy_bench", run_name="__main__")
