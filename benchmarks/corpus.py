"""Compat shim: see quanta_tpu/benchmarks/corpus.py."""
from quanta_tpu.benchmarks.corpus import *  # noqa: F401,F403
from quanta_tpu.benchmarks.corpus import build_corpus, train_eval_split  # noqa: F401
