"""Serving engine: continuous batching over a paged KV cache.

New subsystem relative to the reference (which has no serving layer —
SURVEY.md §2.5); realizes BASELINE.json config 3. See serve/engine.py for
the scheduler, serve/kvcache.py for the page pool, serve/runner.py for
the jitted prefill/decode programs.
"""

from quanta_tpu.serve.engine import Engine, Request
from quanta_tpu.serve.kvcache import PageAllocator, init_pool
from quanta_tpu.serve.sampling import SamplingParams

__all__ = ["Engine", "Request", "SamplingParams", "PageAllocator", "init_pool"]
