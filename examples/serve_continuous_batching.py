"""Continuous-batching serving demo: paged KV cache + slot scheduler.

North-star config 3 (BASELINE.md): the Engine admits requests into fixed
decode slots as capacity frees up (no recompilation — prefill lengths are
bucketed, decode is one jitted step), backed by a paged KV cache. This
demo pushes a mixed trace of short/long requests through a tiny NF4a
model and prints the serving metrics (TTFT, throughput, page stats).
"""

import numpy as np

import jax

from quanta_tpu import nn as qnn
from quanta_tpu.models import llama
from quanta_tpu.serve import Engine, Request


def main():
    cfg = llama.LlamaConfig.tiny(dim=256, hidden_dim=512, n_layers=4,
                                 vocab_size=256, max_seq_len=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    params = qnn.quantize_params(params, mode="nf4a", block_size=64,
                                 min_size=1024)

    engine = Engine(
        params, cfg,
        n_slots=4,           # concurrent decode slots
        page_size=16,        # KV page granularity
        prefill_buckets=(16, 32, 64, 128),
    )

    # mixed trace: 12 requests with varying prompt/output lengths
    rng = np.random.default_rng(0)
    requests = []
    for uid in range(12):
        plen = int(rng.integers(4, 100))
        prompt = rng.integers(0, cfg.vocab_size, plen).astype(np.int32)
        requests.append(
            Request(uid=uid, prompt=prompt,
                    max_new_tokens=int(rng.integers(8, 48)))
        )

    done = engine.run(requests)

    print("== Completed requests ==")
    for r in sorted(done, key=lambda r: r.uid):
        print(f"  req {r.uid:2d}: prompt {len(r.prompt):3d} tok -> "
              f"{len(r.output):3d} generated, ttft {r.ttft * 1e3:7.1f} ms")

    print("\n== Engine metrics ==")
    for k, v in sorted(engine.metrics().items()):
        print(f"  {k:28s} {v:10.3f}" if isinstance(v, float)
              else f"  {k:28s} {v:10d}")


if __name__ == "__main__":
    main()
