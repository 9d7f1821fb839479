"""Model-level llm_int8 dispatch A/B: Pallas kernel (plain / fused) vs
XLA int8 path, full TinyLlama decode + prefill.

The microbench picture flipped across rounds (r4: kernel ahead at
gate/up, XLA ahead at down/lm_head; r5 probe: XLA ahead everywhere,
fused ~= plain), and r4's serving A/B had the kernel 1206 vs XLA 1141
tok/s — so the production default must come from a MODEL-level
measurement, not per-shape cells. This benches full-model decode and
prefill for the three dispatches by monkeypatching matmul_int8's
defaults (the engine/forward plumbing has no per-call knob — the knob
IS the default).

Usage: python -m quanta_tpu.benchmarks.llmint8_model_ab
"""

import functools
import json
import sys

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from quanta_tpu import nn as qnn
    from quanta_tpu.benchmarks.decode_bench import bench_decode, bench_prefill
    from quanta_tpu.models import llama
    from quanta_tpu.nn import linear as linear_mod
    from quanta_tpu.ops import int8mm

    log("devices:", jax.devices())
    cfg = llama.LlamaConfig.tinyllama_1b()
    dense = llama.init_params(jax.random.PRNGKey(0), cfg)
    params = qnn.quantize_params(dense, mode="llm_int8")
    del dense
    jax.block_until_ready(params)

    orig = int8mm.matmul_int8
    results = {}
    for name, kw in [("kernel_fused", dict(use_kernel=True, fused=True)),
                     ("kernel_plain", dict(use_kernel=True, fused=False)),
                     ("xla", dict(use_kernel=False))]:
        # nn.linear imported the symbol directly — patch ITS reference;
        # the wrapper must OVERRIDE the use_kernel linear() passes in
        def patched(x, qw, _kw=dict(kw), **inner):
            inner.update(_kw)
            return orig(x, qw, **inner)

        linear_mod.matmul_int8 = patched
        try:
            t = bench_decode(params, cfg, batch=8, prefill_len=128,
                             cache_len=512)
            tp = bench_prefill(params, cfg, batch=8, prefill_len=128)
        finally:
            linear_mod.matmul_int8 = orig
        results[name] = {
            "decode_tok_s_chip": round(8 / t, 1),
            "prefill_tok_s_chip": round(8 * 128 / tp, 1),
        }
        log(name, results[name])

    best = max(results, key=lambda k: results[k]["decode_tok_s_chip"])
    log("model-level winner (decode):", best)
    print(json.dumps({"llm_int8_model_ab": results, "winner": best}))


if __name__ == "__main__":
    main()
