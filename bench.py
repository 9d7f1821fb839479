"""Headline benchmark (driver-run, real TPU).

Measures north-star config 2 (BASELINE.md): TinyLlama-1.1B-geometry decoder,
NF4 blockwise weights, single-chip decode through the fused dequant-matmul
Pallas kernels — against the bf16 dense decode of the *same* model on the
*same* chip. The reference publishes no numbers (BASELINE.md: "published":
{}), so vs_baseline is the NF4/bf16 throughput ratio: >= 1.0 means the
quantized path is at least as fast as the full-precision baseline while
using ~4x less weight HBM.

Prints ONE JSON line:
  {"metric": "tinyllama_nf4_decode_tokens_per_sec_per_chip",
   "value": <tok/s>, "unit": "tokens/s/chip", "vs_baseline": <nf4/bf16>}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def init_quantized_by_layer(cfg, rng, mode="nf4"):
    """Init + quantize layer-by-layer to bound peak HBM."""
    from quanta_tpu import nn as qnn
    from quanta_tpu.models import llama

    params = llama.init_params(rng, cfg)
    return qnn.quantize_params(params, mode=mode, block_size=64), params


def bench_decode(params, cfg, batch=8, prefill_len=128, steps=64, cache_len=256):
    from quanta_tpu.models import llama

    cache = llama.init_cache(cfg, batch, max_len=cache_len)
    fwd = jax.jit(
        lambda p, t, c: llama.forward(p, t, cfg, cache=c), donate_argnums=(2,)
    )
    toks = jnp.zeros((batch, prefill_len), jnp.int32)
    logits, cache = fwd(params, toks, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)

    # warm the decode-step compile
    lg, cache = fwd(params, tok, cache)
    lg.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(steps):
        lg, cache = fwd(params, tok, cache)
    lg.block_until_ready()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    from quanta_tpu.models import llama

    log("devices:", jax.devices())
    cfg = llama.LlamaConfig.tinyllama_1b()

    qparams, dense = init_quantized_by_layer(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(qparams)

    nf4_tps = bench_decode(qparams, cfg)
    log(f"nf4 decode: {nf4_tps:.1f} tok/s/chip")

    bf16_tps = bench_decode(dense, cfg)
    log(f"bf16 decode: {bf16_tps:.1f} tok/s/chip")

    print(
        json.dumps(
            {
                "metric": "tinyllama_nf4_decode_tokens_per_sec_per_chip",
                "value": round(nf4_tps, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(nf4_tps / bf16_tps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
