"""Llama decoder: forward, KV-cache parity, quantized forward, decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanta_tpu import nn as qnn
from quanta_tpu.models import llama

CFG = llama.LlamaConfig.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, CFG.vocab_size)
    return params, toks


def test_forward_shapes(setup):
    params, toks = setup
    logits, cache = llama.forward(params, toks, CFG)
    assert logits.shape == (2, 12, CFG.vocab_size)
    assert cache is None
    assert logits.dtype == jnp.float32


def test_cache_parity(setup):
    """prefill + single-token decode reproduces the full causal forward."""
    params, toks = setup
    full, _ = llama.forward(params, toks, CFG)

    cache = llama.init_cache(CFG, 2, max_len=12)
    lg, cache = llama.forward(params, toks[:, :8], cfg=CFG, cache=cache)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, :8]), rtol=1e-4, atol=1e-5)
    for i in range(8, 12):
        lg1, cache = llama.forward(params, toks[:, i : i + 1], cfg=CFG, cache=cache)
        np.testing.assert_allclose(
            np.asarray(lg1[:, 0]), np.asarray(full[:, i]), rtol=1e-3, atol=1e-5
        )


def test_quantized_forward_close(setup):
    params, toks = setup
    full, _ = llama.forward(params, toks, CFG)
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64, min_size=1024)
    qlogits, _ = llama.forward(qparams, toks, CFG)
    # NF4 perturbs logits but ranking stays mostly intact on this tiny model
    rel = float(jnp.abs(qlogits - full).mean() / jnp.abs(full).mean())
    assert rel < 0.5, rel
    # top-1 agreement should be high
    # random-init tiny model: logits are near-noise, so top-1 agreement is a
    # weak signal — require it to beat chance (1/vocab) by a wide margin
    agree = float(jnp.mean(jnp.argmax(qlogits, -1) == jnp.argmax(full, -1)))
    assert agree > 0.25, agree


def test_greedy_decode_jits(setup):
    params, toks = setup
    out = llama.greedy_decode(params, toks[:, :4], CFG, max_new_tokens=6)
    assert out.shape == (2, 10)
    assert bool(jnp.all(out[:, :4] == toks[:, :4]))


def test_gqa_heads():
    cfg = llama.LlamaConfig.tiny(n_heads=8, n_kv_heads=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.zeros((1, 4), jnp.int32)
    logits, _ = llama.forward(params, toks, cfg)
    assert logits.shape == (1, 4, cfg.vocab_size)
