"""GPT-2 decoder, functional JAX (north-star config 1: GPT-2 small 124M).

Second model family beside quanta_tpu.models.llama; same design rules:
plain-pytree params, every projection through quanta_tpu.nn.linear (so any
weight leaf may be dense / QuantizedTensor / Int8Weight / LoRAWeight),
static shapes with a fixed-capacity KV cache so prefill and decode each
jit once. Layout matches the HF GPT2LMHeadModel checkpoint as imported by
quanta_tpu.models.hf.load_gpt2 (GPT-2's Conv1D already stores weights
(in, out), our y = x @ W convention).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from quanta_tpu.models.llama import _attention
from quanta_tpu.nn.linear import linear


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    max_seq_len: int = 1024
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def n_kv_heads(self) -> int:
        return self.n_heads  # MHA: every query head has its own KV

    @property
    def hidden_dim(self) -> int:
        return 4 * self.dim

    @staticmethod
    def tiny(**kw) -> "GPT2Config":
        d = dict(vocab_size=256, dim=64, n_layers=2, n_heads=4, max_seq_len=64)
        d.update(kw)
        return GPT2Config(**d)

    @staticmethod
    def small() -> "GPT2Config":
        return GPT2Config()  # 124M


def init_params(rng: jax.Array, cfg: GPT2Config) -> dict:
    keys = iter(jax.random.split(rng, 2 + 4 * cfg.n_layers))

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
            cfg.dtype
        )

    def ln():
        return {
            "w": jnp.ones((cfg.dim,), cfg.dtype),
            "b": jnp.zeros((cfg.dim,), cfg.dtype),
        }

    def lin(key, din, dout):
        return {"w": dense(key, (din, dout)), "b": jnp.zeros((dout,), cfg.dtype)}

    params = {
        "wte": dense(next(keys), (cfg.vocab_size, cfg.dim)),
        "wpe": dense(next(keys), (cfg.max_seq_len, cfg.dim)),
        "ln_f": ln(),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append(
            {
                "ln_1": ln(),
                "attn_qkv": lin(next(keys), cfg.dim, 3 * cfg.dim),
                "attn_out": lin(next(keys), cfg.dim, cfg.dim),
                "ln_2": ln(),
                "mlp_fc": lin(next(keys), cfg.dim, cfg.hidden_dim),
                "mlp_out": lin(next(keys), cfg.hidden_dim, cfg.dim),
            }
        )
    return params


def layer_norm(x: jax.Array, p: dict, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out.astype(x.dtype) * p["w"]) + p["b"]


def _gelu_new(x: jax.Array) -> jax.Array:
    """GPT-2's tanh-approximated GELU (transformers 'gelu_new')."""
    x32 = x.astype(jnp.float32)
    c = jnp.sqrt(jnp.float32(2.0 / jnp.pi))
    out = 0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32**3)))
    return out.astype(x.dtype)


def init_cache(cfg: GPT2Config, batch: int, max_len: Optional[int] = None) -> dict:
    max_len = max_len or cfg.max_seq_len
    shape = (cfg.n_layers, batch, max_len, cfg.n_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, cfg.dtype),
        "v": jnp.zeros(shape, cfg.dtype),
        "pos": jnp.zeros((batch,), jnp.int32),
    }


def forward(
    params: dict,
    tokens: jax.Array,
    cfg: GPT2Config,
    cache: Optional[dict] = None,
    *,
    use_kernel=None,
    interpret: bool = False,
):
    """Run GPT-2. Same contract as llama.forward: without a cache, plain
    causal forward; with one, append at cache['pos'] and return it updated.
    Returns (logits (B, S, V) f32, new_cache | None)."""
    b, s = tokens.shape
    lin = partial(linear, use_kernel=use_kernel, interpret=interpret)
    nh, hd = cfg.n_heads, cfg.head_dim

    if cache is not None:
        start = cache["pos"]
        q_positions = start[:, None] + jax.lax.broadcasted_iota(
            jnp.int32, (b, s), 1
        )
        t = cache["k"].shape[2]
        kv_positions = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
        kv_len_mask = kv_positions < (start[:, None] + s)
        new_k, new_v = [], []
    else:
        q_positions = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
        kv_len_mask = jnp.ones((b, s), bool)

    h = jnp.take(params["wte"], tokens, axis=0).astype(cfg.dtype)
    h = h + jnp.take(params["wpe"], q_positions, axis=0).astype(cfg.dtype)

    for i, lp in enumerate(params["layers"]):
        x = layer_norm(h, lp["ln_1"], cfg.norm_eps)
        qkv = lin(x, lp["attn_qkv"]["w"], lp["attn_qkv"]["b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nh, hd)
        v = v.reshape(b, s, nh, hd)

        if cache is not None:

            def upd(buf, new):
                def one(row_buf, row_new, p):
                    return jax.lax.dynamic_update_slice_in_dim(
                        row_buf, row_new, p, axis=0
                    )

                return jax.vmap(one)(buf, new, cache["pos"])

            k_all = upd(cache["k"][i], k)
            v_all = upd(cache["v"][i], v)
            new_k.append(k_all)
            new_v.append(v_all)
            attn = _attention(q, k_all, v_all, q_positions, kv_len_mask, cfg)
        else:
            attn = _attention(q, k, v, q_positions, kv_len_mask, cfg)

        h = h + lin(attn.reshape(b, s, -1), lp["attn_out"]["w"],
                    lp["attn_out"]["b"])
        x = layer_norm(h, lp["ln_2"], cfg.norm_eps)
        x = _gelu_new(lin(x, lp["mlp_fc"]["w"], lp["mlp_fc"]["b"]))
        h = h + lin(x, lp["mlp_out"]["w"], lp["mlp_out"]["b"])

    h = layer_norm(h, params["ln_f"], cfg.norm_eps)
    logits = lin(h, params["wte"].T).astype(jnp.float32)  # tied head

    if cache is not None:
        new_cache = {
            "k": jnp.stack(new_k),
            "v": jnp.stack(new_v),
            "pos": cache["pos"] + s,
        }
        return logits, new_cache
    return logits, None


def greedy_decode(
    params: dict,
    prompt: jax.Array,
    cfg: GPT2Config,
    max_new_tokens: int = 32,
    *,
    use_kernel=None,
    interpret: bool = False,
) -> jax.Array:
    """Greedy generation (same contract as llama.greedy_decode); the
    serving Engine's oracle for arch="gpt2"."""
    b, s = prompt.shape
    cache = init_cache(cfg, b, max_len=s + max_new_tokens)

    fwd = partial(forward, cfg=cfg, use_kernel=use_kernel, interpret=interpret)
    logits, cache = fwd(params, prompt, cache=cache)
    next_tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)

    def step(carry, _):
        cache, tok = carry
        logits, cache = fwd(params, tok[:, None], cache=cache)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return (cache, nxt), tok

    _, toks = jax.lax.scan(step, (cache, next_tok), None, length=max_new_tokens)
    return jnp.concatenate([prompt, jnp.moveaxis(toks, 0, 1)], axis=1)
