"""Token sampling for the serving engine (static shapes, jit-safe).

Greedy (temperature == 0), temperature softmax sampling, and top-k
truncation. ``temperature`` may differ per slot (it is data); ``top_k``
is a compile-time constant per engine (it changes the lowered program).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => no truncation


@partial(jax.jit, static_argnames=("top_k", "max_top_k"))
def _sample_batch(
    logits: jax.Array,
    key: jax.Array,
    temperature: jax.Array,
    top_k: int = 0,
    *,
    top_ks: jax.Array | None = None,
    max_top_k: int = 0,
) -> jax.Array:
    """logits (B, V) f32, temperature (B,) f32 -> (B,) int32 tokens.

    Two truncation modes: a shared static ``top_k`` (one program for the
    whole batch), or per-row ``top_ks`` (B,) int32 bounded by the static
    ``max_top_k`` (rows with top_ks == 0 are not truncated). The static
    bound keeps the lowered program fixed-shape: one lax.top_k of width
    ``max_top_k``, with each row's threshold gathered at its own k-1.
    """
    if top_ks is not None and max_top_k > 0:
        vals = jax.lax.top_k(logits, max_top_k)[0]  # (B, maxk) descending
        idx = jnp.clip(top_ks - 1, 0, max_top_k - 1)
        kth = jnp.take_along_axis(vals, idx[:, None], axis=1)
        logits = jnp.where(
            (top_ks[:, None] > 0) & (logits < kth), -jnp.inf, logits
        )
    elif top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    drawn = jax.random.categorical(key, logits / temp, axis=-1).astype(
        jnp.int32
    )
    return jnp.where(temperature > 0, drawn, greedy)


def sample(logits: jax.Array, key: jax.Array, params: SamplingParams) -> jax.Array:
    """Sample one token per row of ``logits`` under shared SamplingParams."""
    b = logits.shape[0]
    temps = jnp.full((b,), params.temperature, jnp.float32)
    return _sample_batch(logits, key, temps, top_k=params.top_k)
