"""LoRA adapters over frozen quantized base weights (the QLoRA recipe).

The reference only roadmaps LoRA (/root/reference/TODO.md:47); the north
star requires it: frozen NF4 base + trainable bf16 A/B adapters. Here a
LoRA layer is a *param-tree pattern*, not a module rewrite: the base
weight stays a QuantizedTensor leaf, and adapters live in a parallel
`lora` subtree so optimizers can target exactly the adapter leaves.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from quanta_tpu.nn.linear import WeightLike, linear


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LoRAWeight:
    """A (possibly quantized, frozen) base weight plus trainable adapters.

    y = x @ base + (x @ A) @ B * (alpha / rank)
    A: (in, rank) bf16, B: (rank, out) bf16 (B zero-init so the adapter
    starts as identity).
    """

    base: WeightLike
    lora_a: jax.Array
    lora_b: jax.Array
    alpha: float = dataclasses.field(metadata=dict(static=True), default=16.0)

    @property
    def rank(self) -> int:
        return self.lora_a.shape[-1]


def init_lora(
    base: WeightLike,
    rng: jax.Array,
    *,
    rank: int = 8,
    alpha: float = 16.0,
    in_features: Optional[int] = None,
    out_features: Optional[int] = None,
    dtype: Any = jnp.bfloat16,
) -> LoRAWeight:
    """Wrap a base weight with zero-initialized LoRA adapters."""
    if in_features is None or out_features is None:
        shape = getattr(base, "shape", None)
        if shape is None:
            raise ValueError("pass in_features/out_features for this base type")
        in_features, out_features = shape
    a = jax.random.normal(rng, (in_features, rank), dtype) * (1.0 / jnp.sqrt(rank))
    b = jnp.zeros((rank, out_features), dtype)
    return LoRAWeight(base=base, lora_a=a, lora_b=b, alpha=alpha)


def lora_linear(
    x: jax.Array,
    w: LoRAWeight,
    b: Optional[jax.Array] = None,
    **kw,
) -> jax.Array:
    """Forward through base (fused quantized kernel) + low-rank adapter."""
    y = linear(x, w.base, b, **kw)
    scaling = w.alpha / w.rank
    delta = (x.astype(w.lora_a.dtype) @ w.lora_a) @ w.lora_b
    return y + (delta * scaling).astype(y.dtype)


def lora_params_filter(path, leaf) -> bool:
    """optax mask helper: True for trainable adapter leaves."""
    keys = [getattr(p, "name", getattr(p, "key", "")) for p in path]
    return any(k in ("lora_a", "lora_b") for k in keys)


def merge_lora(w: LoRAWeight) -> jax.Array:
    """Materialize base + adapter as a dense weight (for export)."""
    from quanta_tpu.nn.linear import dequantize_params

    base = dequantize_params(w.base)
    scaling = w.alpha / w.rank
    return base.astype(jnp.float32) + scaling * (
        w.lora_a.astype(jnp.float32) @ w.lora_b.astype(jnp.float32)
    )
