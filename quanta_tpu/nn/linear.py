"""Quantized linear layers.

API contract from the reference shells (which declare the interface but
forward in fp, /root/reference/Quanta/nn/linear.py:10-83):

  - ``Linear8bitLt(in, out, bias, has_fp16_weights, threshold=6.0)`` —
    LLM.int8() semantics: int8 GEMM + outlier decomposition at `threshold`.
  - ``Linear4bit(in, out, bias, compute_dtype, quant_type="nf4")`` —
    QLoRA semantics: packed 4-bit weight, bf16 compute.

Here the *functional* entry point is :func:`linear`, which dispatches on
the weight leaf type (plain array / QuantizedTensor / Int8Weight), so
whole-model quantization is a pytree transformation, not module surgery.
The Flax linen modules below wrap it for users who want the module API.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from quanta_tpu import calib
from quanta_tpu.core import codecs
from quanta_tpu.core.qtensor import QuantizedTensor
from quanta_tpu.ops.int8mm import Int8Weight, matmul_int8, quantize_int8_weight
from quanta_tpu.ops.matmul import matmul_quantized

WeightLike = Any  # jax.Array | QuantizedTensor | Int8Weight


def linear(
    x: jax.Array,
    w: WeightLike,
    b: Optional[jax.Array] = None,
    *,
    use_kernel: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """``x @ W (+ b)`` for any supported weight representation.

    ``W`` is (in_features, out_features). With ``use_kernel=False`` the
    quantized weight is dequantized via the XLA reference path instead of
    the fused Pallas kernel (CPU fallback / debugging — the role of the
    reference's backends/cpu, SURVEY.md §2.4). Default (None): kernels on
    TPU, XLA path elsewhere — the dispatcher role of the reference's
    backends/__init__.py:28-40.
    """
    if use_kernel is None:
        import jax as _jax

        use_kernel = interpret or _jax.default_backend() == "tpu"
    if isinstance(w, calib.TapWeight):  # calibration stats hook
        calib.tap_record(w.name, x)
        w = w.w
    if isinstance(w, calib.ActQuantWeight):  # calibrated activation quant
        x = calib.fake_quant(x, w.lo, w.hi, w.bits)
        w = w.w
    if isinstance(w, QuantizedTensor):
        if use_kernel:
            y = matmul_quantized(x, w, interpret=interpret)
        else:
            y = x @ codecs.dequantize_matmul_weight(w).astype(x.dtype)
    elif isinstance(w, Int8Weight):
        y = matmul_int8(x, w, use_kernel=use_kernel, interpret=interpret)
    elif type(w).__name__ == "LoRAWeight":  # avoid circular import
        from quanta_tpu.nn.lora import lora_linear

        return lora_linear(x, w, b, use_kernel=use_kernel, interpret=interpret)
    else:
        y = x @ w.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def quantize_linear_weight(
    w: jax.Array,
    *,
    mode: str = "nf4",
    block_size: int = 64,
    threshold: float = 6.0,
    calib_colmax: Optional[jax.Array] = None,
) -> WeightLike:
    """Convert a dense (in, out) weight into a quantized representation.

    mode: "nf4"/"int4"/"fp4"/"int8"/"nf8"/"fp8" (fused-kernel formats) or
    "llm_int8" (outlier-decomposition Int8Weight).
    """
    if mode == "llm_int8":
        return quantize_int8_weight(
            w, threshold=threshold, calib_colmax=calib_colmax
        )
    return codecs.quantize_matmul_weight(w, fmt=mode, block_size=block_size)


# ------------------------------------------------------------ linen modules


class Linear8bitLt(fnn.Module):
    """LLM.int8() linear (reference: Quanta/nn/linear.py:10-45).

    At init the kernel is a dense bf16/f32 array (``has_fp16_weights``
    semantics); call :func:`quanta_tpu.nn.quantize_params` on the param
    tree to swap kernels for Int8Weight leaves. ``__call__`` handles both.
    """

    features: int
    use_bias: bool = True
    has_fp16_weights: bool = False
    threshold: float = 6.0
    param_dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            fnn.initializers.kaiming_uniform(),
            (in_features, self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", fnn.initializers.zeros_init(), (self.features,), self.param_dtype
            )
            if self.use_bias
            else None
        )
        return linear(x, kernel, bias)


class Linear4bit(fnn.Module):
    """QLoRA-style 4-bit linear (reference: Quanta/nn/linear.py:48-83)."""

    features: int
    use_bias: bool = True
    compute_dtype: Any = jnp.bfloat16
    quant_type: str = "nf4"
    block_size: int = 64
    param_dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            fnn.initializers.kaiming_uniform(),
            (in_features, self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", fnn.initializers.zeros_init(), (self.features,), self.param_dtype
            )
            if self.use_bias
            else None
        )
        return linear(x.astype(self.compute_dtype), kernel, bias)


def quantize_params(
    params,
    *,
    mode: str = "nf4",
    block_size: int = 64,
    threshold: float = 6.0,
    predicate=None,
    min_size: int = 4096,
    stats=None,
):
    """Pytree transformation: replace 2-D weight leaves with quantized ones.

    This is the functional equivalent of the reference's ``ModelQuantize``
    in-place module rewrite (/root/reference/Quanta/functional/model.py:
    254-289) — transform the param pytree, not the module tree.

    predicate(path, leaf) -> bool selects which leaves to quantize;
    default: 2-D float arrays with >= min_size elements whose first dim is
    divisible by block_size (embeddings/norms stay in full precision).

    stats: optional {tree_path: calib.ActivationStats} from
    calib.collect_stats; with mode="llm_int8" the per-feature activation
    colmax selects the outlier set (the LLM.int8() systematic-outlier
    criterion) instead of the weight-norm proxy.
    """

    def default_pred(path, leaf):
        names = "/".join(
            str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", ""))))
            for p in path
        )
        return (
            isinstance(leaf, jax.Array)
            and leaf.ndim == 2
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.size >= min_size
            # embeddings are gathered (and possibly tied to the head), not
            # matmul'd: keep them dense
            and "emb" not in names
            and "wte" not in names
            and "wpe" not in names
        )

    pred = predicate or default_pred

    def maybe_quant(path, leaf):
        if pred(path, leaf):
            colmax = None
            if stats is not None:
                st = stats.get(calib._path_name(path))
                if st is not None:
                    colmax = jnp.asarray(st.colmax)
            return quantize_linear_weight(
                leaf, mode=mode, block_size=block_size, threshold=threshold,
                calib_colmax=colmax,
            )
        return leaf

    return jax.tree_util.tree_map_with_path(
        maybe_quant, params, is_leaf=lambda x: isinstance(x, (QuantizedTensor, Int8Weight))
    )


def dequantize_params(params):
    """Inverse transformation: materialize dense weights from quantized."""

    def deq(leaf):
        if isinstance(leaf, (calib.TapWeight, calib.ActQuantWeight)):
            leaf = leaf.w
        if isinstance(leaf, QuantizedTensor):
            return codecs.dequantize_matmul_weight(leaf)
        if isinstance(leaf, Int8Weight):
            k, n = leaf.shape
            dense = leaf.codes.astype(jnp.float32) * leaf.scale[None, :]
            dense = dense.at[leaf.outlier_idx].set(
                leaf.w_outlier.astype(jnp.float32))
            return dense[:k, :n]  # drop kernel-tile padding
        return leaf

    return jax.tree_util.tree_map(
        deq,
        params,
        is_leaf=lambda x: isinstance(
            x, (QuantizedTensor, Int8Weight, calib.TapWeight, calib.ActQuantWeight)
        ),
    )
