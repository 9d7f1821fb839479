"""Pallas kernel backends + dispatch (reference parity: Quanta/backends/).

The reference dispatches per-tensor to cpu/cuda packages
(/root/reference/Quanta/backends/__init__.py:28-40; the cuda package is
absent). Here the "native" tier is Pallas (Mosaic): fused dequant-matmul
and blockwise quantize kernels, with the pure-jnp core as the reference
path. Dispatch policy: kernels on TPU, XLA reference path elsewhere
(interpret mode is used by tests, not production CPU).
"""

import jax

from quanta_tpu.ops.int4c import Int4cWeight, matmul_int4c, quantize_int4c_weight
from quanta_tpu.ops.int8mm import Int8Weight, matmul_int8, quantize_int8_weight
from quanta_tpu.ops.matmul import matmul_4bit, matmul_8bit, matmul_quantized
from quanta_tpu.ops.quantize import dequantize_blockwise, quantize_blockwise


def kernels_supported() -> bool:
    """True when compiled Pallas TPU kernels can run on the default backend."""
    return jax.default_backend() == "tpu"


__all__ = [
    "matmul_quantized",
    "matmul_4bit",
    "matmul_8bit",
    "matmul_int8",
    "quantize_int8_weight",
    "Int8Weight",
    "Int4cWeight",
    "matmul_int4c",
    "quantize_int4c_weight",
    "quantize_blockwise",
    "dequantize_blockwise",
    "kernels_supported",
]
