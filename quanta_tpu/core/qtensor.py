"""QuantizedTensor: the single quantized-array container of the framework.

The reference keeps three mutually incompatible quantize cores and a
side-registry of params (SURVEY.md §1); here there is exactly one container
and one scale convention:

  - ``scheme == "symmetric"``: dequant = codes.astype(f32) * scale
    (codes are signed; scale = block_absmax / qmax).
  - ``scheme == "affine"``:    dequant = (codes - zero_point) * scale
    (codes are unsigned; scale = (max-min)/(2^bits-1), zp = round(-min/scale)).
  - ``scheme == "codebook"``:  dequant = codebook[codes] * scale
    (codes are unsigned indices; scale = block_absmax; NF4/NF8/FP4/FP8).

All quantization is *blockwise* over the flattened tensor: the tensor is
flattened, padded to a multiple of ``block_size``, and reshaped to
``(n_blocks, block_size)``. ``scale``/``zero_point`` have shape
``(n_blocks,)``. ``block_size = 0`` means per-tensor (one block).

4-bit codes may additionally be *packed* two-per-byte (see
quanta_tpu.core.packing); ``packed`` records the layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """A quantized array plus everything needed to reconstruct it."""

    codes: jax.Array  # uint8/int8 codes (possibly packed)
    scale: jax.Array  # f32 (n_blocks,) or scalar
    zero_point: Optional[jax.Array]  # f32/int (n_blocks,) for affine, else None

    # -- static metadata (hashable; part of the pytree aux data) --
    bits: int = dataclasses.field(metadata=dict(static=True), default=8)
    scheme: str = dataclasses.field(metadata=dict(static=True), default="symmetric")
    codebook: Optional[str] = dataclasses.field(
        metadata=dict(static=True), default=None
    )
    shape: tuple = dataclasses.field(metadata=dict(static=True), default=())
    dtype: Any = dataclasses.field(metadata=dict(static=True), default=jnp.float32)
    block_size: int = dataclasses.field(metadata=dict(static=True), default=0)
    packed: str = dataclasses.field(metadata=dict(static=True), default="none")
    # "none" | "nibbles" (flat low-nibble-first) | "split_k" (matmul layout)

    def __post_init__(self):
        self.shape = tuple(self.shape)

    @property
    def nbytes(self) -> int:
        n = self.codes.nbytes + self.scale.nbytes
        if self.zero_point is not None:
            n += self.zero_point.nbytes
        return n

    @property
    def compression_ratio(self) -> float:
        import numpy as np

        orig = int(np.prod(self.shape)) * jnp.dtype(self.dtype).itemsize
        return orig / max(self.nbytes, 1)

    def astype_meta(self, **kw) -> "QuantizedTensor":
        return dataclasses.replace(self, **kw)

    def dequantize(self) -> jax.Array:
        from quanta_tpu.core import codecs

        return codecs.dequantize(self)
