"""QuantizationState: central registry of quantized tensors + their params.

Role-parity with the reference's ``QuantizationState``
(`/root/reference/Quanta/functional/state.py:18-197`): per-tensor params
(:28-48), per-layer params (:50-70), global config defaults (:22-26), JSON
save/load (:81-130), quantized-tensor persistence (:132-197, via
quanta_tpu.utils.serialization here), an in-memory cache (:193-195), and
state-driven dequantization (:246-287). Because QuantizedTensor already
carries its own metadata, the registry stores whole QuantizedTensors and
derives params from them instead of keeping a loose side-dict that can
drift from the data.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

import jax

from quanta_tpu.core import QuantizedTensor, dequantize, quantize
from quanta_tpu.state.config import ConfigTree, QuantConfig


def tensor_params(qt: QuantizedTensor) -> Dict[str, Any]:
    """The reference's per-tensor param dict (state.py:28-36), derived."""
    return {
        "bits": qt.bits,
        "scheme": qt.scheme,
        "codebook": qt.codebook,
        "shape": list(qt.shape),
        "dtype": str(jax.numpy.dtype(qt.dtype)),
        "block_size": qt.block_size,
        "packed": qt.packed,
    }


class QuantizationState:
    """Registry mapping tensor names -> QuantizedTensor (+ config tree)."""

    def __init__(self, config: Optional[ConfigTree] = None):
        self.config = config or ConfigTree()
        self._tensors: Dict[str, QuantizedTensor] = {}
        self._layer_params: Dict[str, Dict[str, Any]] = {}

    # ---------------------------------------------------------- registry
    def register(self, name: str, qt: QuantizedTensor) -> None:
        self._tensors[name] = qt

    def get(self, name: str) -> QuantizedTensor:
        return self._tensors[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tensors

    def names(self):
        return sorted(self._tensors)

    def get_tensor_params(self, name: str) -> Dict[str, Any]:
        return tensor_params(self._tensors[name])

    # per-layer free-form params (reference state.py:50-70)
    def set_layer_params(self, layer: str, **params) -> None:
        self._layer_params.setdefault(layer, {}).update(params)

    def get_layer_params(self, layer: str) -> Dict[str, Any]:
        return dict(self._layer_params.get(layer, {}))

    # ------------------------------------------------------- quant paths
    def quantize(self, name: str, x: jax.Array) -> QuantizedTensor:
        """Quantize ``x`` under the resolved config and register it.

        calibration != "minmax" clips the tensor to the range reduced
        from its own 256-bin histogram (percentile / entropy) before
        quantizing — the range-calibration role of the reference's
        ``_calibrate_layer`` (functional/model.py:137-194) applied at the
        tensor level. "minmax" is the identity (full range).
        """
        cfg: QuantConfig = self.config.resolve(name)
        if cfg.calibration != "minmax":
            from quanta_tpu import calib

            lo, hi = calib.weight_clip_range(x, cfg.calibration, cfg.bits)
            x = jax.numpy.clip(x, lo, hi)
        qt = quantize(
            x,
            bits=cfg.bits,
            scheme=cfg.scheme,
            codebook=cfg.codebook,
            block_size=cfg.block_size,
            pack=cfg.pack,
        )
        self.register(name, qt)
        return qt

    def dequantize(self, name: str) -> jax.Array:
        """State-driven dequant (reference state.py:246-287)."""
        return dequantize(self._tensors[name])

    # -------------------------------------------------------- persistence
    def save_tensor(self, name: str, path: str) -> None:
        """Persist one registered tensor (.qtn or .npz by extension),
        mirroring save_quantized_tensor_with_state (state.py:132-160)."""
        from quanta_tpu.utils import serialization

        serialization.save_quantized_tensor(self._tensors[name], path)

    def load_tensor(self, name: str, path: str) -> QuantizedTensor:
        from quanta_tpu.utils import serialization

        qt = serialization.load_quantized_tensor(path)
        self.register(name, qt)
        return qt

    def summary_json(self) -> str:
        """JSON snapshot of all registered params + config (state.py:81-130).

        Codes/scales live in checkpoints, not JSON; this is the metadata
        view the reference serialized (minus raw tensor lists, which its
        own loader round-tripped lossily)."""
        return json.dumps(
            {
                "config": json.loads(self.config.to_json()),
                "tensors": {n: tensor_params(t) for n, t in self._tensors.items()},
                "layers": self._layer_params,
            },
            indent=2,
        )

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.summary_json())

    @staticmethod
    def load_json(path: str) -> "QuantizationState":
        """Rebuild config + layer params (tensor data loads separately)."""
        with open(path) as f:
            d = json.load(f)
        st = QuantizationState(ConfigTree.from_json(json.dumps(d["config"])))
        st._layer_params = d.get("layers", {})
        return st
