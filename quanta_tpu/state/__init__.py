"""Config + quant-state registry (reference functional/state.py role)."""

from quanta_tpu.state.config import ConfigTree, QuantConfig
from quanta_tpu.state.registry import QuantizationState, tensor_params

__all__ = ["QuantConfig", "ConfigTree", "QuantizationState", "tensor_params"]
