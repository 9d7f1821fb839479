"""Model zoo: functional decoders whose projections accept quantized leaves."""

from quanta_tpu.models import llama
from quanta_tpu.models.llama import LlamaConfig

__all__ = ["llama", "LlamaConfig"]
