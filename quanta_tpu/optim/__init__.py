"""Memory-efficient optimizers (reference parity: Quanta/optim/__init__.py:5)."""

from quanta_tpu.optim.adam8bit import (
    Adam8bitState,
    adam8bit,
    adamw8bit,
    state_nbytes,
)

# Reference-compatible alias (Quanta exposes the class as Adam8bit)
Adam8bit = adam8bit

__all__ = ["adam8bit", "adamw8bit", "Adam8bit", "Adam8bitState", "state_nbytes"]
