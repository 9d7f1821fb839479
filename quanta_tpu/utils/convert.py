"""Precision conversion and hardware-target presets.

Parity with the reference's ``convert_precision`` family
(`/root/reference/Quanta/utils/utils.py:216-307`): conversion is a
dequantize -> requantize round trip through float, producing a new
QuantizedTensor under the target settings. The hardware-target table
(:309-335) gains a ``tpu`` row — the native target of this framework.
"""

from __future__ import annotations

from typing import Optional

from quanta_tpu.core import QuantizedTensor, dequantize, quantize
from quanta_tpu.state.config import QuantConfig


def convert_precision(
    qt: QuantizedTensor,
    *,
    bits: Optional[int] = None,
    scheme: Optional[str] = None,
    codebook: Optional[str] = None,
    block_size: Optional[int] = None,
    pack: Optional[bool] = None,
) -> QuantizedTensor:
    """Requantize ``qt`` under new settings (fp round trip).

    Unspecified fields keep the source tensor's values, except ``codebook``
    which resets when the scheme or bit-width changes (an nf4 codebook is
    meaningless for an 8-bit target — the reference's converter had the
    same reset behavior via its params rebuild, utils.py:243-268).
    """
    new_bits = bits if bits is not None else qt.bits
    new_scheme = scheme if scheme is not None else qt.scheme
    if codebook is None and (new_bits != qt.bits or new_scheme != qt.scheme):
        new_codebook = None
    else:
        new_codebook = codebook if codebook is not None else qt.codebook
    new_block = block_size if block_size is not None else qt.block_size
    new_pack = pack if pack is not None else (new_bits == 4 and qt.packed != "none")
    return quantize(
        dequantize(qt),
        bits=new_bits,
        scheme=new_scheme,
        codebook=new_codebook,
        block_size=new_block,
        pack=new_pack,
    )


def convert_8bit_to_4bit(qt: QuantizedTensor, **kw) -> QuantizedTensor:
    """utils.py:281-293 parity."""
    return convert_precision(qt, bits=4, **kw)


def convert_4bit_to_8bit(qt: QuantizedTensor, **kw) -> QuantizedTensor:
    """utils.py:295-307 parity."""
    return convert_precision(qt, bits=8, **kw)


# Static hardware table (reference utils.py:321-326, plus the tpu row).
HARDWARE_TARGETS = {
    "tpu": QuantConfig(bits=4, scheme="codebook", codebook="nf4",
                       block_size=64, pack=True),
    "cpu": QuantConfig(bits=8, scheme="affine", block_size=0),
    "gpu": QuantConfig(bits=8, scheme="symmetric", block_size=64),
    "mobile": QuantConfig(bits=4, scheme="codebook", codebook="nf4",
                          block_size=64, pack=True),
    "edge": QuantConfig(bits=4, scheme="symmetric", block_size=64, pack=True),
}


def optimize_for_target_hardware(
    qt: QuantizedTensor, target: str = "tpu"
) -> QuantizedTensor:
    """Requantize for a named hardware target (utils.py:309-335 parity)."""
    if target not in HARDWARE_TARGETS:
        raise ValueError(
            f"unknown target {target!r}; options: {sorted(HARDWARE_TARGETS)}"
        )
    c = HARDWARE_TARGETS[target]
    return convert_precision(
        qt, bits=c.bits, scheme=c.scheme, codebook=c.codebook,
        block_size=c.block_size, pack=c.pack,
    )
