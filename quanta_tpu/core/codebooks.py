"""Quantization codebooks (NF4 / NF8 / FP4 / FP8 / INT4 / INT8).

Every non-uniform format in this framework is expressed as a *codebook*:
a sorted vector of ``2**bits`` representative values normalized to
``[-1, 1]``. Dequantization is ``codebook[codes] * scale`` where ``scale``
is the per-block absmax; quantization is nearest-level rounding, done with
``searchsorted`` over level midpoints (O(log n) per element instead of the
O(n_levels) distance-matrix blowup of the reference,
/root/reference/Quanta/functional/quantization.py:114-116).

Codebook values mirror the reference's formats:
  - NF4: QLoRA NormalFloat-4 constants
    (/root/reference/Quanta/functional/quantization.py:105-110).
  - NF8: 256 tanh-warped levels ``tanh(linspace(-1,1)*2)`` (ibid.:170-183).
  - FP4: e2m1 (sign / 2-bit exp bias 1 / 1-bit mantissa) representable
    values (ibid.:120-142), absmax-normalized.
  - FP8: e4m3 (sign / 4-bit exp bias 7 / 3-bit mantissa) (ibid.:144-168).
  - INT4/INT8 "dynamic": signed uniform grids, provided as codebooks so the
    same kernel path serves every format.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# QLoRA NormalFloat-4 levels (exact constants used by the reference and
# bitsandbytes). Sorted ascending; index 7 is exactly 0.0.
NF4_LEVELS = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)


def _nf8_levels() -> np.ndarray:
    """256 tanh-warped levels over [-1, 1] (reference NF8 semantics)."""
    lin = np.linspace(-1.0, 1.0, 256, dtype=np.float64)
    lv = np.tanh(lin * 2.0)
    lv = lv / np.abs(lv).max()
    return lv.astype(np.float32)


def _fp4_levels() -> np.ndarray:
    """e2m1 representable magnitudes, absmax-normalized to [-1, 1].

    Grid: {0, 0.5, 1, 1.5, 2, 3, 4, 6} / 6 in both signs (sign-magnitude,
    so +0 and -0 both exist; we keep 16 entries with a duplicate zero to
    preserve the 4-bit code space).
    """
    mags = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]) / 6.0
    lv = np.concatenate([-mags[::-1], mags])  # 16 values, one dup zero pair
    return np.sort(lv).astype(np.float32)


def _fp8_e4m3_levels() -> np.ndarray:
    """256-entry e4m3 value table, absmax-normalized (max finite = 448)."""
    vals = []
    for s in (1.0, -1.0):
        for e in range(16):
            for m in range(8):
                if e == 0:  # subnormal
                    v = s * (m / 8.0) * 2.0 ** (-6)
                elif e == 15 and m == 7:  # NaN slot in e4m3fn -> clamp to max
                    v = s * 448.0
                else:
                    v = s * (1.0 + m / 8.0) * 2.0 ** (e - 7)
                vals.append(v)
    lv = np.sort(np.array(vals, dtype=np.float64) / 448.0)
    return lv.astype(np.float32)


def _int_levels(bits: int) -> np.ndarray:
    """Symmetric signed uniform grid, e.g. INT4 -> [-7..7]/7 (15 levels,
    padded to 16 with an extra -1 endpoint alias removed: we use the full
    even grid [-2^(b-1)+1 .. 2^(b-1)-1] normalized, plus one slot reused
    for -max to keep 2**bits entries)."""
    qmax = 2 ** (bits - 1) - 1
    grid = np.arange(-qmax, qmax + 1, dtype=np.float64) / qmax  # 2^bits - 1
    grid = np.concatenate([[-1.0], grid])  # pad slot (duplicate -1.0)
    return np.sort(grid).astype(np.float32)


_REGISTRY: dict[str, np.ndarray] = {}


def _register(name: str, levels: np.ndarray) -> None:
    assert levels.ndim == 1 and np.all(np.diff(levels) >= 0)
    _REGISTRY[name] = levels


_register("nf4", NF4_LEVELS)
_register("nf8", _nf8_levels())
_register("fp4", _fp4_levels())
_register("fp8", _fp8_e4m3_levels())
_register("int4", _int_levels(4))
_register("int8", _int_levels(8))


def codebook_names() -> tuple[str, ...]:
    return tuple(_REGISTRY)


# NOTE: these return fresh jnp constants per call (the numpy master copy is
# module-level). Caching device arrays here would leak tracers when the
# first call happens inside a jit trace.


def get_codebook(name: str) -> jnp.ndarray:
    """Sorted codebook levels, normalized to [-1, 1]."""
    if name not in _REGISTRY:
        raise ValueError(f"unknown codebook {name!r}; have {codebook_names()}")
    return jnp.asarray(_REGISTRY[name])


@functools.lru_cache(maxsize=None)
def _midpoints_np(name: str) -> np.ndarray:
    lv = _REGISTRY[name]
    return (lv[1:] + lv[:-1]) / 2.0


def get_midpoints(name: str) -> jnp.ndarray:
    """Decision boundaries between adjacent codebook levels (len 2^bits-1)."""
    return jnp.asarray(_midpoints_np(name))


def bits_of(name: str) -> int:
    return int(np.log2(len(_REGISTRY[name])))
