"""Profiling + roofline accounting (SURVEY.md §5 tracing/profiling row).

The reference has no profiling subsystem — only wall-clock loops
(/root/reference/example/benchmarks.py:40-45) and CUDA-event timing
(/root/reference/example/model_quantization_example.py:56-62). The
TPU-native equivalent here:

  - ``measure``: the framework's canonical timing protocol. On the axon
    TPU tunnel ``block_until_ready`` does not wait for device execution,
    so an op is applied L times inside one jit through a serializing
    carry, the scalar result is read back to host, and per-op time is the
    slope between two L values (immune to dispatch/readback constants).
  - ``matmul_roofline``: bytes-moved / MXU-flops accounting for a (possibly
    quantized) matmul, against the device's HBM bandwidth and MXU peak —
    the ≥90%-of-roofline north star (BASELINE.md) needs this denominator.
  - ``trace``: a jax.profiler wrapper (guarded — the profiler is not
    available over every transport).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- device info


@dataclasses.dataclass(frozen=True)
class DeviceSpec:
    name: str
    hbm_gbps: float      # HBM bandwidth, GB/s
    bf16_tflops: float   # MXU peak, bf16
    int8_tops: float     # MXU peak, int8
    vpu_gops: float      # VPU f32 elementwise ops/s (lanes * ALUs * clock)


# Public per-generation specs (cloud.google.com/tpu/docs/system-architecture).
_DEVICE_TABLE = {
    "v5 lite": DeviceSpec("v5e", 819.0, 197.0, 394.0, 3900.0),
    "v5e": DeviceSpec("v5e", 819.0, 197.0, 394.0, 3900.0),
    "v5p": DeviceSpec("v5p", 2765.0, 459.0, 918.0, 7400.0),
    "v4": DeviceSpec("v4", 1228.0, 275.0, 275.0, 4300.0),
    "v6e": DeviceSpec("v6e", 1640.0, 918.0, 1836.0, 7400.0),
    "cpu": DeviceSpec("cpu", 50.0, 1.0, 2.0, 100.0),
}


def device_spec(device=None) -> DeviceSpec:
    if isinstance(device, DeviceSpec):
        return device
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "") or str(device)
    kind = kind.lower()
    for key, spec in _DEVICE_TABLE.items():
        if key in kind:
            return spec
    return _DEVICE_TABLE["cpu"] if device.platform == "cpu" else _DEVICE_TABLE["v5 lite"]


# ------------------------------------------------------------------- timing


def measure(
    op: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    *,
    L0: int = 16,
    L1: int = 272,
    reps: int = 4,
) -> float:
    """Best-of-``reps`` seconds per application of ``op`` (scan slope).

    ``op`` must map an array to an array; it is re-applied to a perturbed
    input each iteration so XLA cannot hoist it out of the loop.
    """
    t = {}
    for L in (L0, L1):

        @jax.jit
        def loop(seed, L=L):
            def body(acc, _):
                xi = x + (acc * 1e-30).astype(x.dtype)
                out = op(xi)
                return out.astype(jnp.float32).sum() * 1e-30, None

            acc, _ = jax.lax.scan(body, seed, None, length=L)
            return acc

        np.asarray(loop(jnp.float32(0)))  # compile + warm
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.float32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        t[L] = best
    return max((t[L1] - t[L0]) / (L1 - L0), 1e-9)


# ----------------------------------------------------------------- roofline


@dataclasses.dataclass(frozen=True)
class Roofline:
    flops: int
    bytes: int
    t_mxu_s: float       # compute-bound floor
    t_hbm_s: float       # memory-bound floor
    t_roofline_s: float  # max of the two: the speed-of-light time

    def pct(self, measured_s: float) -> float:
        """Percent of roofline achieved by a measured time."""
        return 100.0 * self.t_roofline_s / max(measured_s, 1e-12)


def matmul_roofline(
    m: int,
    k: int,
    n: int,
    *,
    weight_bits: int = 16,
    block_size: int = 0,
    act_bytes: int = 2,
    out_bytes: int = 2,
    scale_bytes: int = 4,
    device=None,
) -> Roofline:
    """Roofline for ``(m,k) @ (k,n)`` with a ``weight_bits`` weight.

    bytes = activations in + packed weight (+ block scales) + output out;
    flops = 2mkn on the MXU. For quantized weights the dequant runs on the
    VPU and is modeled as compute *hidden* behind the weight fetch when it
    fits — the roofline is the bound, not a prediction.
    """
    spec = device_spec(device)
    w_bytes = k * n * weight_bits // 8
    s_bytes = (k // block_size) * n * scale_bytes if block_size else 0
    total_bytes = m * k * act_bytes + w_bytes + s_bytes + m * n * out_bytes
    flops = 2 * m * k * n
    t_mxu = flops / (spec.bf16_tflops * 1e12)
    t_hbm = total_bytes / (spec.hbm_gbps * 1e9)
    return Roofline(flops, total_bytes, t_mxu, t_hbm, max(t_mxu, t_hbm))


def decode_step_roofline(cfg, batch: int = 8, weight_bits: int = 16,
                         block_size: int = 0, kv_len: int = 512,
                         kv_bytes: int = 2, device=None) -> Roofline:
    """Whole-decoder single-token roofline: all projections + KV reads."""
    hd, nh, nkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    shapes = [
        (cfg.dim, nh * hd), (cfg.dim, nkv * hd), (cfg.dim, nkv * hd),
        (nh * hd, cfg.dim), (cfg.dim, cfg.hidden_dim),
        (cfg.dim, cfg.hidden_dim), (cfg.hidden_dim, cfg.dim),
    ]
    flops = bytes_ = 0
    for k, n in shapes:
        r = matmul_roofline(batch, k, n, weight_bits=weight_bits,
                            block_size=block_size, device=device)
        flops += r.flops * cfg.n_layers
        bytes_ += r.bytes * cfg.n_layers
    head = matmul_roofline(batch, cfg.dim, cfg.vocab_size,
                           weight_bits=weight_bits, block_size=block_size,
                           device=device)
    flops += head.flops
    bytes_ += head.bytes
    # KV cache read (k+v) per layer + attention flops
    kv = cfg.n_layers * 2 * batch * kv_len * nkv * hd
    bytes_ += kv * kv_bytes
    flops += cfg.n_layers * 2 * 2 * batch * nh * kv_len * hd
    spec = device_spec(device)
    t_mxu = flops / (spec.bf16_tflops * 1e12)
    t_hbm = bytes_ / (spec.hbm_gbps * 1e9)
    return Roofline(flops, bytes_, t_mxu, t_hbm, max(t_mxu, t_hbm))


# -------------------------------------------------------------------- trace


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; no-op where the profiler can't start."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # transport without profiler support
        print(f"profiling.trace: profiler unavailable ({e}); continuing")
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
