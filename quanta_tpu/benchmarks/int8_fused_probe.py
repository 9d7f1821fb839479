"""Three-way llm_int8 probe: fused-prologue/epilogue Pallas kernel vs
the plain kernel (XLA quantize + Pallas GEMM + XLA add) vs pure XLA.

VERDICT r4 #3: the llm_int8 path sat at ~70% of its HBM floor, with the
residual attributed to the XLA fusion chain around the bare GEMM kernel
(activation row-quantize, scale application, outlier-GEMM add — each a
separate fusion with ramp-up at M=8 sizes). `matmul_int8_fused` folds
the quantize into the kernel prologue and scales+outlier-add into the
epilogue; this probe measures all three paths with kernel_bench's
streaming-weights slope harness and prints the winner per shape.

Also measures the int8 KV-cache quantize: serve/kvcache.quantize_kv
(XLA) vs ops/quantize.quantize_blockwise (Pallas) at serving shapes —
VERDICT r4 weak #6 asked for this measurement to decide whether the
kernel gets wired into the pool write path or documented as bench-only.

Usage: python -m quanta_tpu.benchmarks.int8_fused_probe
"""

import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from quanta_tpu.benchmarks.kernel_bench import _replicas, slope_time
from quanta_tpu.ops import int8mm
from quanta_tpu.profiling import matmul_roofline


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_matmul(M=8):
    shapes = [("qkv/o", 2048, 2048), ("gate/up", 2048, 5632),
              ("down", 5632, 2048), ("lm_head", 2048, 32000)]
    out = []
    for label, K, N in shapes:
        kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        qw = int8mm.quantize_int8_weight(w)
        rl = matmul_roofline(M, K, N, weight_bits=8)
        R = _replicas(qw.codes.size)
        ws = jnp.stack([qw.codes] * R)
        jax.block_until_ready(ws)
        row = {"shape": f"{label} {K}x{N}",
               "hbm_floor_us": round(rl.t_roofline_s * 1e6, 1)}
        for name, kw_args in [
            ("fused", dict(use_kernel=True, fused=True)),
            ("plain", dict(use_kernel=True, fused=False)),
            ("xla", dict(use_kernel=False)),
        ]:
            def op(a, wi, qw=qw, kw_args=kw_args):
                q = dataclasses.replace(qw, codes=wi)
                return int8mm.matmul_int8(a, q, **kw_args)

            t, sus = slope_time(op, x, ws, R, rl.t_roofline_s)
            row[name + "_us"] = round(t * 1e6, 1)
            row[name + "_pct_floor"] = round(100 * rl.t_roofline_s / t, 0)
            if sus:
                row[name + "_us"] = f"~{row[name + '_us']}"
        del ws
        log(row)
        out.append(row)
    return out


def probe_kv_quant():
    """quantize_kv (XLA) vs quantize_blockwise kernel, serving shapes."""
    from quanta_tpu.benchmarks.kernel_bench import _make_loop, _timed
    from quanta_tpu.ops.quantize import quantize_blockwise
    from quanta_tpu.serve.kvcache import quantize_kv

    rows = []
    # (tokens, n_kv_heads, head_dim): decode window write (8 slots x 8
    # tokens) and a 256-token prefill write, TinyLlama geometry
    for label, shape in [("decode window", (64, 4, 64)),
                         ("prefill 256", (256, 4, 64)),
                         ("prefill 2048", (2048, 4, 64))]:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        R = 8
        xs = jnp.stack([x] * R)

        def xla_op(a, wi):
            c, s = quantize_kv(wi + a.astype(wi.dtype) * 1e-30)
            return c.astype(jnp.float32).sum() + s.sum()

        def kern_op(a, wi):
            c, s = quantize_blockwise(
                wi + a.astype(wi.dtype) * 1e-30, fmt="int8_sym",
                block=shape[-1],
            )
            return c.astype(jnp.float32).sum() + s.sum()

        row = {"shape": f"{label} {shape}"}
        for name, op in [("xla", xla_op), ("kernel", kern_op)]:
            def wrapped(xi, wi, op=op):
                return op(xi, wi)

            t, _ = slope_time(wrapped, jnp.float32(0), xs, R, 1e-9)
            row[name + "_us"] = round(t * 1e6, 2)
        log(row)
        rows.append(row)
    return rows


def main():
    log("devices:", jax.devices())
    mm_rows = probe_matmul()
    kv_rows = probe_kv_quant()
    print(json.dumps({"int8_matmul": mm_rows, "kv_quant": kv_rows}))


if __name__ == "__main__":
    main()
