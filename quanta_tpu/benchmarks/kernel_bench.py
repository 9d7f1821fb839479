"""Per-kernel microbenchmark: fused dequant-matmul vs dense bf16.

Measures the production kernels (quanta_tpu.ops.matmul) at TinyLlama
decode/prefill shapes on the real chip and writes docs/KERNEL_BENCH.md
with speedup-vs-dense and %-of-roofline per cell.

Measurement design (hard-won; see docs/KERNEL_DESIGN.md "Timing
protocol"):

* **Streaming harness.** A loop-invariant weight gets pinned in VMEM by
  XLA across scan iterations, so naive micro-loops measure a
  weights-resident regime that real multi-layer decode never sees
  (dense 2048x2048 measured 3.8 us vs its 10.3 us HBM floor). Here the
  inner scan runs over R stacked weight replicas (R sized so the stack
  exceeds VMEM), the same access pattern as scanning a model's layers —
  HBM traffic is honest.
* **Noise floor.** On the axon tunnel, per-call host jitter is 10-300 ms
  and block_until_ready does not wait. Each measurement therefore runs
  >= ~200 ms of device work inside one jit, repeats the (short, long)
  loop pair 5 times interleaved, and takes the median slope. Cells whose
  median still lands below the shape's physical roofline floor are
  clamped to the floor and marked "~" (measurement failure, not magic —
  round 2 committed a "0.0 us (24415x)" artifact of exactly this mode).

Usage: python -m quanta_tpu.benchmarks.kernel_bench [--out docs/KERNEL_BENCH.md]
"""

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from quanta_tpu.core import codecs
from quanta_tpu.ops import int4c as int4c_mod
from quanta_tpu.ops import int8mm
from quanta_tpu.ops import matmul as mm
from quanta_tpu.profiling import matmul_roofline

TARGET_S = 0.2  # device work per long loop
REPS = 5


def _replicas(bytes_one: int) -> int:
    """Stack size so the weight working set clearly exceeds VMEM."""
    return int(min(24, max(3, (192 << 20) // max(bytes_one, 1) + 1)))


def _make_loop(op, L: int):
    """L outer iterations, each scanning over all R stacked weights."""

    @jax.jit
    def loop(seed, x, ws, L=L):
        def outer(acc, _):
            def body(a, w):
                xi = x + (a * 1e-30).astype(x.dtype)
                return op(xi, w).astype(jnp.float32).sum() * 1e-30, None

            a, _ = jax.lax.scan(body, acc, ws)
            return a, None

        acc, _ = jax.lax.scan(outer, seed, None, length=L)
        return acc

    return loop


def _timed(loop, args, seed: float) -> float:
    t0 = time.perf_counter()
    np.asarray(loop(jnp.float32(seed), *args))
    return time.perf_counter() - t0


def slope_time(op, x, ws, R: int, floor_s: float):
    """Median-of-REPS slope between a short and a long loop length.

    Returns (seconds_per_op, suspect) — suspect=True when the median
    lands under the physical floor (clamped to it)."""
    loop_est = _make_loop(op, 2)
    _timed(loop_est, (x, ws), 0.0)  # compile
    est = max(min(_timed(loop_est, (x, ws), 1.0),
                  _timed(loop_est, (x, ws), 2.0)) / (2 * R), 1e-7)
    L1 = int(np.clip(TARGET_S / (est * R), 4, 4096))
    L0 = max(1, L1 // 8)
    lo, hi = _make_loop(op, L0), _make_loop(op, L1)
    _timed(lo, (x, ws), 0.0)
    _timed(hi, (x, ws), 0.0)
    slopes = []
    for r in range(REPS):
        t0 = _timed(lo, (x, ws), r + 1.0)
        t1 = _timed(hi, (x, ws), r + 101.0)
        slopes.append((t1 - t0) / ((L1 - L0) * R))
    s = float(np.median(slopes))
    if s < floor_s:
        return floor_s, True
    return s, False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.getcwd(), "docs",
                                                  "KERNEL_BENCH.md"))
    ap.add_argument("--m", type=int, nargs="+", default=[8, 128])
    args = ap.parse_args()

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    shapes = [  # TinyLlama-1.1B projection shapes
        ("qkv/o proj", 2048, 2048),
        ("gate/up   ", 2048, 5632),
        ("down      ", 5632, 2048),
        ("lm_head   ", 2048, 32000),
    ]
    fmts = ["nf4a", "nf4", "int4", "int8"]
    i8_variants = [("llm_int8", True), ("llm_int8(xla)", False)]
    # int4c: 4-bit codes on the int8 MXU (per-column scales)
    block = 64

    lines = [
        "# Kernel microbenchmarks — fused dequant-matmul vs dense bf16",
        "",
        f"Device: `{dev}` · block_size={block} · streaming-weights scan "
        "harness, median-of-5 in-jit slope (see kernel_bench.py docstring; "
        "`~` marks a cell clamped to its roofline floor because the "
        "measurement undershot physics)",
        "",
    ]
    for M in args.m:
        lines += [
            f"## M = {M} ({'decode' if M <= 16 else 'prefill'} shape)",
            "",
            "| matmul (K x N) | dense bf16 | " + " | ".join(
                fmts + [v[0] for v in i8_variants] + ["int4c"]) + " |",
            "|---|---|" + "---|" * (len(fmts) + len(i8_variants) + 1),
        ]
        for label, K, N in shapes:
            kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
            x = jax.random.normal(kx, (M, K), jnp.bfloat16)
            w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
            wb = w.astype(jnp.bfloat16)
            rl_dense = matmul_roofline(M, K, N, weight_bits=16)
            Rd = _replicas(K * N * 2)
            wsd = jnp.stack([wb] * Rd)
            jax.block_until_ready(wsd)
            t_dense, sus = slope_time(
                lambda a, wi: a @ wi, x, wsd, Rd, rl_dense.t_roofline_s
            )
            del wsd
            mark = "~" if sus else ""
            row = [f"{mark}{t_dense*1e6:.1f} us "
                   f"({rl_dense.pct(t_dense):.0f}%RL)"]
            for fmt in fmts:
                qt = codecs.quantize_matmul_weight(w, fmt=fmt,
                                                   block_size=block)
                bits = 4 if qt.bits == 4 else 8
                rl = matmul_roofline(M, K, N, weight_bits=bits,
                                     block_size=block)
                Rq = _replicas(qt.codes.size + qt.scale.size * 4)
                ws = {"c": jnp.stack([qt.codes] * Rq),
                      "s": jnp.stack([qt.scale] * Rq)}
                jax.block_until_ready(ws)

                def op(a, wi, qt=qt):
                    q = dataclasses.replace(qt, codes=wi["c"], scale=wi["s"])
                    return mm.matmul_quantized(a, q)

                t, sus = slope_time(op, x, ws, Rq, rl.t_roofline_s)
                del ws
                mark = "~" if sus else ""
                row.append(f"{mark}{t*1e6:.1f} us ({t_dense/t:.2f}x, "
                           f"{rl.pct(t):.0f}%RL)")
            # LLM.int8 outlier-decomposition matmul: fused Pallas
            # int8-MXU kernel vs pure-XLA path. The streamed weight is
            # the int8 code matrix; the activation re-quantize runs per
            # call, as in serving.
            qw = int8mm.quantize_int8_weight(w)
            rl8 = matmul_roofline(M, K, N, weight_bits=8)
            Rq = _replicas(qw.codes.size)
            ws8 = jnp.stack([qw.codes] * Rq)
            jax.block_until_ready(ws8)
            for _, use_k in i8_variants:
                def op8(a, wi, qw=qw, use_k=use_k):
                    q = dataclasses.replace(qw, codes=wi)
                    return int8mm.matmul_int8(a, q, use_kernel=use_k)

                t, sus = slope_time(op8, x, ws8, Rq, rl8.t_roofline_s)
                mark = "~" if sus else ""
                row.append(f"{mark}{t*1e6:.1f} us ({t_dense/t:.2f}x, "
                           f"{rl8.pct(t):.0f}%RL)")
            del ws8
            q4c = int4c_mod.quantize_int4c_weight(w)
            rl4c = matmul_roofline(M, K, N, weight_bits=4)
            R4 = _replicas(q4c.codes.size)
            ws4 = jnp.stack([q4c.codes] * R4)
            jax.block_until_ready(ws4)

            def op4c(a, wi, q4c=q4c):
                q = dataclasses.replace(q4c, codes=wi)
                return int4c_mod.matmul_int4c(a, q)

            t, sus = slope_time(op4c, x, ws4, R4, rl4c.t_roofline_s)
            del ws4
            mark = "~" if sus else ""
            row.append(f"{mark}{t*1e6:.1f} us ({t_dense/t:.2f}x, "
                       f"{rl4c.pct(t):.0f}%RL)")
            line = f"| {label} {K}x{N} | " + " | ".join(row) + " |"
            lines.append(line)
            print(line, flush=True)
        lines.append("")

    lines += [
        "Notes:",
        "- `(Nx)` = speedup vs dense bf16 on the same shape; >1 is faster.",
        "- `%RL` = percent of the shape's roofline (max of HBM-bytes and",
        "  MXU-flops floors for the format's weight bit-width; see",
        "  quanta_tpu.profiling.matmul_roofline).",
        "- nf4a/int4 dequantize arithmetically (Horner polynomial);",
        "  table-lookup nf4 pays ~19 VPU ops per weight element for exact",
        "  QLoRA-NF4 levels — the measured VPU floor of an arbitrary",
        "  16-entry LUT (docs/KERNEL_DESIGN.md).",
        "- Numbers are the streaming-weights regime (weights read from HBM",
        "  every step, like real multi-layer decode); single-weight loops",
        "  that let XLA pin the weight in VMEM run up to ~3x faster and",
        "  are not representative.",
        "- Run-to-run variance (measured, benchmarks/decode_tile_ab.py):",
        "  full-model decode repeats WITHIN one session spread ~1%;",
        "  across sessions/rounds the same code has moved up to ~4-5%",
        "  (tunnel/allocation variation). Per-op cells can move",
        "  +-20-40%. Judge regressions against these bounds: the r3->r4",
        "  nf4a decode delta (2392 -> 2289, 4.3%) is cross-session",
        "  variance — the suspected tuned-tile re-keying measures within",
        "  0.4% of the heuristics at model level.",
        "",
    ]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
