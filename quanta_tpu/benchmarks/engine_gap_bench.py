"""Decompose the serving-engine throughput gap (VERDICT r3 weak #1).

BENCH_r03 measured raw in-jit decode at 2392 tok/s/chip but Engine serving
at 363 — a 6.5x gap previously *asserted* to be "host round trip plus
paged-gather cost" with no measurement splitting the terms. This bench
separates them on the real chip:

  1. ``contig window``   — k decode steps on the contiguous cache, in-jit
                           (scan-slope; the decode_bench protocol). The
                           compute floor: no paging, no host.
  2. ``paged window dev`` — one decode_multi_step window (k steps, paged
                           pool + page-table gather) measured in-jit by
                           scanning W windows and taking the slope.
                           (2) - (1) = the paged-KV device cost: gather
                           HBM + table indirection + in-scan sampling.
  3. ``paged window sync`` — the same window dispatched from host with an
                           immediate token readback per window (what a
                           non-pipelined engine pays). (3) - (2) = host
                           link: dispatch + RTT + transfer.
  4. ``paged window pipelined(d)`` — dispatch window i, read back window
                           i-d (the engine's deferred-readback pattern) at
                           depth d in {1, 2}. Shows how much of the link
                           cost pipelining actually hides, and whether
                           depth 2 (readback lagging two windows) hides
                           the RTT entirely.
  5. ``link RTT``        — dispatch + readback of an 8-element array
                           (scalar host round trip floor over the tunnel).

Width scaling: (2) is measured at two page-table width buckets to expose
the gather-HBM slope vs the page-walk overhead.

Usage:  python -m quanta_tpu.benchmarks.engine_gap_bench [--tiny]
Writes a breakdown table to stderr and a JSON line to stdout; the
committed numbers live in docs/SERVE_BENCH.md.
"""

import argparse
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _setup(cfg, fmt, n_slots, page_size, width, pos0):
    """Steady-state paged serving state: every slot mid-sequence at pos0."""
    from quanta_tpu import nn as qnn
    from quanta_tpu.models import llama
    from quanta_tpu.serve import kvcache

    dense = llama.init_params(jax.random.PRNGKey(0), cfg)
    if fmt == "bf16":
        params = dense
    else:
        params = qnn.quantize_params(dense, mode=fmt, block_size=64)
    n_pages = 1 + n_slots * width
    pool = kvcache.init_pool(cfg, n_pages, page_size)
    table = np.zeros((n_slots, width), np.int32)
    need = -(-pos0 // page_size) + 1
    for s in range(n_slots):
        table[s, :need] = 1 + s * width + np.arange(need)
    positions = jnp.full((n_slots,), pos0, jnp.int32)
    tokens = jnp.zeros((n_slots,), jnp.int32)
    state = dict(
        params=params,
        pool=pool,
        table=jnp.asarray(table),
        positions=positions,
        tokens=tokens,
        key=jax.random.PRNGKey(1),
        temps=jnp.zeros((n_slots,), jnp.float32),
        topks=jnp.zeros((n_slots,), jnp.int32),
    )
    # give every slot enough pages for the longest measured run
    for s in range(n_slots):
        table[s, :] = 1 + s * width + np.arange(width)
    state["table_full"] = jnp.asarray(table)
    return state


def _windows_in_jit(state, cfg, page_size, k, W, use_kernel):
    """Scan W decode_multi_step windows inside ONE jit; returns checksum."""
    from quanta_tpu.serve import runner

    @partial(jax.jit, static_argnames=("W",))
    def loop(params, pool, table, positions, tokens, key, temps, topks,
             seed, W):
        def body(carry, _):
            pool, positions, tokens, key = carry
            toks, positions, key, pool = runner.decode_multi_step(
                params, pool, table, positions, tokens, key, temps, topks,
                cfg, page_size, k, use_kernel=use_kernel,
            )
            return (pool, positions, toks[-1], key), toks.sum()

        (pool, positions, tokens, key), sums = jax.lax.scan(
            body,
            (pool, positions, tokens + (seed & 1), key),
            None, length=W,
        )
        return sums.sum()

    def run(seed):
        return loop(
            state["params"], state["pool"], state["table_full"],
            state["positions"], state["tokens"], state["key"],
            state["temps"], state["topks"], jnp.int32(seed), W,
        )

    np.asarray(run(0))  # compile + warm
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        np.asarray(run(r + 1))
        best = min(best, time.perf_counter() - t0)
    return best


def window_dev_time(state, cfg, page_size, k, use_kernel, W0=2, W1=10):
    t0 = _windows_in_jit(state, cfg, page_size, k, W0, use_kernel)
    t1 = _windows_in_jit(state, cfg, page_size, k, W1, use_kernel)
    return max((t1 - t0) / (W1 - W0), 1e-9)


def window_host_time(state, cfg, page_size, k, use_kernel, depth, n=24):
    """Per-window time dispatching from host, reading back at ``depth``
    windows behind (depth=0: synchronous readback every window)."""
    from quanta_tpu.serve import runner

    def dispatch(pool, positions, tokens, key):
        return runner.decode_multi_step(
            state["params"], pool, state["table_full"], positions, tokens,
            key, state["temps"], state["topks"], cfg, page_size, k,
            use_kernel=use_kernel,
        )

    def run_loop(n_windows):
        pool = state["pool"]
        positions, tokens, key = (
            state["positions"], state["tokens"], state["key"])
        pending = []
        t0 = time.perf_counter()
        for _ in range(n_windows):
            toks, positions, key, pool = dispatch(
                pool, positions, tokens, key)
            tokens = toks[-1]
            pending.append(toks)
            if len(pending) > depth:
                np.asarray(pending.pop(0))
        for p in pending:
            np.asarray(p)
        dt = time.perf_counter() - t0
        state["pool"] = pool  # pool was donated; keep the live buffer
        return dt

    run_loop(2)  # warm
    return run_loop(n) / n


def link_rtt(n=10):
    x = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x, s: x + s)
    np.asarray(f(x, jnp.int32(0)))
    best = 1e9
    for r in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x, jnp.int32(r)))
        best = min(best, time.perf_counter() - t0)
    return best


def contig_step_time(cfg, fmt, batch):
    from quanta_tpu import nn as qnn
    from quanta_tpu.benchmarks.decode_bench import bench_decode
    from quanta_tpu.models import llama

    dense = llama.init_params(jax.random.PRNGKey(0), cfg)
    params = dense if fmt == "bf16" else qnn.quantize_params(
        dense, mode=fmt, block_size=64)
    jax.block_until_ready(params)
    return bench_decode(params, cfg, batch=batch, prefill_len=128,
                        cache_len=512)


def main():
    from quanta_tpu.models import llama

    ap = argparse.ArgumentParser()
    ap.add_argument("--fmt", default="nf4a")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    log("devices:", jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    use_kernel = on_tpu if args.fmt not in ("bf16", "llm_int8") else None
    cfg = (llama.LlamaConfig.tiny(max_seq_len=512) if args.tiny
           else llama.LlamaConfig.tinyllama_1b())
    page_size, k, B = 16, args.k, args.slots

    r = {"fmt": args.fmt, "k": k, "n_slots": B}
    r["link_rtt_ms"] = round(link_rtt() * 1e3, 2)

    # contiguous compute floor (per token, batch=B) -> per window of k
    t_contig = contig_step_time(cfg, args.fmt, B)
    r["contig_window_ms"] = round(t_contig * k * 1e3, 2)

    # paged window, in-jit, at two widths
    for width, pos0, W0, W1 in ((4, 8, 2, 6), (16, 160, 2, 10)):
        st = _setup(cfg, args.fmt, B, page_size, width, pos0)
        t = window_dev_time(st, cfg, page_size, k, use_kernel, W0, W1)
        r[f"paged_window_dev_w{width}_ms"] = round(t * 1e3, 2)

    # host-dispatched window at depths 0/1/2 (width 16 steady state)
    for depth in (0, 1, 2):
        st = _setup(cfg, args.fmt, B, page_size, 16, 160)
        t = window_host_time(st, cfg, page_size, k, use_kernel, depth)
        r[f"paged_window_host_d{depth}_ms"] = round(t * 1e3, 2)

    dev = r["paged_window_dev_w16_ms"]
    r["paged_kv_device_cost_ms"] = round(dev - r["contig_window_ms"], 2)
    r["host_link_cost_sync_ms"] = round(
        r["paged_window_host_d0_ms"] - dev, 2)
    r["host_link_cost_pipelined_ms"] = round(
        r["paged_window_host_d2_ms"] - dev, 2)
    r["tok_s_chip_dev_bound"] = round(B * k / (dev * 1e-3), 1)
    r["tok_s_chip_sync"] = round(
        B * k / (r["paged_window_host_d0_ms"] * 1e-3), 1)
    r["tok_s_chip_pipelined_d2"] = round(
        B * k / (r["paged_window_host_d2_ms"] * 1e-3), 1)

    log(json.dumps(r, indent=2))
    print(json.dumps(r))


if __name__ == "__main__":
    main()
