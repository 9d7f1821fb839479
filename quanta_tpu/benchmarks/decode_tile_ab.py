"""A/B: tuned decode tiles vs heuristics, full-model decode (VERDICT r4
weak #2 — the nf4a headline regressed 2392 -> 2289 tok/s between r3 and
r4, coinciding with f4347a1 which fixed the tuned-tile table keys so the
tuned tiles actually APPLIED; r3's committed number had been running the
heuristics. This measures both configurations at the model level, 5
repeats each, and prints the winner plus the run-to-run spread so
future deltas can be judged against measured variance. Each rep
recompiles its timing loops, so reps are expensive — 3 by default.)

Usage: python -m quanta_tpu.benchmarks.decode_tile_ab [--fmt nf4a]
"""

import argparse
import json
import sys

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from quanta_tpu import nn as qnn
    from quanta_tpu.benchmarks.decode_bench import bench_decode
    from quanta_tpu.models import llama
    from quanta_tpu.ops import matmul as mm

    ap = argparse.ArgumentParser()
    ap.add_argument("--fmt", default="nf4a")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    log("devices:", jax.devices())

    cfg = llama.LlamaConfig.tinyllama_1b()
    dense = llama.init_params(jax.random.PRNGKey(0), cfg)
    params = qnn.quantize_params(dense, mode=args.fmt, block_size=64)
    del dense
    jax.block_until_ready(params)

    saved = dict(mm._TUNED_DECODE_TILES)
    results = {}
    for name, table in [("tuned", saved), ("heuristic", {})]:
        mm._TUNED_DECODE_TILES.clear()
        mm._TUNED_DECODE_TILES.update(table)
        rates = []
        for r in range(args.reps):
            t = bench_decode(params, cfg, batch=8, prefill_len=128,
                             cache_len=512)
            rates.append(8 / t)
            log(f"{name} rep {r}: {rates[-1]:.1f} tok/s/chip")
        results[name] = {
            "median_tok_s": round(float(np.median(rates)), 1),
            "min": round(min(rates), 1), "max": round(max(rates), 1),
            "spread_pct": round(100 * (max(rates) - min(rates))
                                / np.median(rates), 1),
        }
    mm._TUNED_DECODE_TILES.clear()
    mm._TUNED_DECODE_TILES.update(saved)

    t, h = results["tuned"], results["heuristic"]
    verdict = ("tuned" if t["median_tok_s"] >= h["median_tok_s"]
               else "heuristic")
    log(f"winner: {verdict} (tuned {t['median_tok_s']} vs heuristic "
        f"{h['median_tok_s']} tok/s/chip; spreads {t['spread_pct']}% / "
        f"{h['spread_pct']}%)")
    print(json.dumps({"fmt": args.fmt, **results, "winner": verdict}))


if __name__ == "__main__":
    main()
