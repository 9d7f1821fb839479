"""Accuracy benchmark: perplexity delta of every weight format vs bf16.

North-star gates (BASELINE.md): ppl delta vs bf16 <= 0.1 at 8-bit and
<= 0.5 at 4-bit on WikiText-2. No network egress here, so the protocol is:
pretrain a small byte-level Llama on a deterministic local text corpus
(benchmarks/corpus.py), quantize its weights into every serving format,
and measure held-out perplexity with quanta_tpu.eval — the same harness a
user would point at WikiText-2 + real TinyLlama weights (see
quanta_tpu.models.hf for the checkpoint importer).

Writes docs/ACCURACY.md and prints the table. Run on TPU (or CPU with
--steps small).

Usage: python benchmarks/accuracy_bench.py [--steps 1500] [--dim 256]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import corpus as corpus_mod  # noqa: E402
from quanta_tpu import eval as qeval  # noqa: E402
from quanta_tpu import nn as qnn  # noqa: E402
from quanta_tpu import optim as qoptim  # noqa: E402
from quanta_tpu import train as qtrain  # noqa: E402
from quanta_tpu.models import llama  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batches(ids: np.ndarray, batch: int, seq_len: int, steps: int, seed=0):
    rng = np.random.default_rng(seed)
    n = len(ids) - seq_len - 1
    for _ in range(steps):
        starts = rng.integers(0, n, size=batch)
        windows = np.stack([ids[s : s + seq_len + 1] for s in starts])
        yield {
            "inputs": jnp.asarray(windows[:, :-1]),
            "targets": jnp.asarray(windows[:, 1:]),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-bytes", type=int, default=200_000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "ACCURACY.md"))
    args = ap.parse_args()

    log("devices:", jax.devices())
    tok = qeval.ByteTokenizer()
    corpus = corpus_mod.build_corpus()
    train_text, eval_text = corpus_mod.train_eval_split(corpus)
    train_ids = tok.encode(train_text)
    eval_ids = tok.encode(eval_text)[: args.eval_bytes]
    log(f"corpus: {len(train_ids)} train / {len(eval_ids)} eval bytes")

    cfg = llama.LlamaConfig(
        vocab_size=256,
        dim=args.dim,
        n_layers=args.layers,
        n_heads=8,
        n_kv_heads=4,
        hidden_dim=args.dim * 3,
        max_seq_len=args.seq,
        dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    # pretrain with the framework's own 8-bit blockwise Adam
    tx = qoptim.adam8bit(3e-4)
    opt_state = tx.init(params)
    step = jax.jit(qtrain.make_train_step(cfg, tx, use_kernel=False))

    t0 = time.time()
    loss = None
    for i, batch in enumerate(
        make_batches(train_ids, args.batch, args.seq, args.steps)
    ):
        params, opt_state, loss = step(params, opt_state, batch)
        if i % 200 == 0:
            log(f"step {i:5d} loss {float(loss):.3f} ({time.time()-t0:.0f}s)")
    log(f"trained {args.steps} steps, final loss {float(loss):.3f}")

    variants = {"bf16": params}
    for fmt in ("int8", "nf8", "llm_int8", "nf4a", "nf4", "int4", "fp4"):
        variants[fmt] = qnn.quantize_params(
            params, mode=fmt, block_size=64, min_size=4096
        )

    use_kernel = jax.default_backend() == "tpu"
    table = qeval.ppl_table(
        variants, eval_ids, cfg, seq_len=args.seq, batch=args.batch,
        use_kernel=use_kernel,
    )

    gate = {"int8": 0.1, "nf8": 0.1, "llm_int8": 0.1,
            "nf4a": 0.5, "nf4": 0.5, "int4": 0.5, "fp4": 0.5}
    lines = [
        "# Accuracy: held-out perplexity per weight format",
        "",
        f"Byte-level Llama (dim={args.dim}, layers={args.layers}) pretrained "
        f"{args.steps} steps on a local doc corpus (benchmarks/corpus.py; no "
        "network egress for WikiText-2 — the harness in quanta_tpu.eval is "
        "corpus-agnostic and takes real checkpoints via quanta_tpu.models.hf).",
        "",
        "Gates from BASELINE.md: delta <= 0.1 (8-bit), <= 0.5 (4-bit).",
        "",
        "| format | ppl | delta vs bf16 | gate | pass |",
        "|---|---|---|---|---|",
    ]
    for name, r in table.items():
        g = gate.get(name)
        ok = "" if g is None else ("yes" if r["delta"] <= g else "**NO**")
        lines.append(
            f"| {name} | {r['ppl']:.4f} | {r['delta']:+.4f} | "
            f"{g if g is not None else '-'} | {ok} |"
        )
        log(f"{name:9s} ppl {r['ppl']:8.4f}  delta {r['delta']:+.4f}")
    lines.append("")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    log("wrote " + args.out)


if __name__ == "__main__":
    main()
