"""Whole-model post-training quantization + generation + perplexity.

Role of the reference's example/model_quantization_example.py on this
framework's flagship decoder: quantize a (tiny, random-init) Llama with
per-layer config rules and activation calibration, compare memory
footprints, greedy-decode from both models, and measure perplexity delta
on a synthetic byte corpus.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quanta_tpu import eval as qeval, ptq
from quanta_tpu.models import llama
from quanta_tpu.state.config import ConfigTree, QuantConfig


def tree_nbytes(params) -> int:
    return sum(
        leaf.nbytes
        for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, "nbytes")
    )


def main():
    # block_size=32 keeps the matmul-layout K padding (16*block) at zero
    # for these dims, so the memory comparison is honest
    cfg = llama.LlamaConfig.tiny(dim=512, hidden_dim=1024, n_layers=4,
                                 vocab_size=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    # three-tier rules: NF4a default, first layer + lm_head kept at 8-bit
    tree = ConfigTree(default=QuantConfig(bits=4, scheme="codebook",
                                          codebook="nf4a", block_size=32))
    tree.config_layer(r"layers/0/", bits=8, scheme="symmetric", codebook=None)
    tree.config_layer(r"lm_head", bits=8, scheme="symmetric", codebook=None)

    # calibration batches: random byte "text" through the model
    calib_tokens = jax.random.randint(
        jax.random.PRNGKey(1), (4, 8, 32), 0, cfg.vocab_size)

    def forward(p, batch):
        logits, _ = llama.forward(p, batch, cfg)
        return logits

    qparams = ptq.quantize_model(
        params, tree,
        forward=forward,
        calib_batches=list(calib_tokens),
        min_size=1024,
    )

    print("== Memory footprint ==")
    print(f"  bf16 model:      {tree_nbytes(params) / 1e6:8.2f} MB")
    print(f"  quantized model: {tree_nbytes(qparams) / 1e6:8.2f} MB")

    print("\n== Greedy generation (same prompt) ==")
    prompt = jnp.arange(8, dtype=jnp.int32)[None, :]
    out_fp = llama.greedy_decode(params, prompt, cfg, max_new_tokens=16)
    out_q = llama.greedy_decode(qparams, prompt, cfg, max_new_tokens=16)
    print("  bf16:", np.asarray(out_fp)[0, 8:].tolist())
    print("  quant:", np.asarray(out_q)[0, 8:].tolist())

    print("\n== Perplexity on a synthetic byte corpus ==")
    text = (b"the quick brown fox jumps over the lazy dog. " * 40)
    toks = np.frombuffer(text, np.uint8).astype(np.int32) % cfg.vocab_size
    ppl_fp = qeval.perplexity(params, toks, cfg, seq_len=64, batch=4)
    ppl_q = qeval.perplexity(qparams, toks, cfg, seq_len=64, batch=4)
    print(f"  bf16 ppl {ppl_fp:9.2f}   quantized ppl {ppl_q:9.2f}   "
          f"delta {ppl_q - ppl_fp:+.3f}")
    print("\n(random-init model: absolute ppl is meaningless; the delta "
          "shows quantization fidelity)")


if __name__ == "__main__":
    main()
