"""QLoRA fine-tuning demo: frozen NF4 base + bf16 LoRA + 8-bit Adam.

The north-star training config (BASELINE.md): quantize the base model to
4-bit, attach low-rank adapters, train only the adapters with blockwise
8-bit optimizer state, then merge. Runs a tiny model on synthetic data
and prints the loss curve plus the optimizer-state memory math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quanta_tpu import nn as qnn, optim as qoptim, train
from quanta_tpu.models import llama


def main():
    cfg = llama.LlamaConfig.tiny(dim=256, hidden_dim=512, n_layers=2,
                                 vocab_size=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    # 1. freeze the base in NF4a, attach rank-8 adapters
    qparams = qnn.quantize_params(params, mode="nf4a", block_size=64,
                                  min_size=1024)
    qparams = train.add_lora(qparams, jax.random.PRNGKey(1), rank=8)
    adapters = train.extract_adapters(qparams)
    n_adapter = sum(a.size for a in jax.tree_util.tree_leaves(adapters))
    n_total = sum(
        np.prod(l.shape) for l in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: hasattr(x, "shape"))
    )
    print(f"trainable adapter params: {n_adapter:,} "
          f"({100 * n_adapter / n_total:.2f}% of model)")

    # 2. 8-bit blockwise Adam over the adapters only
    tx = qoptim.adamw8bit(3e-3)
    opt_state = tx.init(adapters)
    f32_state = 2 * 4 * n_adapter  # fp32 m+v
    q_state = qoptim.state_nbytes(opt_state)
    print(f"optimizer state: {q_state:,} bytes 8-bit blockwise "
          f"(fp32 Adam would be {f32_state:,}; "
          f"{f32_state / q_state:.1f}x smaller)")

    # 3. synthetic next-token task: repeating byte patterns
    rng = np.random.default_rng(0)
    pattern = rng.integers(0, cfg.vocab_size, 32)
    stream = np.tile(pattern, 64).astype(np.int32)

    def batch_at(i):
        starts = rng.integers(0, len(stream) - 33, size=8)
        wins = np.stack([stream[s:s + 33] for s in starts])
        return {"inputs": jnp.asarray(wins[:, :-1]),
                "targets": jnp.asarray(wins[:, 1:])}

    step = jax.jit(train.make_qlora_train_step(cfg, tx))
    for i in range(30):
        adapters, opt_state, loss = step(adapters, opt_state, qparams,
                                         batch_at(i))
        if i % 5 == 0 or i == 29:
            print(f"  step {i:3d}  loss {float(loss):.4f}")

    # 4. merge adapters back and decode
    merged = train.merge_adapters(qparams, adapters)
    prompt = jnp.asarray(pattern[:8], jnp.int32)[None, :]
    out = llama.greedy_decode(merged, prompt, cfg, max_new_tokens=8)
    print("prompt:    ", pattern[:8].tolist())
    print("generated: ", np.asarray(out)[0, 8:].tolist())
    print("target:    ", pattern[8:16].tolist())


if __name__ == "__main__":
    main()
