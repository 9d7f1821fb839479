"""Model-level accuracy evaluation: perplexity over a token stream.

The reference measures accuracy only as per-tensor MAE/MSE in a benchmark
script (/root/reference/example/benchmarks.py:129-165); the north-star
gates are model-level (BASELINE.md: WikiText-2 ppl delta vs bf16 <= 0.1 at
8-bit, <= 0.5 at 4-bit). This module provides the measurement: windowed
next-token negative log-likelihood over a flat token stream, batched and
jitted once (static shapes; the tail window is masked, not dropped).

Tokenization: ``load_tokenizer`` uses a HF ``tokenizer.json`` when the
checkpoint ships one; ``ByteTokenizer`` (vocab 256) covers offline corpora
and from-scratch models.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ByteTokenizer:
    """UTF-8 byte tokenizer: vocab of exactly 256, no special tokens."""

    vocab_size = 256

    def encode(self, text: str) -> np.ndarray:
        return np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(
            np.int32
        )

    def decode(self, ids) -> str:
        return bytes(int(i) & 0xFF for i in np.asarray(ids).ravel()).decode(
            "utf-8", errors="replace"
        )


class HFTokenizer:
    """Thin wrapper over a ``tokenizers.Tokenizer`` file."""

    def __init__(self, path: str):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(path)
        self.vocab_size = self._tok.get_vocab_size()

    def encode(self, text: str) -> np.ndarray:
        return np.asarray(self._tok.encode(text).ids, dtype=np.int32)

    def decode(self, ids) -> str:
        return self._tok.decode([int(i) for i in np.asarray(ids).ravel()])


def load_tokenizer(model_dir: Optional[str] = None):
    """HF tokenizer from ``model_dir/tokenizer.json`` if present, else bytes."""
    if model_dir:
        p = os.path.join(model_dir, "tokenizer.json")
        if os.path.exists(p):
            return HFTokenizer(p)
    return ByteTokenizer()


def _window(tokens: np.ndarray, seq_len: int):
    """Split a flat stream into (n, seq_len+1) windows + a target mask.

    Consecutive non-overlapping windows (stride = seq_len): every token in
    the stream is predicted exactly once, except the very first.
    """
    tokens = np.asarray(tokens, np.int32).ravel()
    n_pred = len(tokens) - 1
    if n_pred < 1:
        raise ValueError("need at least 2 tokens")
    n_win = -(-n_pred // seq_len)
    padded = np.zeros(n_win * seq_len + 1, np.int32)
    padded[: len(tokens)] = tokens
    windows = np.stack(
        [padded[i * seq_len : i * seq_len + seq_len + 1] for i in range(n_win)]
    )
    mask = np.zeros((n_win, seq_len), np.float32)
    mask.ravel()[:n_pred] = 1.0
    return windows, mask


def perplexity(
    params,
    tokens,
    cfg,
    *,
    forward: Optional[Callable] = None,
    seq_len: int = 256,
    batch: int = 8,
    use_kernel=None,
    interpret: bool = False,
) -> float:
    """Perplexity of a causal LM over a flat token stream.

    ``forward(params, tokens, cfg, ...) -> (logits, _)``; defaults to the
    Llama forward. Windows are non-overlapping; the ragged tail is masked.
    """
    if forward is None:
        from quanta_tpu.models import llama

        forward = llama.forward

    windows, mask = _window(tokens, seq_len)
    n_win = windows.shape[0]
    n_batches = -(-n_win // batch)
    pad = n_batches * batch - n_win
    if pad:
        windows = np.concatenate([windows, np.zeros((pad, seq_len + 1), np.int32)])
        mask = np.concatenate([mask, np.zeros((pad, seq_len), np.float32)])

    fwd = partial(forward, cfg=cfg, use_kernel=use_kernel, interpret=interpret)

    @jax.jit
    def batch_nll(params, win, msk):
        logits, _ = fwd(params, win[:, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, win[:, 1:, None], axis=-1)[..., 0]
        return -(ll * msk).sum(), msk.sum()

    total_nll, total_n = 0.0, 0.0
    for i in range(n_batches):
        nll, n = batch_nll(
            params,
            jnp.asarray(windows[i * batch : (i + 1) * batch]),
            jnp.asarray(mask[i * batch : (i + 1) * batch]),
        )
        total_nll += float(nll)
        total_n += float(n)
    return float(np.exp(total_nll / max(total_n, 1.0)))


def ppl_table(
    params_by_name: dict,
    tokens,
    cfg,
    *,
    forward: Optional[Callable] = None,
    baseline: str = "bf16",
    **kw,
) -> dict:
    """Perplexity for several param variants + delta vs the baseline entry.

    Returns {name: {"ppl": float, "delta": float}} (the model-level version
    of the reference's per-method MAE table, example/benchmarks.py:129-165).
    """
    out = {}
    for name, params in params_by_name.items():
        out[name] = {"ppl": perplexity(params, tokens, cfg, forward=forward, **kw)}
    base = out[baseline]["ppl"]
    for name in out:
        out[name]["delta"] = out[name]["ppl"] - base
    return out
