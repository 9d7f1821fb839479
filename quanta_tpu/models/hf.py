"""HuggingFace checkpoint import: safetensors -> quanta_tpu param trees.

The reference has no real-model loading at all (its only model is a demo
ConvNet, /root/reference/example/model_quantization_example.py:10-29); the
north-star configs (BASELINE.json: GPT-2 small, TinyLlama-1.1B, Llama-2)
require loading published weights. This module reads a standard HF model
directory (config.json + *.safetensors) directly with the safetensors
library — no torch on the load path — and maps tensors into the functional
param layouts of quanta_tpu.models.{llama,gpt2}.

Conventions handled:
  - HF nn.Linear stores (out_features, in_features); our linears are
    y = x @ W with W (in, out), so those transpose on load.
  - GPT-2 uses Conv1D, which already stores (in, out): no transpose.
  - HF Llama RoPE (half-split rotate_half) matches llama._rope exactly,
    so q/k need no permutation.

Import is verified in tests against transformers' own forward pass on
freshly generated checkpoints (tests/test_hf_import.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def read_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load every *.safetensors file in an HF model dir into one dict."""
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="numpy") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


def _read_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


# ------------------------------------------------------------------- Llama


def load_llama(path: str, dtype=jnp.bfloat16) -> Tuple[dict, "object"]:
    """Load an HF Llama-family checkpoint (LlamaForCausalLM layout).

    Returns (params, LlamaConfig) ready for quanta_tpu.models.llama.forward
    / quanta_tpu.nn.quantize_params.
    """
    from quanta_tpu.models.llama import LlamaConfig

    hf = _read_config(path)
    cfg = LlamaConfig(
        vocab_size=hf["vocab_size"],
        dim=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=hf["num_attention_heads"],
        n_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        hidden_dim=hf["intermediate_size"],
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        max_seq_len=hf.get("max_position_embeddings", 2048),
        tie_embeddings=hf.get("tie_word_embeddings", False),
        dtype=dtype,
    )
    t = read_safetensors_dir(path)

    def lin(name):  # HF Linear (out, in) -> ours (in, out)
        return jnp.asarray(t.pop(name)).T.astype(dtype)

    def vec(name):
        return jnp.asarray(t.pop(name)).astype(dtype)

    params = {
        "tok_emb": vec("model.embed_tokens.weight"),
        "norm_f": vec("model.norm.weight"),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        params["layers"].append(
            {
                "attn_norm": vec(p + "input_layernorm.weight"),
                "wq": lin(p + "self_attn.q_proj.weight"),
                "wk": lin(p + "self_attn.k_proj.weight"),
                "wv": lin(p + "self_attn.v_proj.weight"),
                "wo": lin(p + "self_attn.o_proj.weight"),
                "ffn_norm": vec(p + "post_attention_layernorm.weight"),
                "w_gate": lin(p + "mlp.gate_proj.weight"),
                "w_up": lin(p + "mlp.up_proj.weight"),
                "w_down": lin(p + "mlp.down_proj.weight"),
            }
        )
    if not cfg.tie_embeddings:
        params["lm_head"] = lin("lm_head.weight")
    else:
        t.pop("lm_head.weight", None)
    _warn_unused(t)
    return params, cfg


# ------------------------------------------------------------------- GPT-2


def load_gpt2(path: str, dtype=jnp.float32) -> Tuple[dict, "object"]:
    """Load an HF GPT-2 checkpoint (GPT2LMHeadModel layout).

    Returns (params, GPT2Config) for quanta_tpu.models.gpt2.forward.
    """
    from quanta_tpu.models.gpt2 import GPT2Config

    hf = _read_config(path)
    cfg = GPT2Config(
        vocab_size=hf["vocab_size"],
        dim=hf["n_embd"],
        n_layers=hf["n_layer"],
        n_heads=hf["n_head"],
        max_seq_len=hf.get("n_positions", 1024),
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        dtype=dtype,
    )
    t = read_safetensors_dir(path)
    pre = "transformer." if any(k.startswith("transformer.") for k in t) else ""

    def arr(name):  # GPT-2 Conv1D already stores (in, out)
        return jnp.asarray(t.pop(pre + name)).astype(dtype)

    params = {
        "wte": arr("wte.weight"),
        "wpe": arr("wpe.weight"),
        "ln_f": {"w": arr("ln_f.weight"), "b": arr("ln_f.bias")},
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"h.{i}."
        params["layers"].append(
            {
                "ln_1": {"w": arr(p + "ln_1.weight"), "b": arr(p + "ln_1.bias")},
                "attn_qkv": {"w": arr(p + "attn.c_attn.weight"),
                             "b": arr(p + "attn.c_attn.bias")},
                "attn_out": {"w": arr(p + "attn.c_proj.weight"),
                             "b": arr(p + "attn.c_proj.bias")},
                "ln_2": {"w": arr(p + "ln_2.weight"), "b": arr(p + "ln_2.bias")},
                "mlp_fc": {"w": arr(p + "mlp.c_fc.weight"),
                           "b": arr(p + "mlp.c_fc.bias")},
                "mlp_out": {"w": arr(p + "mlp.c_proj.weight"),
                            "b": arr(p + "mlp.c_proj.bias")},
            }
        )
    t.pop("lm_head.weight", None)  # tied to wte
    for k in list(t):  # attn.bias buffers are causal masks, not params
        if k.endswith("attn.bias") or k.endswith("attn.masked_bias"):
            t.pop(k)
    _warn_unused(t)
    return params, cfg


# ------------------------------------------------------------------ export


def _materialize(params):
    """Dense f32 tree from any quanta_tpu tree: LoRA adapters merged into
    their (possibly quantized) bases, quantized leaves dequantized."""
    import jax

    from quanta_tpu.nn import dequantize_params
    from quanta_tpu.nn.lora import LoRAWeight, merge_lora

    params = jax.tree_util.tree_map(
        lambda leaf: merge_lora(leaf) if isinstance(leaf, LoRAWeight) else leaf,
        params,
        is_leaf=lambda x: isinstance(x, LoRAWeight),
    )
    return dequantize_params(params)


def save_llama(params, cfg, path: str) -> None:
    """Write a quanta_tpu Llama tree back to HF LlamaForCausalLM layout
    (config.json + model.safetensors) — the inverse of :func:`load_llama`
    and the framework's export interchange (the role of the reference's
    torch/ONNX exporters, /root/reference/Quanta/functional/model.py:
    307-354). Quantized / LoRA trees are materialized to dense f32 first,
    so fine-tuned (merge-LoRA) and PTQ'd models can leave the framework
    and load in transformers; round-trip logits parity is tested in
    tests/test_hf_import.py.
    """
    from safetensors.numpy import save_file

    params = _materialize(params)
    os.makedirs(path, exist_ok=True)

    t: Dict[str, np.ndarray] = {}

    def put_lin(name, w):  # ours (in, out) -> HF Linear (out, in)
        t[name] = np.asarray(w, np.float32).T.copy()

    def put_vec(name, w):
        t[name] = np.asarray(w, np.float32).copy()

    put_vec("model.embed_tokens.weight", params["tok_emb"])
    put_vec("model.norm.weight", params["norm_f"])
    for i, lp in enumerate(params["layers"]):
        p = f"model.layers.{i}."
        put_vec(p + "input_layernorm.weight", lp["attn_norm"])
        put_lin(p + "self_attn.q_proj.weight", lp["wq"])
        put_lin(p + "self_attn.k_proj.weight", lp["wk"])
        put_lin(p + "self_attn.v_proj.weight", lp["wv"])
        put_lin(p + "self_attn.o_proj.weight", lp["wo"])
        put_vec(p + "post_attention_layernorm.weight", lp["ffn_norm"])
        put_lin(p + "mlp.gate_proj.weight", lp["w_gate"])
        put_lin(p + "mlp.up_proj.weight", lp["w_up"])
        put_lin(p + "mlp.down_proj.weight", lp["w_down"])
    if not cfg.tie_embeddings:
        put_lin("lm_head.weight", params["lm_head"])
    save_file(t, os.path.join(path, "model.safetensors"))

    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.dim,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "intermediate_size": cfg.hidden_dim,
        "rms_norm_eps": cfg.norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_seq_len,
        "tie_word_embeddings": cfg.tie_embeddings,
        "hidden_act": "silu",
        "attention_bias": False,
        "torch_dtype": "float32",
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)


def save_gpt2(params, cfg, path: str) -> None:
    """Inverse of :func:`load_gpt2`: write HF GPT2LMHeadModel layout."""
    from safetensors.numpy import save_file

    params = _materialize(params)
    os.makedirs(path, exist_ok=True)
    t: Dict[str, np.ndarray] = {}

    def put(name, w):  # GPT-2 Conv1D stores (in, out): no transpose
        t["transformer." + name] = np.asarray(w, np.float32).copy()

    put("wte.weight", params["wte"])
    put("wpe.weight", params["wpe"])
    put("ln_f.weight", params["ln_f"]["w"])
    put("ln_f.bias", params["ln_f"]["b"])
    for i, lp in enumerate(params["layers"]):
        p = f"h.{i}."
        for ours, theirs in (("ln_1", "ln_1"), ("ln_2", "ln_2")):
            put(p + theirs + ".weight", lp[ours]["w"])
            put(p + theirs + ".bias", lp[ours]["b"])
        for ours, theirs in (
            ("attn_qkv", "attn.c_attn"),
            ("attn_out", "attn.c_proj"),
            ("mlp_fc", "mlp.c_fc"),
            ("mlp_out", "mlp.c_proj"),
        ):
            put(p + theirs + ".weight", lp[ours]["w"])
            put(p + theirs + ".bias", lp[ours]["b"])
    t["lm_head.weight"] = np.asarray(params["wte"], np.float32).copy()
    save_file(t, os.path.join(path, "model.safetensors"))

    hf_cfg = {
        "architectures": ["GPT2LMHeadModel"],
        "model_type": "gpt2",
        "vocab_size": cfg.vocab_size,
        "n_embd": cfg.dim,
        "n_layer": cfg.n_layers,
        "n_head": cfg.n_heads,
        "n_positions": cfg.max_seq_len,
        "n_ctx": cfg.max_seq_len,
        "layer_norm_epsilon": cfg.norm_eps,
        "attn_pdrop": 0.0,
        "embd_pdrop": 0.0,
        "resid_pdrop": 0.0,
        "torch_dtype": "float32",
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)


def _warn_unused(t: Dict[str, np.ndarray]) -> None:
    if t:
        import sys

        print(
            f"quanta_tpu.models.hf: {len(t)} unused checkpoint tensors: "
            f"{sorted(t)[:8]}{'...' if len(t) > 8 else ''}",
            file=sys.stderr,
        )
