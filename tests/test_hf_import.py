"""HF checkpoint import verified against transformers' own forward pass.

Generates tiny random-init HF checkpoints with transformers (torch CPU),
saves them with save_pretrained, loads them through quanta_tpu.models.hf,
and asserts logits parity between our functional forward and the HF model.
This is the real-weight-loading guarantee: the mapping is checked against
the reference implementation, not just shape-compatibility.
"""

import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from quanta_tpu.models import gpt2 as qgpt2  # noqa: E402
from quanta_tpu.models import hf as qhf  # noqa: E402
from quanta_tpu.models import llama as qllama  # noqa: E402


@pytest.fixture(scope="module")
def llama_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("hf_llama")
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    model.save_pretrained(str(path), safe_serialization=True)
    return str(path), model


@pytest.fixture(scope="module")
def gpt2_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("hf_gpt2")
    cfg = transformers.GPT2Config(
        vocab_size=160, n_embd=48, n_layer=2, n_head=4, n_positions=64,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    torch.manual_seed(1)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    model.save_pretrained(str(path), safe_serialization=True)
    return str(path), model


def test_llama_import_matches_transformers(llama_ckpt):
    path, hf_model = llama_ckpt
    params, cfg = qhf.load_llama(path, dtype=jnp.float32)
    assert cfg.n_layers == 2 and cfg.n_kv_heads == 2

    toks = np.array([[1, 5, 9, 42, 100, 7], [3, 3, 8, 19, 64, 2]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = qllama.forward(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-3)


def test_llama_import_cached_decode(llama_ckpt):
    path, hf_model = llama_ckpt
    params, cfg = qhf.load_llama(path, dtype=jnp.float32)
    toks = np.array([[1, 5, 9, 42, 100, 7]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(toks)).logits.numpy()
    # prefill 5 then decode 1 through the KV cache
    cache = qllama.init_cache(cfg, 1, max_len=8)
    _, cache = qllama.forward(params, jnp.asarray(toks[:, :5], jnp.int32),
                              cfg, cache=cache)
    last, _ = qllama.forward(params, jnp.asarray(toks[:, 5:6], jnp.int32),
                             cfg, cache=cache)
    np.testing.assert_allclose(
        np.asarray(last[:, 0]), ref[:, 5], rtol=1e-3, atol=2e-3
    )


def test_gpt2_import_matches_transformers(gpt2_ckpt):
    path, hf_model = gpt2_ckpt
    params, cfg = qhf.load_gpt2(path, dtype=jnp.float32)
    assert cfg.n_layers == 2 and cfg.dim == 48

    toks = np.array([[2, 17, 40, 99, 150, 11], [0, 1, 2, 3, 4, 5]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = qgpt2.forward(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-3)


def test_gpt2_cache_parity(gpt2_ckpt):
    path, _ = gpt2_ckpt
    params, cfg = qhf.load_gpt2(path, dtype=jnp.float32)
    toks = jnp.asarray([[2, 17, 40, 99, 150, 11]], jnp.int32)
    full, _ = qgpt2.forward(params, toks, cfg)
    cache = qgpt2.init_cache(cfg, 1, max_len=8)
    _, cache = qgpt2.forward(params, toks[:, :4], cfg, cache=cache)
    step5, cache = qgpt2.forward(params, toks[:, 4:5], cfg, cache=cache)
    step6, _ = qgpt2.forward(params, toks[:, 5:6], cfg, cache=cache)
    np.testing.assert_allclose(
        np.asarray(step5[:, 0]), np.asarray(full[:, 4]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(step6[:, 0]), np.asarray(full[:, 5]), rtol=1e-4, atol=1e-4
    )


def test_gpt2_quantized_forward(gpt2_ckpt):
    """GPT-2 int8 round trip (north-star config 1): quantize projections,
    logits stay close; embeddings stay dense."""
    from quanta_tpu import nn as qnn
    from quanta_tpu.core.qtensor import QuantizedTensor

    path, _ = gpt2_ckpt
    params, cfg = qhf.load_gpt2(path, dtype=jnp.float32)
    qparams = qnn.quantize_params(params, mode="int8", block_size=64,
                                  min_size=1024)
    assert isinstance(qparams["layers"][0]["attn_qkv"]["w"], QuantizedTensor)
    assert not isinstance(qparams["wte"], QuantizedTensor)

    toks = jnp.asarray([[2, 17, 40, 99, 150, 11]], jnp.int32)
    ref, _ = qgpt2.forward(params, toks, cfg)
    out, _ = qgpt2.forward(qparams, toks, cfg, use_kernel=False)
    # int8 blockwise weight quantization: logits shift but stay close
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.15 * (
        np.abs(np.asarray(ref)).max() + 1e-6
    )


# -------------------------------------------------------------- export


def test_llama_export_round_trip_transformers(tmp_path):
    """save_llama writes an HF checkpoint that transformers itself loads
    and that reproduces our forward's logits — the export-interchange
    guarantee (VERDICT r3 missing #7: the inverse of load_llama)."""
    cfg = qllama.LlamaConfig.tiny(dtype=jnp.float32)
    params = qllama.init_params(__import__("jax").random.PRNGKey(0), cfg)
    out = str(tmp_path / "export")
    qhf.save_llama(params, cfg, out)

    hf_model = transformers.LlamaForCausalLM.from_pretrained(out).eval()
    toks = np.array([[1, 5, 9, 42, 100, 7]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = qllama.forward(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-3)

    # and back through our own importer, exactly
    params2, cfg2 = qhf.load_llama(out, dtype=jnp.float32)
    ours2, _ = qllama.forward(params2, jnp.asarray(toks, jnp.int32), cfg2)
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(ours),
                               rtol=1e-5, atol=1e-5)


def test_llama_export_quantized_and_lora(tmp_path):
    """A QLoRA tree (nf4 base + adapters) exports as merged dense weights
    loadable by transformers; logits track the merged model."""
    import jax

    from quanta_tpu import nn as qnn
    from quanta_tpu.nn import init_lora

    cfg = qllama.LlamaConfig.tiny(dtype=jnp.float32)
    params = qllama.init_params(jax.random.PRNGKey(0), cfg)
    lparams = qnn.quantize_params(params, mode="nf4", block_size=64,
                                  min_size=0)
    # wrap the q projections with NONZERO adapters (a trained-LoRA stand-in)
    for i, lp in enumerate(lparams["layers"]):
        lw = init_lora(lp["wq"], jax.random.PRNGKey(10 + i), rank=2,
                       dtype=jnp.float32)
        lw.lora_b = jax.random.normal(jax.random.PRNGKey(20 + i),
                                      lw.lora_b.shape, jnp.float32) * 0.02
        lp["wq"] = lw
    out = str(tmp_path / "export_q")
    qhf.save_llama(lparams, cfg, out)

    hf_model = transformers.LlamaForCausalLM.from_pretrained(out).eval()
    toks = np.array([[2, 4, 8, 16]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = qllama.forward(lparams, jnp.asarray(toks, jnp.int32), cfg,
                             use_kernel=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-3)


def test_gpt2_export_round_trip_transformers(tmp_path):
    cfg = qgpt2.GPT2Config(vocab_size=160, dim=48, n_layers=2, n_heads=4,
                           max_seq_len=64, dtype=jnp.float32)
    params = qgpt2.init_params(__import__("jax").random.PRNGKey(2), cfg)
    out = str(tmp_path / "export_gpt2")
    qhf.save_gpt2(params, cfg, out)

    hf_model = transformers.GPT2LMHeadModel.from_pretrained(out).eval()
    toks = np.array([[3, 7, 31, 90]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = qgpt2.forward(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-3)
