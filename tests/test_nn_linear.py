"""nn layer: functional linear dispatch, linen modules, LoRA, param surgery."""

import jax
import jax.numpy as jnp
import numpy as np

from quanta_tpu import nn as qnn
from quanta_tpu.core import codecs
from quanta_tpu.core.qtensor import QuantizedTensor
from quanta_tpu.ops.int8mm import Int8Weight, outlier_coverage, quantize_int8_weight


def test_linear_dense():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    b = jnp.ones((32,))
    y = qnn.linear(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w + 1.0), rtol=1e-6)


def test_linear_quantized_xla_path():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 128))
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    qw = qnn.quantize_linear_weight(w, mode="nf4")
    y = qnn.linear(x, qw, use_kernel=False)
    ref = x @ codecs.dequantize_matmul_weight(qw)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_linear_llm_int8():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128))
    # plant systematic outliers in two features
    x = x.at[:, 7].mul(20.0).at[:, 99].mul(30.0)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    colmax = jnp.max(jnp.abs(x), axis=0)
    qw = quantize_int8_weight(w, outlier_capacity=8, calib_colmax=colmax)
    y = qnn.linear(x, qw)
    ref = x @ w
    # outlier features exact in bf16; inliers carry int8 error
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert rel < 0.05, rel
    cov = outlier_coverage(x, qw)
    assert float(cov) == 1.0


def test_llm_int8_beats_naive_int8_with_outliers():
    """The point of LLM.int8(): outlier decomposition rescues accuracy."""
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128))
    x = x.at[:, 3].mul(50.0)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    ref = x @ w

    colmax = jnp.max(jnp.abs(x), axis=0)
    qw = quantize_int8_weight(w, outlier_capacity=4, calib_colmax=colmax)
    y_dec = qnn.linear(x, qw)

    # naive per-row int8 on the raw activations (no decomposition)
    rs = jnp.max(jnp.abs(x), axis=1) / 127.0
    xq = jnp.clip(jnp.round(x / rs[:, None]), -127, 127)
    ws = jnp.max(jnp.abs(w), axis=0) / 127.0
    wq = jnp.clip(jnp.round(w / ws[None, :]), -127, 127)
    y_naive = (xq @ wq) * rs[:, None] * ws[None, :]

    err_dec = float(jnp.abs(y_dec - ref).mean())
    err_naive = float(jnp.abs(y_naive - ref).mean())
    assert err_dec < 0.3 * err_naive, (err_dec, err_naive)


def test_linen_modules_init_and_apply():
    x = jnp.ones((2, 128))
    for mod in (qnn.Linear8bitLt(features=64), qnn.Linear4bit(features=64)):
        params = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(params, x)
        assert y.shape == (2, 64)


def test_quantize_params_surgery():
    params = {
        "emb": {"tok_emb": jnp.ones((256, 128))},
        "blocks": [
            {"w": jax.random.normal(jax.random.PRNGKey(i), (128, 128)),
             "norm": jnp.ones((128,))}
            for i in range(2)
        ],
    }
    q = qnn.quantize_params(params, mode="nf4", min_size=1024)
    assert isinstance(q["blocks"][0]["w"], QuantizedTensor)
    assert isinstance(q["blocks"][1]["w"], QuantizedTensor)
    # embeddings and norms untouched
    assert isinstance(q["emb"]["tok_emb"], jax.Array)
    assert isinstance(q["blocks"][0]["norm"], jax.Array)
    # round trip
    d = qnn.dequantize_params(q)
    assert d["blocks"][0]["w"].shape == (128, 128)
    err = jnp.abs(d["blocks"][0]["w"] - params["blocks"][0]["w"]).mean()
    assert float(err) < 0.1  # NF4 on N(0,1): ~0.07 mean abs error


def test_lora_roundtrip_and_grad():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 128))
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    base = qnn.quantize_linear_weight(w, mode="nf4")
    lw = qnn.init_lora(base, jax.random.PRNGKey(2), rank=4)

    # zero-init B: adapter starts as identity
    y0 = qnn.linear(x, lw, use_kernel=False)
    yb = qnn.linear(x, base, use_kernel=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(yb), rtol=1e-3, atol=1e-4)

    # gradients flow to adapters (trainable leaves live outside the frozen
    # uint8 base: differentiate wrt the adapter pair only)
    import dataclasses

    def loss(ab):
        lw2 = dataclasses.replace(lw, lora_a=ab[0], lora_b=ab[1])
        return jnp.sum(qnn.lora_linear(x, lw2, use_kernel=False) ** 2)

    ga, gb = jax.grad(loss)((lw.lora_a, lw.lora_b))
    assert float(jnp.abs(ga).max()) == 0.0  # B is zero -> dA = 0
    assert float(jnp.abs(gb).max()) > 0.0

    merged = qnn.merge_lora(lw)
    np.testing.assert_allclose(
        np.asarray(merged),
        np.asarray(codecs.dequantize_matmul_weight(base)),
        rtol=1e-5, atol=1e-5,
    )


def test_init_quantized_params_matches_layout():
    """Direct-quantized init (model-scale benching) produces leaves with
    exactly the layout quantize_params would: the forward runs through
    the same kernels with no shape/padding surprises."""
    from quanta_tpu import nn as qnn
    from quanta_tpu.models import llama
    from quanta_tpu.nn.linear import init_quantized_params

    cfg = llama.LlamaConfig.tiny()
    direct = init_quantized_params(jax.random.PRNGKey(0), cfg, mode="nf4a",
                                   block_size=32)
    dense = llama.init_params(jax.random.PRNGKey(0), cfg)
    viaq = qnn.quantize_params(dense, mode="nf4a", block_size=32, min_size=0)
    for name in ("wq", "wo", "w_gate", "w_down"):
        a = direct["layers"][0][name]
        b = viaq["layers"][0][name]
        assert a.codes.shape == b.codes.shape, name
        assert a.scale.shape == b.scale.shape, name
        assert a.codes.dtype == b.codes.dtype, name
        assert (a.packed, a.bits, a.codebook, a.shape) == (
            b.packed, b.bits, b.codebook, b.shape), name
    logits, _ = llama.forward(direct, jnp.zeros((2, 8), jnp.int32), cfg,
                              use_kernel=False)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # kernel path (interpret) agrees with the XLA oracle on these leaves
    logits_k, _ = llama.forward(direct, jnp.zeros((2, 8), jnp.int32), cfg,
                                use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(logits_k), np.asarray(logits),
                               rtol=2e-4, atol=2e-4)


def test_init_quantized_params_int8():
    from quanta_tpu.models import llama
    from quanta_tpu.nn.linear import init_quantized_params

    cfg = llama.LlamaConfig.tiny()
    p = init_quantized_params(jax.random.PRNGKey(1), cfg, mode="int8",
                              block_size=32)
    assert p["layers"][0]["wq"].codes.dtype == jnp.int8
    logits, _ = llama.forward(p, jnp.zeros((1, 4), jnp.int32), cfg,
                              use_kernel=False)
    assert bool(jnp.all(jnp.isfinite(logits)))
