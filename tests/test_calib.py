"""Calibration tests: stats collection, range reduction, activation
fake-quant, config-driven PTQ, LLM.int8 calibrated outliers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanta_tpu import calib, ptq
from quanta_tpu.models import llama
from quanta_tpu.nn.linear import linear, quantize_params
from quanta_tpu.ops.int8mm import Int8Weight
from quanta_tpu.state.config import ConfigTree, QuantConfig
from quanta_tpu.state.registry import QuantizationState


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny(dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batches(cfg, n=3, batch=2, seq=16, seed=0):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, seq)),
                    jnp.int32)
        for _ in range(n)
    ]


def _fwd(cfg):
    def f(p, batch):
        return llama.forward(p, batch, cfg, use_kernel=False)[0]

    return f


def test_collect_stats_shapes_and_merge(tiny):
    cfg, params = tiny
    stats = calib.collect_stats(_fwd(cfg), params, _batches(cfg))
    # every projection got stats, named by tree path
    assert "layers/0/wq" in stats and "layers/1/w_down" in stats
    st = stats["layers/0/wq"]
    assert st.colmax.shape == (cfg.dim,)
    assert st.amin <= st.amax
    assert st.hist.sum() > 0  # histogram collected over all batches
    # colmax is an absmax: nonnegative and >= |amin|, |amax| envelope holds
    assert (st.colmax >= 0).all()
    assert st.colmax.max() <= max(abs(st.amin), abs(st.amax)) + 1e-5


def test_reduce_range_methods():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 100_000).astype(np.float32)
    x[0], x[1] = -40.0, 45.0  # extreme outliers
    hist, edges = np.histogram(x, bins=2048, range=(x.min(), x.max()))
    st = calib.ActivationStats(
        amin=float(x.min()), amax=float(x.max()),
        colmax=np.zeros(1), hist=hist,
    )
    lo_mm, hi_mm = calib.reduce_range(st, "minmax")
    assert lo_mm == pytest.approx(-40.0) and hi_mm == pytest.approx(45.0)
    lo_p, hi_p = calib.reduce_range(st, "percentile")
    assert -7 < lo_p < -2 and 2 < hi_p < 7  # tails cut near +-3.5 sigma
    lo_e, hi_e = calib.reduce_range(st, "entropy", bits=8)
    assert lo_mm <= lo_e < lo_e + 1 and hi_e <= hi_mm
    assert (hi_e - lo_e) < (hi_mm - lo_mm)  # entropy clipped something
    with pytest.raises(ValueError):
        calib.reduce_range(st, "bogus")


def test_fake_quant_roundtrip_and_clip():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.7, 3.0], jnp.float32)
    y = calib.fake_quant(x, -1.0, 1.0, bits=8)
    # clipped to range, zero exact, in-range values within one step
    step = 2.0 / 255
    assert float(y[0]) == pytest.approx(-1.0)
    assert float(y[2]) == pytest.approx(0.0, abs=step / 2)
    assert float(y[3]) == pytest.approx(0.7, abs=step)
    assert float(y[4]) == pytest.approx(1.0)


def test_act_quant_weight_through_linear():
    rng = jax.random.PRNGKey(1)
    w = jax.random.normal(rng, (64, 32), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64), jnp.float32)
    aq = calib.ActQuantWeight(w=w, lo=jnp.float32(-4.0), hi=jnp.float32(4.0),
                              bits=8)
    y = linear(x, aq, use_kernel=False)
    want = calib.fake_quant(x, -4.0, 4.0, 8) @ w
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-6)
    # 8-bit fake-quant is close to identity for in-range activations
    # (error std over K=64 accumulation ~ sqrt(K) * step/sqrt(12) ~ 0.07)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), atol=0.4)


def test_quantize_model_config_tree(tiny):
    cfg, params = tiny
    tree = (
        ConfigTree(QuantConfig(bits=4, scheme="codebook", codebook="nf4a"))
        .config_layer(r"w_down", bits=8, scheme="symmetric")
        .config_layer(r"layers/0/wq", weights_only=False,
                      calibration="percentile")
    )
    q = ptq.quantize_model(
        params, tree, forward=_fwd(cfg), calib_batches=_batches(cfg),
        min_size=0,
    )
    # resolved formats: w_down int8, others nf4a, wq wrapped with act quant
    l0 = q["layers"][0]
    assert isinstance(l0["wq"], calib.ActQuantWeight)
    assert l0["wq"].w.codebook == "nf4a"
    assert l0["w_down"].scheme == "symmetric" and l0["w_down"].bits == 8
    assert q["layers"][1]["w_up"].codebook == "nf4a"
    # the quantized model still runs and tracks the dense one
    toks = _batches(cfg, n=1)[0]
    dense_logits = _fwd(cfg)(params, toks)
    q_logits = _fwd(cfg)(q, toks)
    assert jnp.isfinite(q_logits).all()
    corr = np.corrcoef(
        np.asarray(dense_logits).ravel(), np.asarray(q_logits).ravel()
    )[0, 1]
    # plumbing check (4-bit on random weights); real accuracy gates live in
    # benchmarks/accuracy_bench.py on a trained model
    assert corr > 0.93


def test_weights_only_false_requires_stats(tiny):
    cfg, params = tiny
    tree = ConfigTree(QuantConfig(bits=8, scheme="symmetric",
                                  weights_only=False))
    with pytest.raises(ValueError, match="activation stats"):
        ptq.quantize_model(params, tree, min_size=0)


def test_llm_int8_calibrated_outliers(tiny):
    """With stats, outlier columns come from activation colmax, not weight
    norms — inject a hot feature and check it lands in the outlier set."""
    cfg, params = tiny
    stats = calib.collect_stats(_fwd(cfg), params, _batches(cfg))
    hot = 7
    stats["layers/0/wq"].colmax[hot] = 1e6
    q = quantize_params(params, mode="llm_int8", min_size=0, stats=stats)
    qw = q["layers"][0]["wq"]
    assert isinstance(qw, Int8Weight)
    assert hot in np.asarray(qw.outlier_idx)


def test_registry_calibration_observable():
    """percentile calibration must clip extreme weights -> different codes
    (ADVICE.md: the field used to be accepted and ignored)."""
    rng = np.random.default_rng(3)
    w = rng.normal(0, 1, (64, 64)).astype(np.float32)
    w[0, 0] = 50.0  # extreme outlier stretches the minmax grid
    # per-tensor scales (block_size=0): one outlier stretches the whole
    # grid unless calibration clips it (blockwise scales would isolate it)
    st_mm = QuantizationState(
        ConfigTree(QuantConfig(bits=8, scheme="symmetric", block_size=0))
    )
    st_pc = QuantizationState(
        ConfigTree(QuantConfig(bits=8, scheme="symmetric", block_size=0,
                               calibration="percentile"))
    )
    q_mm = st_mm.quantize("w", jnp.asarray(w))
    q_pc = st_pc.quantize("w", jnp.asarray(w))
    assert not np.array_equal(np.asarray(q_mm.codes), np.asarray(q_pc.codes))
    # percentile reconstruction is better on the bulk (outlier clipped away)
    from quanta_tpu.core import dequantize

    bulk = np.s_[1:, :]
    err_mm = np.abs(np.asarray(dequantize(q_mm)) - w)[bulk].mean()
    err_pc = np.abs(np.asarray(dequantize(q_pc)) - w)[bulk].mean()
    assert err_pc < err_mm


def test_quantize_model_dead_rule_reporting(tiny):
    """A layer rule that matches zero quantizable tensors warns by default
    (the classic dotted-regex-vs-'/'-paths sharp edge) and raises under
    strict_rules=True."""
    cfg, params = tiny
    tree = (
        ConfigTree(QuantConfig(bits=4, scheme="codebook", codebook="nf4a"))
        .config_layer(r"layers\.0\.", bits=8, scheme="symmetric")
    )
    with pytest.warns(UserWarning, match="matched zero"):
        ptq.quantize_model(params, tree, min_size=0)
    with pytest.raises(ValueError, match="matched zero"):
        ptq.quantize_model(params, tree, min_size=0, strict_rules=True)
    # a matching rule is silent
    good = ConfigTree(
        QuantConfig(bits=4, scheme="codebook", codebook="nf4a")
    ).config_layer(r"layers/0/", bits=8, scheme="symmetric")
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        q = ptq.quantize_model(params, good, min_size=0, strict_rules=True)
    assert q["layers"][0]["wq"].bits == 8
    assert q["layers"][1]["wq"].bits == 4


def test_quantize_model_int4c_reachable(tiny):
    """VERDICT r4 missing #3: int4c must be reachable from the config
    system — QuantConfig.from_mode, ptq.quantize_model, and the round
    trip through config_to_mode."""
    from quanta_tpu.ops.int4c import Int4cWeight

    c = QuantConfig.from_mode("int4c")
    assert c.scheme == "int4c" and c.bits == 4
    assert ptq.config_to_mode(c) == "int4c"
    # JSON round trip keeps the scheme valid
    assert QuantConfig.from_dict(c.to_dict()).scheme == "int4c"

    cfg, params = tiny
    q = ptq.quantize_model(params, ConfigTree(c), min_size=0)
    l0 = q["layers"][0]
    assert isinstance(l0["wq"], Int4cWeight)
    assert isinstance(l0["w_down"], Int4cWeight)
    # the int4c model runs via the dispatch path (XLA oracle on CPU)
    toks = _batches(cfg, n=1)[0]
    dense_logits = _fwd(cfg)(params, toks)
    q_logits = _fwd(cfg)(q, toks)
    assert jnp.isfinite(q_logits).all()
    corr = np.corrcoef(
        np.asarray(dense_logits).ravel(), np.asarray(q_logits).ravel()
    )[0, 1]
    # per-COLUMN scales on random weights are coarser than blockwise-64
    # formats (0.92 here vs 0.95 nf4a); real quality gates live in
    # benchmarks/accuracy_bench.py on a trained model
    assert corr > 0.9
